"""Small NN building blocks with PyTorch-compatible initialisation.

The parity criterion (BASELINE.md) is per-layer activation allclose against
the reference after mapping its ``state_dict`` into our params, and matching
training dynamics from scratch.  Both need torch's default initialisers, which
differ from flax defaults:

- ``torch.nn.Linear`` resets weight with kaiming-uniform(a=sqrt(5)) and bias
  with U(-1/sqrt(fan_in), 1/sqrt(fan_in)); both bounds reduce to
  1/sqrt(fan_in).
- The reference's coordinate-output layers use xavier-uniform with gain 1e-3
  (``models/FastEGNN.py:55-57``).

Flax kernels are stored ``[in, out]`` (transpose of torch's ``[out, in]``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as fnn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape is [fan_in, fan_out]."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(fnn.Module):
    """Dense layer with torch ``nn.Linear`` default init."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_linear_kernel_init

    @fnn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (fan_in, self.features), jnp.float32
        )
        y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", torch_linear_bias_init(fan_in), (self.features,), jnp.float32
            )
            y = y + bias.astype(x.dtype)
        return y


class RawLinear(fnn.Module):
    """``Linear`` whose raw parameters are directly accessible.

    Param tree is identical to :class:`Linear` (``kernel``/``bias`` under the
    module scope), but :meth:`raw` hands back the parameter arrays themselves
    — no identity-trick eye-dots, so fast paths that re-associate the math
    from raw weights (the fused Pallas kernel, the flat3 virtual block) cost
    zero extra forward ops and, more importantly, zero extra backward ops
    (the eye-dot extraction measured ~1.6 ms/step of backward overhead at the
    bench geometry).

    ``raw`` is the compact method; ``__call__`` delegates.  Within one
    ``apply`` either may be used (not both — flax forbids double compact
    calls), which matches how the models use these blocks.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_linear_kernel_init

    @fnn.compact
    def raw(self, in_dim: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_dim, self.features), jnp.float32
        )
        bias = (
            self.param("bias", torch_linear_bias_init(in_dim),
                       (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias

    def __call__(self, x):
        kernel, bias = self.raw(x.shape[-1])
        y = jnp.dot(x, kernel.astype(x.dtype))
        if bias is not None:
            y = y + bias.astype(x.dtype)
        return y


class MLP(fnn.Module):
    """Sequential Linear/activation stack.

    ``features``: output width per Linear.  ``act_final`` appends a trailing
    activation (the reference's edge MLPs end in the activation,
    ``models/FastEGNN.py:28-40``; node MLPs do not).
    """

    features: Sequence[int]
    act: Callable = fnn.silu
    act_final: bool = False

    @fnn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = Linear(f, name=f"lin{i}")(x)
            if i < len(self.features) - 1 or self.act_final:
                x = self.act(x)
        return x


class CoordMLP(fnn.Module):
    """hidden -> hidden -> scalar head for coordinate gates.

    Matches the reference ``get_coord_mlp`` (``models/FastEGNN.py:55-66``):
    Linear(H,H) + act + Linear(H,1,bias=False, xavier gain 1e-3)
    [+ tanh if requested].
    """

    hidden: int
    act: Callable = fnn.silu
    tanh: bool = False

    @fnn.compact
    def __call__(self, x):
        x = Linear(self.hidden, name="lin0")(x)
        x = self.act(x)
        x = Linear(
            1, use_bias=False, kernel_init=xavier_uniform_gain(0.001), name="head"
        )(x)
        if self.tanh:
            x = jnp.tanh(x)
        return x


class SplitMLP(fnn.Module):
    """Two-Linear MLP whose raw weights are also accessible (identity trick).

    Param tree is identical to ``MLP([hidden, out])`` (scopes ``lin0``,
    ``lin1``), but callers on a fused/re-associated fast path can pull the
    weight matrices out *differentiably* via :meth:`weights` — e.g. to split
    the first-layer dot over concatenated input blocks (the flat3 virtual
    block, scripts/vblock_lab.py) or to feed a Pallas kernel.
    """

    hidden: int
    out: int
    act: Callable = fnn.silu
    act_final: bool = False

    def setup(self):
        self.lin0 = RawLinear(self.hidden)
        self.lin1 = RawLinear(self.out)

    def __call__(self, x):
        x = self.act(self.lin0(x))
        x = self.lin1(x)
        if self.act_final:
            x = self.act(x)
        return x

    def weights(self, in_dim: int):
        """Return ``(W0 [in_dim,hidden], b0, W1 [hidden,out], b1)`` — the
        raw parameter arrays (zero-cost, differentiable)."""
        W0, b0 = self.lin0.raw(in_dim)
        W1, b1 = self.lin1.raw(self.hidden)
        return W0, b0, W1, b1


class SplitCoordMLP(fnn.Module):
    """:class:`CoordMLP` with raw-weight access; param tree identical
    (scopes ``lin0``, ``head``).  The ``tanh`` flag is NOT applied inside
    :meth:`weights` callers — apply it elementwise after the head dot."""

    hidden: int
    act: Callable = fnn.silu
    tanh: bool = False

    def setup(self):
        self.lin0 = RawLinear(self.hidden)
        self.head = RawLinear(
            1, use_bias=False, kernel_init=xavier_uniform_gain(0.001)
        )

    def __call__(self, x):
        x = self.act(self.lin0(x))
        x = self.head(x)
        if self.tanh:
            x = jnp.tanh(x)
        return x

    def weights(self):
        """Return ``(W0 [hidden,hidden], b0, w1 [hidden,1])`` — the raw
        parameter arrays (zero-cost, differentiable)."""
        W0, b0 = self.lin0.raw(self.hidden)
        w1, _ = self.head.raw(self.hidden)  # no bias
        return W0, b0, w1
