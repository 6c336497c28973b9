"""Jitted train / eval step builders.

One fused step = forward + loss (+ MMD) + backward + Adam update, compiled
once per GraphSpec bucket.  The reference's per-batch Python dispatch
(``utils/train.py:51-102``) becomes a model-specific closure built once.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.train.loss import masked_mse, mmd_loss


class TrainState(struct.PyTreeNode):
    """Parameters live as ONE flat f32 vector between steps.

    A ~130-leaf param pytree costs ~2.5 ms/step of tiny-kernel launch
    overhead in the optimizer alone on TPU (scripts/adam_lab.py: tree-Adam
    2.53 ms vs flat 0.88 ms for the same 334k params); flattening turns
    Adam into three fused vector ops and grad psum into ONE collective.
    ``.params`` unravels on demand (eval/checkpoint cadence, off the hot
    path); inside the jitted step the unravel slices fuse into consumers.
    """

    flat_params: jax.Array
    opt_state: Any
    step: jax.Array
    unravel: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        flat, unravel = ravel_pytree(params)
        return cls(flat_params=flat, opt_state=tx.init(flat),
                   step=jnp.zeros((), jnp.int32), unravel=unravel)

    @property
    def params(self):
        return self.unravel(self.flat_params)

    def with_params(self, params) -> "TrainState":
        """Return a state with ``params`` (a pytree) swapped in."""
        flat, _ = ravel_pytree(params)
        return self.replace(flat_params=flat.astype(self.flat_params.dtype))


def ensure_key(key):
    """Accept a typed PRNG key OR raw uint32 key-data.

    The training loop passes per-step keys as HOST numpy uint32[2] so they
    ride the step call's operand upload; a separate device op per step
    (fold_in or even indexing a stacked key array) costs ~3 ms of tunnel
    dispatch — ~25%% of a production Water-3D step (round-5 measurement)."""
    import numpy as _np

    if isinstance(key, _np.ndarray) or not jnp.issubdtype(
            key.dtype, jax.dtypes.prng_key):
        return jax.random.wrap_key_data(jnp.asarray(key))
    return key


def _forward(model, params, graph: GraphBatch):
    return model.apply({"params": params}, graph)


def make_loss_fn(
    model,
    sigma: float,
    weight: float,
    sample: int,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    apply_fn: Optional[Callable] = None,
) -> Callable:
    """Returns ``loss_fn(params, batch, key) -> (total_loss, (mse, mmd))``.

    ``mse`` is the *logged* loss (pre-MMD), matching the reference's split
    (``utils/train.py:104-108,163-165``).

    ``apply_fn(params, batch) -> prediction`` overrides the default
    ``model.apply({"params": p}, batch)`` for models with non-uniform
    signatures (EGHN's local bond edges, DimeNet's triplet tables — the
    reference's per-class dispatch, ``utils/train.py:51-102``).  ``batch``
    may then be a (GraphBatch, aux...) tuple; the GraphBatch must come first.
    """

    def loss_fn(params, batch, key):
        key = ensure_key(key)
        graph = batch[0] if isinstance(batch, tuple) else batch
        if apply_fn is not None:
            out = apply_fn(params, batch)
        else:
            out = _forward(model, params, graph)
        if isinstance(out, tuple):
            pred, vloc = out[0], out[1] if len(out) > 1 else None
        else:
            pred, vloc = out, None
        mse = masked_mse(pred, graph.coord_target, graph.node_mask)
        if use_mmd and vloc is not None:
            mmd = mmd_loss(
                pred, vloc, graph, key, sigma, sample, per_graph_sampling
            )
            total = mse + weight * mmd
        else:
            mmd = jnp.zeros_like(mse)
            total = mse
        return total, (mse, mmd)

    return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    donate: bool = True,
    apply_fn: Optional[Callable] = None,
) -> Callable[[TrainState, GraphBatch, jax.Array], Tuple[TrainState, dict]]:
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling,
                           use_mmd, apply_fn)

    n_traces = [0]  # incremented per TRACE (jit cache miss), not per call

    def step(state: TrainState, graph, key):
        n_traces[0] += 1
        def flat_loss(pf, graph, key):
            return loss_fn(state.unravel(pf), graph, key)

        (total, (mse, mmd)), grads = jax.value_and_grad(flat_loss, has_aux=True)(
            state.flat_params, graph, key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.flat_params)
        flat = optax.apply_updates(state.flat_params, updates)
        new_state = state.replace(flat_params=flat, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, {"loss": total, "mse": mse, "mmd": mmd}

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    # retrace observability: jax's C++ pjit cache is a GLOBAL shared LRU
    # (jax/_src/pjit.py capacity=8192), so ``_cache_size()`` can legally
    # drop to 0 under session-wide cache pressure; the trace counter is the
    # reliable "did this batch spec force a recompile" signal (tests).
    jitted.n_traces = n_traces
    return jitted


def make_eval_step(
    model,
    sigma: float = 1.5,
    weight: float = 0.01,
    sample: int = 3,
    per_graph_sampling: bool = False,
    use_mmd: bool = True,
    apply_fn: Optional[Callable] = None,
) -> Callable[[Any, GraphBatch, jax.Array], dict]:
    loss_fn = make_loss_fn(model, sigma, weight, sample, per_graph_sampling,
                           use_mmd, apply_fn)

    @jax.jit
    def step(params, graph, key):
        total, (mse, mmd) = loss_fn(params, graph, key)
        return {"loss": total, "mse": mse, "mmd": mmd}

    return step
