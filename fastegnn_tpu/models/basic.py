"""Basic model suite: EGNN, GNN, RF, Linear dynamics, scalarization nets.

Re-design of the reference's ``models/basic.py`` model zoo on the masked
GraphBatch substrate.  Components and their reference anchors:

- ``BaseMLP`` (``basic.py:172-196``): 2-layer MLP, optional residual/last-act;
  ``flat=True`` switches to tanh with 4x hidden.
- ``InvariantScalarNet`` (``basic.py:245-282``): O(n)-invariant scalars from
  the Gram matrix of input vectors (optionally L2-normalised) + scalar feats.
- ``EquivariantScalarNet`` (``basic.py:199-242``): same Gram trick, outputs a
  vector as a learned combination of the input vectors + scalars.
- ``EquivariantEdgeScalarNet`` (``basic.py:472-511``): edge version mixing
  receiver/sender vector stacks (used by EGHN's pooling).
- ``EGNNLayer``/``EGNN`` (``basic.py:285-341``): scalarization-EGNN with
  velocity; coordinate aggregate is a *mean* clamped to [-100, 100]
  (``basic.py:309-310``); node feature is replaced, not residual.
- ``GNNLayer``/``GNN`` (``basic.py:364-404``): plain message passing on
  [loc, vel] inputs, 3-dim decoder output.
- ``LinearDynamics`` (``basic.py:407-415``): x + v * t with learned t.
- ``RFVel``/``GCLRfVel`` (``basic.py:418-469``): radial-field update
  ``x += (x_i - x_j) * tanh-phi(||r||, e)`` aggregated mean, plus
  ``v * phi(||v||)``.
- ``EGMN`` (``basic.py:344-361``): stacked EquivariantScalarNets that append
  each output vector to the input list.
- ``FullMLP`` (``basic.py:739-754``): non-geometric MLP baseline.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import Linear, xavier_uniform_gain
from fastegnn_tpu.ops.segment import segment_mean, segment_sum


def _l2_normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


class BaseMLP(fnn.Module):
    hidden: int
    out: int
    residual: bool = False
    last_act: bool = False
    flat: bool = False

    @fnn.compact
    def __call__(self, x):
        act = jnp.tanh if self.flat else fnn.silu
        hidden = 4 * self.hidden if self.flat else self.hidden
        y = Linear(hidden, name="lin0")(x)
        y = act(y)
        y = Linear(self.out, name="lin1")(y)
        if self.last_act:
            y = act(y)
        return x + y if self.residual else y


def _gram_scalars(Z: jax.Array, norm: bool) -> jax.Array:
    """[..., 3, K] -> flattened Gram [..., K*K], optionally L2-normalised."""
    K = Z.shape[-1]
    g = jnp.einsum("...ik,...il->...kl", Z, Z)  # Z^T Z over the 3-dim axis
    g = g.reshape(g.shape[:-2] + (K * K,))
    return _l2_normalize(g) if norm else g


class InvariantScalarNet(fnn.Module):
    hidden: int
    out: int
    norm: bool = True
    last_act: bool = False
    flat: bool = False

    @fnn.compact
    def __call__(self, vectors: jax.Array, scalars: Optional[jax.Array] = None):
        s = _gram_scalars(vectors, self.norm)
        if scalars is not None:
            s = jnp.concatenate([s, scalars], axis=-1)
        return BaseMLP(
            self.hidden, self.out, last_act=self.last_act, flat=self.flat,
            name="scalar_net",
        )(s)


class EquivariantScalarNet(fnn.Module):
    hidden: int
    norm: bool = True
    flat: bool = True

    @fnn.compact
    def __call__(
        self, vectors: jax.Array, scalars: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """vectors [..., 3, K] (+ scalars [..., L]) -> (vector [..., 3], scalar [..., H])."""
        K = vectors.shape[-1]
        s = _gram_scalars(vectors, self.norm)
        if scalars is not None:
            s = jnp.concatenate([s, scalars], axis=-1)
        s = BaseMLP(self.hidden, self.hidden, last_act=True, flat=self.flat,
                    name="in_scalar_net")(s)
        coef = BaseMLP(self.hidden, K, flat=self.flat, name="out_vector_net")(s)
        vector = jnp.einsum("...ik,...k->...i", vectors, coef)
        scalar = BaseMLP(self.hidden, self.hidden, flat=self.flat,
                         name="out_scalar_net")(s)
        return vector, scalar


class EquivariantEdgeScalarNet(fnn.Module):
    hidden: int
    norm: bool = True
    flat: bool = False

    @fnn.compact
    def __call__(
        self, vectors_i: jax.Array, vectors_j: jax.Array,
        scalars: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """[.., 3, K] x2 -> (mixed vectors [.., 3, K], messages [.., H])."""
        K = vectors_i.shape[-1]
        g = jnp.einsum("...ik,...il->...kl", vectors_j, vectors_i)  # Z_j^T Z_i
        g = g.reshape(g.shape[:-2] + (K * K,))
        if self.norm:
            g = _l2_normalize(g)
        if scalars is not None:
            g = jnp.concatenate([g, scalars], axis=-1)
        s = BaseMLP(self.hidden, self.hidden, last_act=True, flat=self.flat,
                    name="in_scalar_net")(g)
        coef = BaseMLP(self.hidden, K * K, flat=self.flat, name="out_vector_net")(s)
        coef = coef.reshape(coef.shape[:-1] + (K, K))
        vector = jnp.einsum("...ij,...jk->...ik", vectors_j, coef)
        return vector, s


class EGNNLayer(fnn.Module):
    """Scalarization EGNN layer with optional velocity (``basic.py:285-320``)."""

    hidden: int
    with_v: bool = False
    flat: bool = False
    norm: bool = False

    @fnn.compact
    def __call__(self, x, h, graph: GraphBatch, v=None):
        dst, src = graph.dst, graph.src
        emask = graph.edge_mask
        rij = x[dst] - x[src]  # [E, 3]
        hij = jnp.concatenate([h[dst], h[src], graph.edge_attr], axis=-1)
        message = InvariantScalarNet(
            self.hidden, self.hidden, norm=self.norm, last_act=True,
            flat=self.flat, name="edge_message_net",
        )(rij[..., None], hij)  # [E, H]
        coord_msg = BaseMLP(self.hidden, 1, flat=self.flat, name="coord_net")(message)
        f = rij * coord_msg
        tot_f = segment_mean(f, dst, x.shape[0], mask=emask, indices_are_sorted=True)
        tot_f = jnp.clip(tot_f, -100.0, 100.0)
        if v is not None:
            gate = BaseMLP(self.hidden, 1, flat=self.flat, name="node_v_net")(h)
            x = x + gate * v + tot_f
        else:
            x = x + tot_f
        tot_m = segment_mean(
            message, dst, x.shape[0], mask=emask, indices_are_sorted=True
        )
        h = BaseMLP(self.hidden, self.hidden, flat=self.flat, name="node_net")(
            jnp.concatenate([h, tot_m], axis=-1)
        )
        return x, v, h


class EGNN(fnn.Module):
    """``basic.py:323-341``; returns updated coords (plus v, h)."""

    hidden: int = 64
    n_layers: int = 4
    with_v: bool = True
    flat: bool = False
    norm: bool = False

    @fnn.compact
    def __call__(self, graph: GraphBatch):
        h = Linear(self.hidden, name="embedding")(graph.node_feat)
        x, v = graph.coord, (graph.vel if self.with_v else None)
        for i in range(self.n_layers):
            x, v, h = EGNNLayer(
                self.hidden, with_v=self.with_v, flat=self.flat, norm=self.norm,
                name=f"layer_{i}",
            )(x, h, graph, v=v)
        return x, v, h


class GNNLayer(fnn.Module):
    hidden: int
    flat: bool = False

    @fnn.compact
    def __call__(self, h, graph: GraphBatch):
        dst, src = graph.dst, graph.src
        hij = jnp.concatenate([h[dst], h[src], graph.edge_attr], axis=-1)
        message = BaseMLP(self.hidden, self.hidden, flat=self.flat,
                          name="edge_message_net")(hij)
        agg = segment_mean(
            message, dst, h.shape[0], mask=graph.edge_mask, indices_are_sorted=True
        )
        h = h + BaseMLP(self.hidden, self.hidden, flat=self.flat, name="node_net")(
            jnp.concatenate([agg, h], axis=-1)
        )
        return h


class GNN(fnn.Module):
    """Non-equivariant baseline: input [loc, vel] (6 feats), output positions
    via a 3-dim decoder (``basic.py:382-404``; wiring ``utils/train.py:80-82``)."""

    hidden: int = 64
    n_layers: int = 4
    flat: bool = False

    @fnn.compact
    def __call__(self, graph: GraphBatch):
        nodes = jnp.concatenate([graph.coord, graph.vel], axis=-1)
        h = Linear(self.hidden, name="embedding")(nodes)
        for i in range(self.n_layers):
            h = GNNLayer(self.hidden, flat=self.flat, name=f"layer_{i}")(h, graph)
        h = Linear(self.hidden, name="dec0")(h)
        h = fnn.silu(h)
        return Linear(3, name="dec1")(h)


class LinearDynamics(fnn.Module):
    """x + v * t with a single learned scalar t (``basic.py:407-415``)."""

    @fnn.compact
    def __call__(self, graph: GraphBatch):
        t = self.param("time", fnn.initializers.ones, (1,), jnp.float32)
        return graph.coord + graph.vel * t


class GCLRfVel(fnn.Module):
    """Radial-field cell (``basic.py:434-469``)."""

    hidden: int

    @fnn.compact
    def __call__(self, x, vel_norm, vel, graph: GraphBatch):
        dst, src = graph.dst, graph.src
        x_diff = x[dst] - x[src]
        radial = jnp.linalg.norm(x_diff, axis=-1, keepdims=True)
        e_in = jnp.concatenate([radial, graph.edge_attr], axis=-1)
        phi = Linear(self.hidden, name="phi0")(e_in)
        phi = fnn.silu(phi)
        phi = Linear(1, use_bias=False, kernel_init=xavier_uniform_gain(0.001),
                     name="phi1")(phi)
        m = x_diff * jnp.tanh(phi)
        agg = segment_mean(m, dst, x.shape[0], mask=graph.edge_mask,
                           indices_are_sorted=True)
        x = x + agg
        gate = Linear(self.hidden, name="vel0")(vel_norm)
        gate = fnn.silu(gate)
        gate = Linear(1, name="vel1")(gate)
        return x + vel * gate


class RFVel(fnn.Module):
    """``basic.py:418-431`` (CLI name "RF")."""

    hidden: int = 64
    n_layers: int = 4

    @fnn.compact
    def __call__(self, graph: GraphBatch):
        vel_norm = jnp.linalg.norm(graph.vel, axis=-1, keepdims=True)
        vel_norm = jax.lax.stop_gradient(vel_norm)
        x = graph.coord
        for i in range(self.n_layers):
            x = GCLRfVel(self.hidden, name=f"gcl_{i}")(
                x, vel_norm, graph.vel, graph
            )
        return x


class EGMN(fnn.Module):
    """Stacked EquivariantScalarNets, growing the vector list (``basic.py:344-361``)."""

    hidden: int
    n_layers: int
    norm: bool = False
    flat: bool = False

    @fnn.compact
    def __call__(self, vectors: List[jax.Array], scalars: jax.Array):
        cur = list(vectors)
        for i in range(self.n_layers):
            Z = jnp.stack(cur, axis=-1)
            vector, scalars = EquivariantScalarNet(
                self.hidden, norm=self.norm, flat=self.flat, name=f"layer_{i}"
            )(Z, scalars)
            cur.append(vector)
        return cur[-1], scalars


class FullMLP(fnn.Module):
    """Non-geometric MLP baseline (``basic.py:739-754``)."""

    hidden: int = 64
    n_layers: int = 4
    flat: bool = False

    @fnn.compact
    def __call__(self, x):
        x = Linear(self.hidden, name="embedding")(x)
        for i in range(self.n_layers):
            x = BaseMLP(self.hidden, self.hidden, residual=True, last_act=True,
                        flat=self.flat, name=f"layer_{i}")(x)
        return Linear(3, name="output")(x)
