"""VNEGNN — virtual-node EGNN baseline (VN-EGNN style).

Re-design of reference ``models/VNEGNN.py``: each layer runs three sub-cells
in sequence —
- A2A: a classic EGNN cell over real->real edges (``VNEGNN.py:28-132``;
  note its node aggregation is a *sum*, ``:88``, and coord aggregation a
  mean, ``:105``);
- A2V: real->virtual messages pooled per graph update virtual feats/coords
  (``VNEGNN.py:136-226``);
- V2A: virtual->real messages (mean over channels) update real feats/coords
  (``VNEGNN.py:229-320``; note the channel-*mean* for node feats, ``:297``,
  unlike FastEGNN's flatten).

Virtual positions come from the dataset (fibonacci sphere,
``utils/train.py:54-56`` + ``datasets/protein/dataset.py:176-205``), not from
the coordinate mean.  Channel-major layout as in fast_egnn.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import (
    MLP, CoordMLP, Linear, SplitCoordMLP, SplitMLP)
from fastegnn_tpu.ops.segment import graph_mean_pool, segment_mean, segment_sum


def _dense_messages(h, x, vh, vx, gid, H, C, name="edge_mlp"):
    """Flat-layout dense real<->virtual messages shared by A2V / V2A.

    First-layer split of the edge MLP over [h | vh | vrad] (the per-graph
    summand vh W0v + b0 is computed at [B, C, H] and gathered; exact
    re-association as in models/fast_egnn.py).  Returns
    (m [N*C, H], vdiff [N, C, 3])."""
    N = x.shape[0]
    B = vh.shape[0]
    vx_nf = jnp.take(vx.reshape(B, C * 3), gid, axis=0, mode="clip")
    vdiff = (vx_nf - jnp.tile(x, (1, C))).reshape(N, C, 3)
    vrad = jnp.sqrt(jnp.sum(vdiff * vdiff, axis=-1))   # [N, C]
    mlp = SplitMLP(H, H, act_final=True, name=name)
    W0, b0, W1, b1 = mlp.weights(2 * H + 1)
    zb = vh @ W0[H : 2 * H] + b0                        # [B, C, H]
    zb_n = jnp.take(
        zb.reshape(B, C * H), gid, axis=0, mode="clip"
    ).reshape(N * C, H)
    z1 = (
        (h @ W0[:H])[:, None, :] + vrad[:, :, None] * W0[2 * H]
    ).reshape(N * C, H) + zb_n
    m = fnn.silu(fnn.silu(z1) @ W1 + b1)                # [N*C, H]
    return m, vdiff


class EGCL_A2A(fnn.Module):
    hidden: int
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    epsilon: float = 1e-8

    @fnn.compact
    def __call__(self, h, x, graph: GraphBatch, node_attr=None):
        dst, src, emask = graph.dst, graph.src, graph.edge_mask
        coord_diff = x[dst] - x[src]
        radial = jnp.sum(coord_diff**2, axis=-1, keepdims=True)
        if self.normalize:
            norm = jax.lax.stop_gradient(jnp.sqrt(radial)) + self.epsilon
            coord_diff = coord_diff / norm
        e_in = jnp.concatenate([h[dst], h[src], radial, graph.edge_attr], axis=-1)
        m = MLP([self.hidden, self.hidden], act_final=True, name="edge_mlp")(e_in)
        if self.attention:
            m = m * fnn.sigmoid(Linear(1, name="att_mlp")(m))
        trans = coord_diff * CoordMLP(self.hidden, tanh=self.tanh, name="coord_mlp")(m)
        x = x + segment_mean(trans, dst, x.shape[0], mask=emask, indices_are_sorted=True)
        # node aggregation is a SUM here (VNEGNN.py:88)
        agg = segment_sum(m, dst, h.shape[0], mask=emask, indices_are_sorted=True)
        parts = [h, agg] + ([node_attr] if node_attr is not None else [])
        dh = MLP([self.hidden, self.hidden], name="node_mlp")(
            jnp.concatenate(parts, axis=-1)
        )
        h = h + dh if self.residual else dh
        return h, x


class EGCL_A2V(fnn.Module):
    hidden: int
    virtual_channels: int
    residual: bool = True
    attention: bool = False
    tanh: bool = False

    @fnn.compact
    def __call__(self, h, x, vh, vx, graph: GraphBatch):
        """vh [B,C,H], vx [B,C,3] -> updated (vh, vx)."""
        H, C = self.hidden, self.virtual_channels
        N, B = x.shape[0], graph.n_graphs
        gid, nmask = graph.graph_id, graph.node_mask
        m, vdiff = _dense_messages(h, x, vh, vx, gid, H, C)  # [N*C, H]
        if self.attention:
            m = m * fnn.sigmoid(Linear(1, name="att_mlp")(m))
        gate = SplitCoordMLP(H, tanh=self.tanh, name="coord_mlp")(m)
        vxg = (vdiff * gate.reshape(N, C, 1)).reshape(N, C * 3)
        m_flat = m.reshape(N, C * H)
        pooled = graph_mean_pool(
            jnp.concatenate([vxg, m_flat], axis=-1), gid, graph.n_graphs,
            nmask,
        )
        vx = vx + pooled[:, : C * 3].reshape(B, C, 3)
        pool = pooled[:, C * 3 :].reshape(B, C, H)
        dvh = MLP([H, H], name="node_mlp")(jnp.concatenate([vh, pool], axis=-1))
        vh = vh + dvh if self.residual else dvh
        return vh, vx


class EGCL_V2A(fnn.Module):
    hidden: int
    virtual_channels: int
    residual: bool = True
    attention: bool = False
    tanh: bool = False

    @fnn.compact
    def __call__(self, vh, vx, h, x, graph: GraphBatch, node_attr=None):
        H, C = self.hidden, self.virtual_channels
        N = x.shape[0]
        gid = graph.graph_id
        m, vdiff = _dense_messages(h, x, vh, vx, gid, H, C)  # [N*C, H]
        if self.attention:
            m = m * fnn.sigmoid(Linear(1, name="att_mlp")(m))
        gate = SplitCoordMLP(H, tanh=self.tanh, name="coord_mlp")(m)
        x = x + jnp.einsum("ncd,nc->nd", -vdiff, gate.reshape(N, C)) / C
        # channel-mean of messages (VNEGNN.py:297), unlike FastEGNN's flatten
        m_mean = jnp.mean(m.reshape(N, C, H), axis=1)  # [N, H]
        parts = [h, m_mean] + ([node_attr] if node_attr is not None else [])
        dh = MLP([H, H], name="node_mlp")(jnp.concatenate(parts, axis=-1))
        h = h + dh if self.residual else dh
        return h, x


class VNEGNN(fnn.Module):
    """``__call__(graph) -> (coord_pred [N,3], virtual_coord [B,3,C])``.

    Virtual positions are taken from ``graph.virtual_fibonacci`` when present,
    else from ``graph.loc_mean``.
    """

    hidden: int = 64
    virtual_channels: int = 3
    n_layers: int = 4
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    use_node_attr: bool = False

    @fnn.compact
    def __call__(self, graph: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        assert self.virtual_channels > 0
        B, C, H = graph.n_graphs, self.virtual_channels, self.hidden
        vh0 = self.param(
            "virtual_node_feat", fnn.initializers.normal(1.0), (1, C, H), jnp.float32
        )
        vh = jnp.broadcast_to(vh0, (B, C, H))
        v_init = (
            graph.virtual_fibonacci
            if graph.virtual_fibonacci is not None
            else graph.loc_mean
        )
        vx = jnp.transpose(v_init, (0, 2, 1))  # [B, C, 3]
        h = Linear(H, name="embedding_in")(graph.node_feat)
        x = graph.coord
        node_attr = graph.node_attr if self.use_node_attr else None

        for i in range(self.n_layers):
            h, x = EGCL_A2A(
                H, self.residual, self.attention, self.normalize, self.tanh,
                name=f"A2A_{i}",
            )(h, x, graph, node_attr)
            vh, vx = EGCL_A2V(
                H, C, self.residual, self.attention, self.tanh, name=f"A2V_{i}"
            )(h, x, vh, vx, graph)
            h, x = EGCL_V2A(
                H, C, self.residual, self.attention, self.tanh, name=f"V2A_{i}"
            )(vh, vx, h, x, graph, node_attr)

        return x, jnp.transpose(vx, (0, 2, 1))
