"""FastRF — Fast* family variant with a Radial-Field real-node update.

Re-design of reference ``models/FastRF.py``: identical virtual-node machinery
to FastEGNN, but
- the velocity term is gated by ``phi_v(||v||)`` (stop-gradient norm) instead
  of ``phi_v(h)`` (``FastRF.py:128,167``);
- there is **no node-feature update**: ``h`` stays the embedded input through
  all layers and the layer returns it unchanged (``FastRF.py:186``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import (
    MLP, CoordMLP, Linear, SplitCoordMLP, SplitMLP)
from fastegnn_tpu.ops.segment import graph_mean_pool, segment_mean


class RFGCLVel(fnn.Module):
    """One FastRF layer (reference ``FastRF.py:8-186``)."""

    hidden: int
    virtual_channels: int
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    has_gravity: bool = False
    epsilon: float = 1e-8

    @fnn.compact
    def __call__(
        self, h, x, v, v_norm, vx, vh, graph: GraphBatch,
        gravity: Optional[jax.Array] = None,
    ):
        H, C = self.hidden, self.virtual_channels
        dst, src, emask = graph.dst, graph.src, graph.edge_mask
        gid, nmask = graph.graph_id, graph.node_mask

        coord_diff = x[dst] - x[src]
        radial = jnp.sum(coord_diff**2, axis=-1, keepdims=True)
        if self.normalize:
            norm = jax.lax.stop_gradient(jnp.sqrt(radial)) + self.epsilon
            coord_diff = coord_diff / norm

        N = x.shape[0]
        B = graph.n_graphs
        # flat channel layout + first-layer split of phi_ev, as in
        # models/fast_egnn.py (exact re-association; scripts/vblock_lab.py)
        vx_nf = jnp.take(vx.reshape(B, C * 3), gid, axis=0, mode="clip")
        vdiff = (vx_nf - jnp.tile(x, (1, C))).reshape(N, C, 3)
        vrad = jnp.sqrt(jnp.sum(vdiff * vdiff, axis=-1))  # [N, C]

        e_in = jnp.concatenate([h[dst], h[src], radial, graph.edge_attr], axis=-1)
        m_e = MLP([H, H], act_final=True, name="edge_mlp")(e_in)
        if self.attention:
            m_e = m_e * fnn.sigmoid(Linear(1, name="att_mlp")(m_e))

        coord_mean = graph_mean_pool(x, gid, graph.n_graphs, nmask)
        m_x = vx - coord_mean[:, None, :]
        gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)
        ev_mlp = SplitMLP(H, H, act_final=True, name="edge_mlp_virtual")
        W0, b0, W1, b1 = ev_mlp.weights(2 * H + 1 + C)
        zb = vh @ W0[H : 2 * H] + gram @ W0[2 * H + 1 :] + b0  # [B, C, H]
        zb_n = jnp.take(
            zb.reshape(B, C * H), gid, axis=0, mode="clip"
        ).reshape(N * C, H)
        z1 = (
            (h @ W0[:H])[:, None, :] + vrad[:, :, None] * W0[2 * H]
        ).reshape(N * C, H) + zb_n
        m_v = fnn.silu(fnn.silu(z1) @ W1 + b1)            # [N*C, H]
        if self.attention:
            m_v = m_v * fnn.sigmoid(Linear(1, name="att_mlp_virtual")(m_v))

        # combined coordinate-gate heads (phi_xv, phi_X)
        r_head = SplitCoordMLP(H, tanh=self.tanh, name="coord_mlp_r_virtual")
        v_head = SplitCoordMLP(H, tanh=self.tanh, name="coord_mlp_v_virtual")
        Wr0, br0, wr1 = r_head.weights()
        Wv0, bv0, wv1 = v_head.weights()
        G1 = jnp.concatenate([Wr0, Wv0], axis=1)
        bG = jnp.concatenate([br0, bv0])
        G2 = jnp.zeros((2 * H, 2), jnp.float32)
        G2 = G2.at[:H, 0].set(wr1[:, 0]).at[H:, 1].set(wv1[:, 0])
        gates2 = fnn.silu(m_v @ G1 + bG) @ G2             # [N*C, 2]
        if self.tanh:
            gates2 = jnp.tanh(gates2)
        gate_xv = gates2[:, 0].reshape(N, C)
        gate_X = gates2[:, 1].reshape(N, C)

        trans = coord_diff * CoordMLP(H, tanh=self.tanh, name="coord_mlp_r")(m_e)
        x_new = x + segment_mean(trans, dst, x.shape[0], mask=emask,
                                 indices_are_sorted=True)
        x_new = x_new + jnp.einsum("ncd,nc->nd", -vdiff, gate_xv) / C
        # RF-form velocity term: v * phi(||v||)   (FastRF.py:128)
        x_new = x_new + v * MLP([H, 1], name="coord_mlp_vel")(v_norm)
        if self.has_gravity:
            x_new = x_new + MLP([H, 1], name="gravity_mlp")(h) * gravity

        vx_new = vx + graph_mean_pool(
            (vdiff * gate_X[:, :, None]).reshape(N, C * 3), gid,
            graph.n_graphs, nmask,
        ).reshape(B, C, 3)
        # NOTE: no node/virtual feature updates (FastRF.py:186)
        return h, x_new, vx_new, vh


class FastRF(fnn.Module):
    """``__call__(graph) -> (coord_pred [N,3], virtual_coord [B,3,C])``
    (reference ``FastRF.py:189-239``)."""

    hidden: int = 64
    virtual_channels: int = 3
    n_layers: int = 4
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    gravity: Optional[Tuple[float, float, float]] = None

    @fnn.compact
    def __call__(self, graph: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        assert self.virtual_channels > 0
        B, C, H = graph.n_graphs, self.virtual_channels, self.hidden
        vh0 = self.param(
            "virtual_node_feat", fnn.initializers.normal(1.0), (1, C, H), jnp.float32
        )
        vh = jnp.broadcast_to(vh0, (B, C, H))
        vx = jnp.transpose(graph.loc_mean, (0, 2, 1))
        h = Linear(H, name="embedding_in")(graph.node_feat)
        x, v = graph.coord, graph.vel
        v_norm = jax.lax.stop_gradient(
            jnp.linalg.norm(v, axis=-1, keepdims=True)
        )
        g = jnp.asarray(self.gravity, jnp.float32) if self.gravity is not None else None
        for i in range(self.n_layers):
            h, x, vx, vh = RFGCLVel(
                hidden=H, virtual_channels=C, attention=self.attention,
                normalize=self.normalize, tanh=self.tanh,
                has_gravity=self.gravity is not None, name=f"gcl_{i}",
            )(h, x, v, v_norm, vx, vh, graph, gravity=g)
        return x, jnp.transpose(vx, (0, 2, 1))
