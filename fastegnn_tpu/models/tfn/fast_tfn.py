"""FastTFN — Fast* family variant with a TFN real<->real coordinate core.

Re-design of reference ``models/FastTFN.py``: FastEGNN's virtual-node
machinery (edge/virtual messages, pools, feature updates) with the real-node
coordinate update produced by a 1-layer TFN over the graph
(``FastTFN.py:30,99-119,225``: OursTFN(num_layers=1, num_channels=1,
num_degrees=2) on (charges type-0, velocity type-1), type-1 output + x).
No velocity or real-edge coordinate terms outside the TFN; gravity optional.
The unused ``W`` parameter (``FastTFN.py:268``) is dropped.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import (
    MLP, Linear, SplitCoordMLP, SplitMLP)
from fastegnn_tpu.models.tfn.models import OursTFN, vec_from_sh, vec_to_sh
from fastegnn_tpu.ops.segment import graph_mean_pool, segment_mean


class TFNGCLVel(fnn.Module):
    """One FastTFN layer (reference ``TFN_GCL_vel``, ``FastTFN.py:8-234``)."""

    hidden: int
    virtual_channels: int
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    has_gravity: bool = False
    epsilon: float = 1e-8

    @fnn.compact
    def __call__(self, h, charges, x, v, vx, vh, graph: GraphBatch,
                 gravity: Optional[jax.Array] = None, node_attr=None):
        H, C = self.hidden, self.virtual_channels
        dst, src, emask = graph.dst, graph.src, graph.edge_mask
        gid, nmask = graph.graph_id, graph.node_mask

        N = x.shape[0]
        B = graph.n_graphs
        coord_diff = x[dst] - x[src]
        radial = jnp.sum(coord_diff**2, axis=-1, keepdims=True)
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

        # real<->real coordinate update by the 1-layer TFN (FastTFN.py:225)
        tfn_h = {0: charges[..., None], 1: vec_to_sh(v)[:, None, :]}
        tfn_out = OursTFN(
            num_layers=1, num_channels=1, num_degrees=2, edge_dim=0,
            name="tfn_layer",
        )(tfn_h, graph)
        x_new = x + vec_from_sh(tfn_out[1][:, 0, :])

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

        x_new = x_new + jnp.einsum("ncd,nc->nd", -vdiff, gate_xv) / C
        if self.has_gravity:
            x_new = x_new + MLP([H, 1], name="gravity_mlp")(h) * gravity

        flat_mv = m_v.reshape(N, C * H)
        # one merged pool pass over [vdiff * gate_X | m_v]
        vxg = (vdiff * gate_X[:, :, None]).reshape(N, C * 3)
        pooled = graph_mean_pool(
            jnp.concatenate([vxg, flat_mv], axis=-1), gid, graph.n_graphs,
            nmask,
        )
        vx_new = vx + pooled[:, : C * 3].reshape(B, C, 3)
        pool_mv = pooled[:, C * 3 :].reshape(B, C, H)

        agg_e = segment_mean(m_e, dst, h.shape[0], mask=emask,
                             indices_are_sorted=True)
        parts = [h, agg_e, flat_mv] + ([node_attr] if node_attr is not None else [])
        dh = MLP([H, H], name="node_mlp")(jnp.concatenate(parts, axis=-1))
        h_new = h + dh if self.residual else dh

        dvh = MLP([H, H], name="node_mlp_virtual")(
            jnp.concatenate([vh, pool_mv], axis=-1)
        )
        vh_new = vh + dvh if self.residual else dvh
        return h_new, x_new, vx_new, vh_new


class FastTFN(fnn.Module):
    """``__call__(graph) -> (coord_pred, virtual_coord [B,3,C])``
    (reference ``FastTFN.py:237-288``; train wiring passes charges as
    ``node_attr``, ``utils/train.py:60-62``)."""

    hidden: int = 64
    virtual_channels: int = 3
    n_layers: int = 4
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    gravity: Optional[Tuple[float, float, float]] = None

    @fnn.compact
    def __call__(self, graph: GraphBatch) -> Tuple[jax.Array, jax.Array]:
        assert self.virtual_channels > 0
        B, C, H = graph.n_graphs, self.virtual_channels, self.hidden
        vh0 = self.param(
            "virtual_node_feat", fnn.initializers.normal(1.0), (1, C, H),
            jnp.float32,
        )
        vh = jnp.broadcast_to(vh0, (B, C, H))
        vx = jnp.transpose(graph.loc_mean, (0, 2, 1))
        h = Linear(H, name="embedding_in")(graph.node_feat)
        x, v = graph.coord, graph.vel
        charges = (
            graph.node_attr
            if graph.node_attr is not None
            else graph.node_feat[:, :1]
        )
        g = jnp.asarray(self.gravity, jnp.float32) if self.gravity is not None else None
        for i in range(self.n_layers):
            h, x, vx, vh = TFNGCLVel(
                hidden=H, virtual_channels=C, residual=self.residual,
                attention=self.attention, normalize=self.normalize,
                tanh=self.tanh, has_gravity=self.gravity is not None,
                name=f"gcl_{i}",
            )(h, charges, x, v, vx, vh, graph, gravity=g)
        return x, jnp.transpose(vx, (0, 2, 1))
