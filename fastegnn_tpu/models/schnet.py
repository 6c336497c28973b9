"""SchNet baseline and FastSchNet (Fast* variant with a SchNet coord core).

Re-design of reference ``models/SchNet.py`` (PyG SchNet adapted to return
positions) and ``models/FastSchNet.py`` (FastEGNN virtual-node machinery with
an embedded 1-interaction SchNet doing the real<->real coordinate update).

Reference semantics preserved:
- Gaussian smearing of distances over [0, cutoff] (``SchNet.py:335-349``);
- CFConv: filter W = MLP(gauss) * cosine-cutoff; messages ``h[dst] * W``
  aggregated by *sum at src* — PyG MessagePassing flows source(row=dst here)
  -> target(col=src) (``SchNet.py:299-332``);
- per-interaction coordinate update: mean-aggregated
  ``(pos[dst]-pos[src]) * Linear([gauss, h_dst, h_src])`` at dst
  (``SchNet.py:187-193``);
- shifted softplus activation;
- interaction linears init xavier-uniform with zero bias
  (``SchNet.py:282-289,316-319``);
- standalone SchNet: ``Linear(2, H)`` embedding, returns positions
  (``SchNet.py:119,179,195``); CLI config: 16 interactions, 128 filters,
  64 gaussians, cutoff 1 (``main_nbody.py:129``).
- FastSchNet cell (``FastSchNet.py:18-229``): embedded SchNet(1 interaction,
  cutoff 10) updates coords from real edges; virtual/gravity terms and
  node/virtual feature updates are FastEGNN's; ``phi_x`` and ``phi_v`` exist
  but are unused in the forward pass (``FastSchNet.py:137-145``) — kept out
  here; the unused ``W`` parameter (``FastSchNet.py:263``) is dropped.
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


def shifted_softplus(x):
    return fnn.softplus(x) - jnp.log(2.0)


def gaussian_smearing(dist, start, stop, num_gaussians):
    offset = jnp.linspace(start, stop, num_gaussians)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    d = dist[..., None] - offset
    return jnp.exp(coeff * d**2)


def _xavier_zero_bias(features, name):
    return Linear(
        features, kernel_init=fnn.initializers.xavier_uniform(), name=name
    )


class CFConv(fnn.Module):
    """Continuous-filter convolution (``SchNet.py:299-332``)."""

    hidden: int
    num_filters: int
    cutoff: float

    @fnn.compact
    def __call__(self, h, gauss, edge_weight, graph: GraphBatch):
        C = 0.5 * (jnp.cos(edge_weight * jnp.pi / self.cutoff) + 1.0)
        W = Linear(self.num_filters, kernel_init=fnn.initializers.xavier_uniform(),
                   name="nn0")(gauss)
        W = shifted_softplus(W)
        W = Linear(self.num_filters, kernel_init=fnn.initializers.xavier_uniform(),
                   name="nn1")(W)
        W = W * C[:, None]
        x = Linear(self.num_filters, use_bias=False,
                   kernel_init=fnn.initializers.xavier_uniform(), name="lin1")(h)
        # PyG flow: message x_j = x[row]=x[dst] aggregated (sum) at col=src
        msg = x[graph.dst] * W
        agg = segment_sum(msg, graph.src, h.shape[0], mask=graph.edge_mask)
        return Linear(self.hidden, kernel_init=fnn.initializers.xavier_uniform(),
                      name="lin2")(agg)


class InteractionBlock(fnn.Module):
    hidden: int
    num_filters: int
    cutoff: float

    @fnn.compact
    def __call__(self, h, gauss, edge_weight, graph: GraphBatch):
        x = CFConv(self.hidden, self.num_filters, self.cutoff, name="conv")(
            h, gauss, edge_weight, graph
        )
        x = shifted_softplus(x)
        return Linear(self.hidden, kernel_init=fnn.initializers.xavier_uniform(),
                      name="lin")(x)


class SchNetCore(fnn.Module):
    """Shared interaction stack; returns (pos, h).

    ``embed_input=True`` applies the Linear(2, H) input map (standalone
    SchNet); ``False`` consumes pre-embedded features (FastSchNet's embedded
    variant, ``FastSchNet.py:472``).
    """

    hidden: int = 64
    num_filters: int = 128
    num_interactions: int = 6
    num_gaussians: int = 50
    cutoff: float = 10.0
    embed_input: bool = True

    @fnn.compact
    def __call__(self, z, pos, graph: GraphBatch):
        h = Linear(self.hidden, name="embedding")(z) if self.embed_input else z
        dst, src, emask = graph.dst, graph.src, graph.edge_mask
        for i in range(self.num_interactions):
            edge_weight = jnp.linalg.norm(pos[dst] - pos[src], axis=-1)
            gauss = gaussian_smearing(edge_weight, 0.0, self.cutoff,
                                      self.num_gaussians)
            gate = Linear(1, name=f"coord_update_{i}")(
                jnp.concatenate([gauss, h[dst], h[src]], axis=-1)
            )
            aggr = segment_mean(
                (pos[dst] - pos[src]) * gate, dst, pos.shape[0], mask=emask,
                indices_are_sorted=True,
            )
            pos = pos + aggr
            h = h + InteractionBlock(
                self.hidden, self.num_filters, self.cutoff, name=f"interaction_{i}"
            )(h, gauss, edge_weight, graph)
        return pos, h


class SchNet(fnn.Module):
    """Standalone SchNet baseline; returns positions (``SchNet.py:165-195``).

    Reference quirk, preserved by default (``freeze_distances=True``): the
    distance expansion is computed once from the *input* positions
    (``SchNet.py:181-183``) even though positions are updated every
    interaction.  ``freeze_distances=False`` recomputes distances from
    current positions each interaction (arguably more physical; off for
    parity).
    """

    hidden: int = 64
    num_filters: int = 128
    num_interactions: int = 16
    num_gaussians: int = 64
    cutoff: float = 1.0
    freeze_distances: bool = True

    @fnn.compact
    def __call__(self, graph: GraphBatch):
        h = Linear(self.hidden, name="embedding")(graph.node_feat)
        pos = graph.coord
        dst, src, emask = graph.dst, graph.src, graph.edge_mask
        edge_weight0 = jnp.linalg.norm(pos[dst] - pos[src], axis=-1)
        gauss0 = gaussian_smearing(edge_weight0, 0.0, self.cutoff,
                                   self.num_gaussians)
        for i in range(self.num_interactions):
            if self.freeze_distances:
                edge_weight, gauss = edge_weight0, gauss0
            else:
                edge_weight = jnp.linalg.norm(pos[dst] - pos[src], axis=-1)
                gauss = gaussian_smearing(edge_weight, 0.0, self.cutoff,
                                          self.num_gaussians)
            gate = Linear(1, name=f"coord_update_{i}")(
                jnp.concatenate([gauss, h[dst], h[src]], axis=-1)
            )
            aggr = segment_mean(
                (pos[dst] - pos[src]) * gate, dst, pos.shape[0], mask=emask,
                indices_are_sorted=True,
            )
            pos = pos + aggr
            h = h + InteractionBlock(
                self.hidden, self.num_filters, self.cutoff, name=f"interaction_{i}"
            )(h, gauss, edge_weight, graph)
        return pos


class SchNetGCL(fnn.Module):
    """FastSchNet cell (``FastSchNet.py:18-229``)."""

    hidden: int
    virtual_channels: int
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    has_gravity: bool = False
    epsilon: float = 1e-8

    @fnn.compact
    def __call__(self, h, x, v, vx, vh, graph: GraphBatch,
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

        # real<->real coordinate update by the embedded SchNet (1 interaction,
        # cutoff 10; FastSchNet.py:40,220)
        x_new, _ = SchNetCore(
            hidden=H, num_interactions=1, cutoff=10.0, embed_input=False,
            name="schnet_layer",
        )(h, x, graph)

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

        agg_e = segment_mean(m_e, dst, h.shape[0], mask=emask, indices_are_sorted=True)
        parts = [h, agg_e, flat_mv] + ([node_attr] if node_attr is not None else [])
        dh = MLP([H, H], name="node_mlp")(jnp.concatenate(parts, axis=-1))
        h_new = h + dh if self.residual else dh

        dvh = MLP([H, H], name="node_mlp_virtual")(
            jnp.concatenate([vh, pool_mv], axis=-1)
        )
        vh_new = vh + dvh if self.residual else dvh
        return h_new, x_new, vx_new, vh_new


class FastSchNet(fnn.Module):
    """``__call__(graph) -> (coord_pred, virtual_coord [B,3,C])``
    (``FastSchNet.py:232-284``)."""

    hidden: int = 64
    virtual_channels: int = 3
    n_layers: int = 4
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    tanh: bool = False
    gravity: Optional[Tuple[float, float, float]] = None
    use_node_attr: bool = False

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
        g = jnp.asarray(self.gravity, jnp.float32) if self.gravity is not None else None
        node_attr = graph.node_attr if self.use_node_attr else None
        for i in range(self.n_layers):
            h, x, vx, vh = SchNetGCL(
                hidden=H, virtual_channels=C, residual=self.residual,
                attention=self.attention, normalize=self.normalize, tanh=self.tanh,
                has_gravity=self.gravity is not None, name=f"gcl_{i}",
            )(h, x, v, vx, vh, graph, gravity=g, node_attr=node_attr)
        return x, jnp.transpose(vx, (0, 2, 1))
