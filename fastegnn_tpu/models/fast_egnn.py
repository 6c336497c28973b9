"""FastEGNN — E(3)-equivariant message passing with virtual global nodes.

TPU-native re-design of the reference centerpiece (``models/FastEGNN.py``):
an EGNN-with-velocity cell whose every aggregation is a masked segment op over
a static-shape :class:`~fastegnn_tpu.graph.GraphBatch`, plus a *dense*
real-node <-> virtual-node block that is pure batched matmul (MXU food).

Layout note: virtual tensors here are channel-major — virtual coords
``[B, C, 3]``, virtual feats ``[B, C, H]``, per-node virtual messages
``[N, C, H]`` — so the per-channel MLPs of the reference (applied via
``permute(0, 2, 1)`` sandwiches, ``models/FastEGNN.py:115,136,147,173``)
become plain trailing-axis Linears.  Consequence: the flattened virtual
message fed to the node MLP is in ``[C, H]`` order rather than the
reference's ``[H, C]`` (``models/FastEGNN.py:157``) — an equivalent
architecture; the state-dict mapping tool permutes that first layer's
columns when importing reference weights.

Math per layer (reference ``models/FastEGNN.py:192-223``):
- radial_e  = ||x_dst - x_src||^2                        (coord2radial, :180-189)
- vdiff_nc  = X_{g(n),c} - x_n,  vrad = ||vdiff||        (:206-207)
- m_e       = phi_e(h_dst, h_src, radial, e_attr)        (:102-108)
- Gram_g    = (X - mean x)(X - mean x)^T over channels   (:212-214)
- M_nc      = phi_ev(h_n, Hv_{g(n),c}, vrad, Gram_{g(n)}) (:111-119)
- x_n      += mean_{e: dst=n} (x_dst - x_src) phi_x(m_e)
            + mean_c(-vdiff * phi_xv(M))
            + phi_v(h) v_n [+ phi_g(h) g]                (:122-144)
- X_gc     += mean_{n in g} vdiff * phi_X(M)             (:146-150)
- h_n      += phi_h(h, mean_e m, flatten_c M)            (:153-166)
- Hv_gc    += phi_hv(Hv, mean_n M)                       (:168-177)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.nn import MLP, CoordMLP, Linear
from fastegnn_tpu.ops.segment import graph_mean_pool, segment_mean


class EGCLVel(fnn.Module):
    """One FastEGNN layer (reference ``E_GCL_vel``, ``models/FastEGNN.py:6-223``)."""

    hidden: int
    virtual_channels: int
    residual: bool = True
    attention: bool = False
    normalize: bool = False
    coords_agg: str = "mean"
    tanh: bool = False
    has_gravity: bool = False
    epsilon: float = 1e-8

    @fnn.compact
    def __call__(
        self,
        h: jax.Array,              # [N, H]
        x: jax.Array,              # [N, 3]
        v: jax.Array,              # [N, 3]
        vx: jax.Array,             # [B, C, 3] virtual coords
        vh: jax.Array,             # [B, C, H] virtual feats
        graph: GraphBatch,
        gravity: Optional[jax.Array] = None,   # [3]
        node_attr: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        H, C = self.hidden, self.virtual_channels
        n_graphs = graph.n_graphs
        dst, src = graph.dst, graph.src
        emask, nmask = graph.edge_mask, graph.node_mask
        gid = graph.graph_id  # [N], padding -> n_graphs

        # --- sparse real<->real geometry ---
        coord_diff = x[dst] - x[src]                      # [E, 3]
        radial = jnp.sum(coord_diff**2, axis=-1, keepdims=True)  # [E, 1]
        if self.normalize:
            norm = jax.lax.stop_gradient(jnp.sqrt(radial)) + self.epsilon
            coord_diff = coord_diff / norm

        # --- dense real<->virtual geometry ---
        # gather virtual state per node; clip dump graph_id to a valid row
        # (those rows are masked out of every pool and loss).
        vx_n = jnp.take(vx, gid, axis=0, mode="clip")     # [N, C, 3]
        vh_n = jnp.take(vh, gid, axis=0, mode="clip")     # [N, C, H]
        vdiff = vx_n - x[:, None, :]                      # [N, C, 3]  (X - x)
        vrad = jnp.linalg.norm(vdiff, axis=-1, keepdims=True)  # [N, C, 1]

        # --- edge model phi_e ---
        e_in = jnp.concatenate([h[dst], h[src], radial, graph.edge_attr], axis=-1)
        m_e = MLP([H, H], act_final=True, name="edge_mlp")(e_in)  # [E, H]
        if self.attention:
            m_e = m_e * fnn.sigmoid(Linear(1, name="att_mlp")(m_e))

        # --- virtual edge model phi_ev ---
        coord_mean = graph_mean_pool(x, gid, n_graphs, nmask)     # [B, 3]
        m_x = vx - coord_mean[:, None, :]                         # [B, C, 3]
        gram = jnp.einsum("bci,bdi->bcd", m_x, m_x)               # [B, C, C]
        gram_n = jnp.take(gram, gid, axis=0, mode="clip")         # [N, C, C]
        ev_in = jnp.concatenate(
            [
                jnp.broadcast_to(h[:, None, :], (h.shape[0], C, H)),
                vh_n,
                vrad,
                gram_n,
            ],
            axis=-1,
        )  # [N, C, 2H+1+C]
        m_v = MLP([H, H], act_final=True, name="edge_mlp_virtual")(ev_in)  # [N, C, H]
        if self.attention:
            m_v = m_v * fnn.sigmoid(Linear(1, name="att_mlp_virtual")(m_v))

        # --- coordinate update, real nodes (phi_x, phi_xv, phi_v, phi_g) ---
        trans = coord_diff * CoordMLP(H, tanh=self.tanh, name="coord_mlp_r")(m_e)
        if self.coords_agg == "mean":
            agg = segment_mean(
                trans, dst, h.shape[0], mask=emask, indices_are_sorted=True
            )
        elif self.coords_agg == "sum":
            agg = jax.ops.segment_sum(
                trans * emask[:, None].astype(trans.dtype),
                dst,
                num_segments=h.shape[0],
                indices_are_sorted=True,
            )
        else:
            raise ValueError(f"bad coords_agg {self.coords_agg!r}")
        x_new = x + agg
        gate_xv = CoordMLP(H, tanh=self.tanh, name="coord_mlp_r_virtual")(m_v)  # [N,C,1]
        x_new = x_new + jnp.mean(-vdiff * gate_xv, axis=1)  # [N, 3]
        x_new = x_new + MLP([H, 1], name="coord_mlp_vel")(h) * v
        if self.has_gravity:
            x_new = x_new + MLP([H, 1], name="gravity_mlp")(h) * gravity

        # --- coordinate update, virtual nodes (phi_X) ---
        gate_X = CoordMLP(H, tanh=self.tanh, name="coord_mlp_v_virtual")(m_v)
        vx_new = vx + graph_mean_pool(vdiff * gate_X, gid, n_graphs, nmask)  # [B,C,3]

        # --- node feature update (phi_h) ---
        agg_e = segment_mean(m_e, dst, h.shape[0], mask=emask, indices_are_sorted=True)
        flat_mv = m_v.reshape(m_v.shape[0], C * H)  # [C,H]-order flatten (see module doc)
        h_parts = [h, agg_e, flat_mv]
        if node_attr is not None:
            h_parts.append(node_attr)
        dh = MLP([H, H], name="node_mlp")(jnp.concatenate(h_parts, axis=-1))
        h_new = h + dh if self.residual else dh

        # --- virtual feature update (phi_hv) ---
        pool_mv = graph_mean_pool(m_v, gid, n_graphs, nmask)  # [B, C, H]
        dvh = MLP([H, H], name="node_mlp_virtual")(
            jnp.concatenate([vh, pool_mv], axis=-1)
        )
        vh_new = vh + dvh if self.residual else dvh

        return h_new, x_new, vx_new, vh_new


class FastEGNN(fnn.Module):
    """Reference ``FastEGNN`` wrapper (``models/FastEGNN.py:226-276``).

    ``__call__(graph) -> (coord_pred [N,3], virtual_coord [B,3,C])``.
    """

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
        assert self.virtual_channels > 0, "virtual_channels must be > 0"
        B, C, H = graph.n_graphs, self.virtual_channels, self.hidden

        # learned virtual feature, broadcast per graph (ref :256,267-268)
        vh0 = self.param(
            "virtual_node_feat",
            fnn.initializers.normal(stddev=1.0),
            (1, C, H),
            jnp.float32,
        )
        vh = jnp.broadcast_to(vh0, (B, C, H))
        vx = jnp.transpose(graph.loc_mean, (0, 2, 1))  # [B,3,C] -> [B,C,3] (ref :269)

        h = Linear(H, name="embedding_in")(graph.node_feat)
        x, v = graph.coord, graph.vel
        g = jnp.asarray(self.gravity, jnp.float32) if self.gravity is not None else None
        node_attr = graph.node_attr if self.use_node_attr else None

        for i in range(self.n_layers):
            h, x, vx, vh = EGCLVel(
                hidden=H,
                virtual_channels=C,
                residual=self.residual,
                attention=self.attention,
                normalize=self.normalize,
                tanh=self.tanh,
                has_gravity=self.gravity is not None,
                name=f"gcl_{i}",
            )(h, x, v, vx, vh, graph, gravity=g, node_attr=node_attr)

        return x, jnp.transpose(vx, (0, 2, 1))  # virtual coords back to [B,3,C]
