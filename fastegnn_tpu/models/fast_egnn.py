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

Graph parallelism lives in ``parallel/owner_graph.py`` (owner-sharded node
state, targeted per-pair halo all_to_all, per-shard fused v5 kernels); it
consumes the same single-copy layer math from ``models/fastegnn_core.py``,
so this module stays single-device.  Exactness: 1-shard vs G-shard outputs
agree to float tolerance (tests/test_graph_parallel.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.fastegnn_core import (
    LayerCfg,
    LayerWeights,
    edge_messages,
    make_take_pool,
    virtual_and_node_update,
)
from fastegnn_tpu.models.nn import Linear, RawLinear, SplitCoordMLP, SplitMLP
from fastegnn_tpu.ops.segment import segment_count, segment_sum
from fastegnn_tpu.ops.spmm import gather_dst, gather_src, sorted_segment_sum_csr


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
    # Fused Pallas edge-block kernel (ops/edge_kernel.py v2): fully-fused
    # forward AND backward.  None = auto (on for TPU backends, off elsewhere
    # where the kernel would run in the slow interpreter); True forces it
    # (tests), False disables.  Falls back to the XLA path when the batch has
    # no slot tables or the layer uses attention/normalize/tanh variants.
    fuse_edge: Optional[bool] = None
    # MLP compute dtype ("bfloat16" halves every edge-stream byte; geometry,
    # residual state, and all reductions stay float32)
    compute_dtype: str = "float32"

    @fnn.compact
    def __call__(
        self,
        h: jax.Array,              # [N, H]  (replicated when sharded)
        x: jax.Array,              # [N, 3]
        v: jax.Array,              # [N, 3]
        vx: jax.Array,             # [B, C, 3] virtual coords
        vh: jax.Array,             # [B, C, H] virtual feats
        graph: GraphBatch,         # local edge shard when sharded
        gravity: Optional[jax.Array] = None,   # [3]
        node_attr: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        H, C = self.hidden, self.virtual_channels
        n_graphs = graph.n_graphs
        dst, src = graph.dst, graph.src
        emask = graph.edge_mask
        N = h.shape[0]

        # ---- submodules (named once; identical param tree for both paths) ----
        # edge-path Linears are declared individually so the fused Pallas
        # kernel can read raw weights directly (RawLinear: zero-cost access)
        e_lin0 = RawLinear(H, name="edge_mlp_lin0")
        e_lin1 = RawLinear(H, name="edge_mlp_lin1")
        r_lin0 = RawLinear(H, name="coord_mlp_r_lin0")
        from fastegnn_tpu.models.nn import xavier_uniform_gain

        r_head = RawLinear(1, use_bias=False,
                           kernel_init=xavier_uniform_gain(0.001),
                           name="coord_mlp_r_head")

        # virtual-block MLPs are Split* modules: identical param trees to
        # MLP/CoordMLP, but the core math re-associates their dots from the
        # raw weights (scripts/vblock_lab.py "flat3")
        edge_mlp_virtual = SplitMLP(H, H, act_final=True, name="edge_mlp_virtual")
        coord_mlp_r_virtual = SplitCoordMLP(
            H, tanh=self.tanh, name="coord_mlp_r_virtual"
        )
        coord_mlp_v_virtual = SplitCoordMLP(
            H, tanh=self.tanh, name="coord_mlp_v_virtual"
        )
        coord_mlp_vel = SplitMLP(H, 1, name="coord_mlp_vel")
        node_mlp = SplitMLP(H, H, name="node_mlp")
        node_mlp_virtual = SplitMLP(H, H, name="node_mlp_virtual")
        att_mlp = RawLinear(1, name="att_mlp") if self.attention else None
        att_mlp_virtual = (
            RawLinear(1, name="att_mlp_virtual") if self.attention else None
        )
        gravity_mlp = SplitMLP(H, 1, name="gravity_mlp") if self.has_gravity else None

        # ---- raw weights (direct param access; zero fwd/bwd overhead) ----
        # Feeds BOTH the fused Pallas kernel and the single-copy layer math
        # in models/fastegnn_core.py.
        ein_dim = 2 * H + 1 + graph.edge_attr.shape[1]
        W1, b1 = e_lin0.raw(ein_dim)
        W2, b2 = e_lin1.raw(H)
        Wg1, bg1 = r_lin0.raw(H)
        wg2, _ = r_head.raw(H)  # no bias
        ev_W0, ev_b0, ev_W1, ev_b1 = edge_mlp_virtual.weights(2 * H + 1 + C)
        rv_W0, rv_b0, rv_w1 = coord_mlp_r_virtual.weights()
        vv_W0, vv_b0, vv_w1 = coord_mlp_v_virtual.weights()
        vel_W0, vel_b0, vel_W1, vel_b1 = coord_mlp_vel.weights(H)
        na_dim = 0 if node_attr is None else node_attr.shape[1]
        node_K0, node_k0, node_K1, node_k1 = node_mlp.weights(
            2 * H + C * H + na_dim
        )
        nodev_W0, nodev_b0, nodev_W1, nodev_b1 = node_mlp_virtual.weights(2 * H)
        wkw = {}
        if self.has_gravity:
            gW0, gb0, gW1, gb1 = gravity_mlp.weights(H)
            wkw.update(grav_W0=gW0, grav_b0=gb0, grav_W1=gW1, grav_b1=gb1)
        if self.attention:
            aw, ab = att_mlp.raw(H)
            wkw.update(att_w=aw, att_b=ab)
            avw, avb = att_mlp_virtual.raw(H)
            wkw.update(att_v_w=avw, att_v_b=avb)
        w = LayerWeights(
            W1=W1, b1=b1, W2=W2, b2=b2, Wg1=Wg1, bg1=bg1, wg2=wg2,
            ev_W0=ev_W0, ev_b0=ev_b0, ev_W1=ev_W1, ev_b1=ev_b1,
            rv_W0=rv_W0, rv_b0=rv_b0, rv_w1=rv_w1,
            vv_W0=vv_W0, vv_b0=vv_b0, vv_w1=vv_w1,
            vel_W0=vel_W0, vel_b0=vel_b0, vel_W1=vel_W1, vel_b1=vel_b1,
            node_K0=node_K0, node_k0=node_k0, node_K1=node_K1,
            node_k1=node_k1,
            nodev_W0=nodev_W0, nodev_b0=nodev_b0, nodev_W1=nodev_W1,
            nodev_b1=nodev_b1, **wkw,
        )
        cfg = LayerCfg(
            hidden=H, virtual_channels=C, residual=self.residual,
            attention=self.attention, normalize=self.normalize,
            tanh=self.tanh, coords_agg=self.coords_agg,
            has_gravity=self.has_gravity, epsilon=self.epsilon,
            compute_dtype=jnp.dtype(self.compute_dtype),
        )

        # ---- sparse real<->real edge block (local edges) ----
        use_pallas = graph.csr_dst is not None
        cd = jnp.dtype(self.compute_dtype)
        fuse = (
            self.fuse_edge
            if self.fuse_edge is not None
            else jax.default_backend() == "tpu"
        )
        use_fused = (
            (graph.ek5 is not None or graph.ek5_groups is not None)
            and fuse
            and H == 64
            and graph.edge_attr.shape[1] <= 3
            and not self.attention
            and not self.normalize
            and not self.tanh
            and self.coords_agg == "mean"
        )
        if use_fused:
            from fastegnn_tpu.ops.edge_kernel_v5 import fused_edge_block_v5

            if graph.ek5 is not None:
                m_sum, trans_sum = fused_edge_block_v5(
                    h, x, graph.ek5, W1, b1, W2, b2, Wg1, bg1, wg2,
                    compute_dtype=cd,
                )
            else:
                # graph groups: one kernel call per <=12k-node run of whole
                # graphs (edges never cross graphs); static row slices into
                # the node state and static super_off views into the ONE
                # packed meta (4 device arrays shared by all groups)
                packed = graph.ek5_groups
                parts = [
                    fused_edge_block_v5(
                        jax.lax.slice_in_dim(h, r0, r0 + rr),
                        jax.lax.slice_in_dim(x, r0, r0 + rr),
                        packed.replace(super_off=soff, n_super=nsup,
                                       n_blocks=nblk, n_slots=nsl,
                                       n_chunks=nch),
                        W1, b1, W2, b2, Wg1, bg1, wg2,
                        compute_dtype=cd,
                    )
                    for (r0, rr, soff, nsup, nblk, nsl, nch)
                    in graph.ek5_group_rows
                ]
                m_sum = jnp.concatenate([p[0] for p in parts], axis=0)
                trans_sum = jnp.concatenate([p[1] for p in parts], axis=0)
            if graph.dst_count is not None:
                cnt = graph.dst_count
            else:
                cnt = segment_count(dst, N, mask=emask, indices_are_sorted=True)
        else:
            if use_pallas:
                # fused [h|x] gathers; backward is the Pallas CSR scatter
                hx = jnp.concatenate([h, x], axis=-1)     # [N, H+3]
                hx_dst = gather_dst(hx, dst, graph.csr_dst)
                hx_src = gather_src(
                    hx, src, graph.src_perm, graph.src_sorted, graph.csr_src
                )
                h_dst, x_dst = hx_dst[:, :H], hx_dst[:, H:]
                h_src, x_src = hx_src[:, :H], hx_src[:, H:]
            else:
                h_dst, x_dst, h_src, x_src = h[dst], x[dst], h[src], x[src]
            # single-copy edge math (models/fastegnn_core.py): phi_e ->
            # attention -> phi_x gate -> translation
            m_e, trans = edge_messages(
                cfg, w, h_dst, h_src, x_dst, x_src, graph.edge_attr
            )                                             # [E, H] cd, [E, 3] f32

            # per-edge reductions (one kernel pass over [m_e | trans]);
            # accumulation is f32 regardless of compute dtype
            if use_pallas:
                combined = jnp.concatenate(
                    [m_e, trans.astype(cd)], axis=-1
                )                                         # [E, H+3] (cd)
                summed = sorted_segment_sum_csr(
                    combined, dst, graph.csr_dst, N
                )
                m_sum, trans_sum = summed[:, :H], summed[:, H:]
            else:
                trans_sum = segment_sum(
                    trans, dst, N, mask=emask, indices_are_sorted=True
                )
                m_sum = segment_sum(
                    m_e.astype(jnp.float32), dst, N, mask=emask,
                    indices_are_sorted=True,
                )
            if graph.dst_count is not None:
                cnt = graph.dst_count
            else:
                cnt = segment_count(
                    dst, N, mask=emask, indices_are_sorted=True
                )

        cnt = jnp.maximum(cnt, 1.0)
        agg_x = trans_sum / cnt[:, None] if self.coords_agg == "mean" else trans_sum
        agg_e = m_sum / cnt[:, None]   # node model always uses mean (:156)

        # ---- post-aggregation math: single copy in fastegnn_core ----
        # (dense real<->virtual flat3 block, combined gate heads, velocity/
        # gravity gates, coordinate/feature updates; on the bf16 path the
        # injected take/pool are one-hot MXU matmuls, psum-aware when sharded)
        take, pool = make_take_pool(
            graph.graph_id, graph.node_mask, n_graphs,
            use_onehot=cd == jnp.bfloat16, compute_dtype=cd,
        )
        return virtual_and_node_update(
            cfg, w, h, x, v, vx, vh, graph.graph_id, agg_x, agg_e,
            take=take, pool=pool, gravity=gravity, node_attr=node_attr,
        )


class FastEGNN(fnn.Module):
    """Reference ``FastEGNN`` wrapper (``models/FastEGNN.py:226-276``).

    ``__call__(graph) -> (coord_pred [N,3], virtual_coord [B,3,C])``.

    For graph parallelism use ``parallel/owner_graph.py`` (same params).
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
    fuse_edge: Optional[bool] = None
    compute_dtype: str = "float32"

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
                fuse_edge=self.fuse_edge,
                compute_dtype=self.compute_dtype,
                name=f"gcl_{i}",
            )(h, x, v, vx, vh, graph, gravity=g, node_attr=node_attr)

        return x, jnp.transpose(vx, (0, 2, 1))  # virtual coords back to [B,3,C]
