"""EGHN — equivariant graph hierarchy network (reference ``basic.py:571-736``).

Low-level EGNN force block, a learned soft pooling over ``n_cluster``
clusters (PoolingNet on the *local* bond graph), a high-level EGNN over the
dense cluster graph (edge features = pooled adjacency), and an equivariant
kinematics decoder broadcasting cluster updates back to nodes.

Faithful notes:
- the reference computes a diagonal edge mask for the cluster graph but never
  applies it (``basic.py:678,725-736``) — reproduced (no mask);
- the auxiliary ``cut_loss`` (``basic.py:672,721-723``) is returned so the
  caller may add it;
- per-graph reductions use the padded [B, n_max] layout with node masks
  instead of ``n_node``-reshapes, and torch_sparse.spmm
  (``basic.py:668-673``) becomes a masked segment op.

Call signature differs from the uniform zoo API because EGHN needs the
*local* (bond) edge graph: ``__call__(graph, local_dst, local_src,
local_edge_attr, local_mask) -> (x_out, h_out, cut_loss)``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.models.basic import (
    BaseMLP,
    EGNN,
    EquivariantEdgeScalarNet,
    EquivariantScalarNet,
)
from fastegnn_tpu.models.nn import Linear
from fastegnn_tpu.ops.segment import segment_mean, segment_sum


class PoolingLayer(fnn.Module):
    """Vector-stack message passing layer (reference ``basic.py:514-543``)."""

    hidden: int
    flat: bool = False

    @fnn.compact
    def __call__(self, vectors, h, dst, src, edge_attr, emask):
        hij = jnp.concatenate([h[dst], h[src], edge_attr], axis=-1)
        v_i, v_j = vectors[dst], vectors[src]  # [E, 3, V]
        v_out, msg = EquivariantEdgeScalarNet(
            self.hidden, norm=True, flat=self.flat, name="edge_message_net"
        )(v_i, v_j, hij)
        V = v_out.shape[-1]
        flat_v = v_out.reshape(v_out.shape[0], 3 * V)
        agg_v = segment_mean(flat_v, dst, h.shape[0], mask=emask)
        vectors = vectors + agg_v.reshape(-1, 3, V)
        agg_m = segment_sum(msg, dst, h.shape[0], mask=emask)
        h = h + BaseMLP(self.hidden, self.hidden, flat=self.flat,
                        name="node_net")(
            jnp.concatenate([h, agg_m], axis=-1)
        )
        return vectors, h


class PoolingNet(fnn.Module):
    """Cluster-assignment network (reference ``basic.py:546-568``)."""

    hidden: int
    out: int
    n_layers: int = 3
    flat: bool = False

    @fnn.compact
    def __call__(self, vectors, h, dst, src, edge_attr, emask):
        if isinstance(vectors, (list, tuple)):
            vectors = jnp.stack(vectors, axis=-1)  # [N, 3, V]
        for i in range(self.n_layers):
            vectors, h = PoolingLayer(self.hidden, flat=self.flat,
                                      name=f"layer_{i}")(
                vectors, h, dst, src, edge_attr, emask
            )
        y = Linear(8 * self.hidden, name="pool0")(h)
        y = jnp.tanh(y)
        return Linear(self.out, name="pool1")(y)


class EGHN(fnn.Module):
    """Reference ``EGHN`` (``basic.py:571-736``); protein-only in the
    reference (``main_protein.py``), driven with the bond graph as local
    edges (``utils/train.py:69-79``)."""

    hidden: int = 64
    n_cluster: int = 15
    layer_per_block: int = 3
    layer_pooling: int = 4
    layer_decoder: int = 2
    flat: bool = False
    with_v: bool = True

    @fnn.compact
    def __call__(
        self,
        graph: GraphBatch,
        local_dst: jax.Array,
        local_src: jax.Array,
        local_edge_attr: jax.Array,
        local_mask: jax.Array,
    ):
        B = graph.n_graphs
        N = graph.num_nodes
        n_max = N // B
        P = self.n_cluster
        x, v = graph.coord, graph.vel
        nmaskf = graph.node_mask.astype(jnp.float32)

        h = Linear(self.hidden, name="embedding")(graph.node_feat)

        # low-level force block
        # (the reference double-embeds: EGHN's embedding then EGNN's own,
        # basic.py:586-588,623,627 — reproduced via node_feat=h)
        low = EGNN(self.hidden, self.layer_per_block, with_v=self.with_v,
                   flat=self.flat, name="low_force_net")
        new_x, new_v, h = low(graph.replace(node_feat=h))
        nf = new_x - x

        # pooling network on the local (bond) graph
        x_b = x.reshape(B, n_max, 3)
        cnt = jnp.maximum(nmaskf.reshape(B, n_max).sum(1), 1.0)
        x_mean = (x_b * nmaskf.reshape(B, n_max, 1)).sum(1) / cnt[:, None]
        x_cent = x - jnp.repeat(x_mean, n_max, axis=0)
        pool_vecs = [x_cent, nf, v]
        pooling_fea = PoolingNet(
            self.hidden, P, n_layers=self.layer_pooling, flat=self.flat,
            name="low_pooling",
        )(pool_vecs, h, local_dst, local_src, local_edge_attr, local_mask)

        s_flat = fnn.softmax(pooling_fea, axis=1) * nmaskf[:, None]  # [N, P]
        s = s_flat.reshape(B, n_max, P)
        sT = jnp.swapaxes(s, 1, 2)                                   # [B, P, n]

        count = jnp.maximum(
            jnp.einsum("bpn,bn->bp", sT, nmaskf.reshape(B, n_max)), 1e-5
        )[..., None]                                                 # [B, P, 1]

        def pool_nodes(arr):
            a = arr.reshape(B, n_max, -1)
            return jnp.einsum("bpn,bnk->bpk", sT, a) / count

        X = pool_nodes(x)                                            # [B, P, 3]
        Hc = pool_nodes(h)
        NF = pool_nodes(nf)
        Vc = pool_nodes(v) if self.with_v else None

        # pooled adjacencies (reference spmm: A @ pooling over each edge set)
        def adj_pool(dst_e, src_e, m_e):
            a = segment_sum(s_flat[src_e], dst_e, N, mask=m_e)       # [N, P]
            return jnp.einsum("bpn,bnk->bpk", sT, a.reshape(B, n_max, P))

        A_local = adj_pool(local_dst, local_src, local_mask)         # [B, P, P]
        A_global = adj_pool(graph.dst, graph.src, graph.edge_mask)
        # cut loss on the local pooled adjacency (basic.py:672,721-723)
        A_n = A_local / jnp.maximum(
            jnp.linalg.norm(A_local, axis=2, keepdims=True), 1e-12
        )
        eye = jnp.eye(P)[None]
        cut_loss = jnp.mean(
            jnp.linalg.norm((A_n - eye).reshape(B, -1), axis=1)
        )

        # dense cluster graph (complete incl. diagonal — the reference's
        # mask is computed but unused, basic.py:678)
        rows = jnp.repeat(jnp.arange(P), P)
        cols = jnp.tile(jnp.arange(P), P)
        offs = (jnp.arange(B) * P)[:, None]
        h_dst = (rows[None] + offs).reshape(-1)
        h_src = (cols[None] + offs).reshape(-1)
        h_eattr = A_global.reshape(-1, 1)
        cmask = jnp.ones(B * P * P, bool)
        cluster_graph = GraphBatch(
            node_feat=Hc.reshape(B * P, -1),
            coord=X.reshape(B * P, 3),
            vel=(Vc.reshape(B * P, 3) if self.with_v else jnp.zeros((B * P, 3))),
            node_mask=jnp.ones(B * P, bool),
            graph_id=jnp.repeat(jnp.arange(B), P),
            dst=h_dst, src=h_src, edge_attr=h_eattr, edge_mask=cmask,
            coord_target=X.reshape(B * P, 3),
            loc_mean=graph.loc_mean,
            n_graphs=B,
        )
        high = EGNN(self.hidden, self.layer_per_block, with_v=self.with_v,
                    flat=self.flat, name="high_force_net")
        h_new_x, h_new_v, h_new_h = high(cluster_graph)
        h_nf = (h_new_x - X.reshape(B * P, 3)).reshape(B, P, 3)

        # broadcast cluster quantities back to nodes
        def unpool(arr_bpk):
            return jnp.einsum("bnp,bpk->bnk", s, arr_bpk).reshape(N, -1)

        l_nf = unpool(h_nf)
        l_X = unpool(X)
        l_H = unpool(h_new_h.reshape(B, P, -1))
        vectors = [l_nf, x - l_X]
        if self.with_v:
            l_V = unpool(Vc)
            vectors.append(v - l_V)
        vectors.append(nf)

        scalars = jnp.concatenate([h, l_H], axis=-1)
        if self.layer_decoder == 1:
            l_kin, h_out = EquivariantScalarNet(
                self.hidden, norm=True, flat=self.flat, name="kinematics_net"
            )(jnp.stack(vectors, axis=-1), scalars)
        else:
            from fastegnn_tpu.models.basic import EGMN

            l_kin, h_out = EGMN(
                self.hidden, self.layer_decoder, norm=True, flat=self.flat,
                name="kinematics_net",
            )(vectors, scalars)
        _X = (X + h_nf)
        x_out = unpool(_X) + l_kin
        return x_out, h_out, cut_loss
