"""Static-shape batched geometric graphs (the PyG ``Data``/``Batch`` replacement).

The reference batches graphs by concatenating variable-length node/edge arrays
(torch_geometric loader, reference ``main_nbody.py:94-97``; consumed at
``utils/train.py:36-39``).  Dynamic shapes defeat XLA: every batch would
recompile.  Here a batch is a fixed-shape pytree — nodes and edges padded to
static capacities with explicit masks, and a ``graph_id`` segment vector for
per-graph pooling.  Everything downstream (models, losses, shard_map partitions)
is shape-static and jit-stable.

Conventions
-----------
- ``dst``/``src`` correspond to the reference's ``row``/``col`` of
  ``edge_index`` (``models/FastEGNN.py:204``): the message for edge ``e`` is
  built from ``(h[dst[e]], h[src[e]], ...)`` with relative coordinate
  ``coord[dst[e]] - coord[src[e]]`` and is aggregated at ``dst[e]``.
- Padded nodes have ``graph_id == n_graphs`` (a dump segment) and
  ``node_mask == False``.
- Padded edges have ``dst == total_node_capacity`` (an out-of-range sentinel)
  and ``edge_mask == False``: XLA segment ops drop out-of-range ids and the
  Pallas CSR kernel never matches them to a row, so padded edges self-exclude
  without a mask multiply; gathers clamp (``mode='clip'``) and the resulting
  garbage rows are masked downstream.
- Edges are sorted by ``dst`` (CSR order) by the batcher — padded edges sort
  last — so segment reductions use ``indices_are_sorted=True`` and Pallas
  kernels walk contiguous row blocks.
- ``dst_count[n]`` caches the real in-degree of node ``n`` (constant per
  batch), so per-destination means never re-scatter counts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fastegnn_tpu.ops.edge_kernel_v5 import EdgeKernelV5Meta, make_v5_meta
from fastegnn_tpu.ops.spmm import CSRMeta, make_csr_meta

# v5 keeps a [Npad, 256] node table + a resident [Npad, 128] f32 src-grad
# accumulator in VMEM (~1.5 KB/node): bound one kernel call to ~12k nodes of
# the 16 MB.  Larger batches of smaller graphs split into GRAPH GROUPS, one
# kernel call per <=12k-node run of whole graphs (edges never cross graphs),
# so the fused path covers e.g. Water-3D's 20 x 8k-node production batches.
EK5_MAX_NODES = 12288


@struct.dataclass
class GraphBatch:
    """A fixed-capacity batch of geometric graphs.

    Shapes: ``N`` = padded node capacity, ``E`` = padded edge capacity,
    ``B`` = number of graphs (static), ``C`` = virtual channels.
    """

    # --- node arrays [N, ...] ---
    node_feat: jax.Array          # [N, F]   input node features
    coord: jax.Array              # [N, 3]   positions (loc_0)
    vel: jax.Array                # [N, 3]   velocities (vel_0)
    node_mask: jax.Array          # [N]      bool, True = real node
    graph_id: jax.Array           # [N]      int32 in [0, B]; B = padding
    # --- edge arrays [E, ...] ---
    dst: jax.Array                # [E]      int32 aggregation target (ref "row")
    src: jax.Array                # [E]      int32 neighbour (ref "col")
    edge_attr: jax.Array          # [E, Fe]  edge attributes
    edge_mask: jax.Array          # [E]      bool, True = real edge
    # --- targets / auxiliaries ---
    coord_target: jax.Array       # [N, 3]   loc_t
    loc_mean: jax.Array           # [B, 3, C] virtual-node init positions
    node_attr: Optional[jax.Array] = None   # [N, Fa] (charges etc.)
    virtual_fibonacci: Optional[jax.Array] = None  # [B, 3, C] VNEGNN virtual
    # positions (fibonacci sphere, ref datasets/protein/dataset.py:176-205)
    # --- local (bond) edges for hierarchical models (EGHN; the reference
    # feeds the covalent-bond graph as pooling edges, utils/train.py:71-79) ---
    local_dst: Optional[jax.Array] = None       # [El] int32
    local_src: Optional[jax.Array] = None       # [El] int32
    local_edge_attr: Optional[jax.Array] = None  # [El, Fl]
    local_edge_mask: Optional[jax.Array] = None  # [El] bool
    dst_count: Optional[jax.Array] = None   # [N] real in-degree per node
    # --- Pallas SpMM acceleration tables (host-precomputed; see ops/spmm) ---
    csr_dst: Optional[CSRMeta] = None       # CSR blocks over dst-sorted edges
    csr_src: Optional[CSRMeta] = None       # CSR blocks over src-sorted edges
    src_perm: Optional[jax.Array] = None    # [E] permutation sorting by src
    src_sorted: Optional[jax.Array] = None  # [E] = src[src_perm]
    # --- feature-major fused-kernel slot layout (ops/edge_kernel_v5.py);
    # one meta when total capacity fits a single kernel call ---
    ek5: Optional["EdgeKernelV5Meta"] = None
    # --- graph-group meta for batches too big for one call: ONE packed
    # EdgeKernelV5Meta whose (idsx, w0, dw0, sdb) concatenate every group
    # (4 transferred leaves total); ek5_group_rows holds the STATIC
    # (row0, rows, super_off, n_super, n_blocks, n_slots, n_chunks) per
    # group (groups tile the node table, edges never cross groups) ---
    ek5_groups: Optional["EdgeKernelV5Meta"] = None
    ek5_group_rows: Optional[tuple] = struct.field(
        pytree_node=False, default=None)
    # --- static metadata ---
    n_graphs: int = struct.field(pytree_node=False, default=1)

    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.dst.shape[0]

    def nodes_per_graph(self) -> jax.Array:
        """Count of real nodes in each graph, shape [B]."""
        ones = self.node_mask.astype(jnp.float32)
        return jax.ops.segment_sum(ones, self.graph_id, num_segments=self.n_graphs + 1)[
            : self.n_graphs
        ]


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    """Static capacities for one bucket of graphs."""

    max_nodes: int
    max_edges: int
    n_graphs: int
    node_feat_dim: int = 2
    edge_attr_dim: int = 1
    node_attr_dim: int = 1
    virtual_channels: int = 3
    max_local_edges: int = 0      # capacity for bond/local edges (EGHN)
    local_edge_attr_dim: int = 2


def _np(x) -> np.ndarray:
    return np.asarray(x)


def morton_order(coord: np.ndarray, bits: int = 10) -> np.ndarray:
    """Permutation sorting nodes along a 3-D Morton (Z-order) curve.

    Spatially ordered node ids make radius-graph edges block-local, which is
    what the v3 edge kernel's window tiling exploits (few source blocks per
    destination block).  Node order is semantically free — graphs are
    permutation-invariant — so datasets/batchers may apply this freely as
    long as every per-node array and the edge endpoints are relabelled
    consistently (``pad_graph(spatial_sort=True)`` does)."""
    coord = _np(coord)
    span = np.ptp(coord, axis=0).max() + 1e-9
    q = ((coord - coord.min(axis=0)) / span * (2**bits - 1)).astype(np.uint64)
    code = np.zeros(coord.shape[0], np.uint64)
    for b in range(bits):
        for d in range(coord.shape[1]):
            code |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                coord.shape[1] * b + d
            )
    return np.argsort(code, kind="stable")


def pad_graph(
    spec: GraphSpec,
    *,
    node_feat,
    coord,
    vel,
    dst,
    src,
    edge_attr,
    coord_target,
    node_attr=None,
    local_dst=None,
    local_src=None,
    local_edge_attr=None,
    dtype=np.float32,
    spatial_sort: bool = False,
) -> dict:
    """Pad one raw graph's numpy arrays to the spec's single-graph capacities.

    Returns plain numpy dict (host side); use :func:`batch_graphs` to fuse
    several into a ``GraphBatch``.
    """
    if spatial_sort:
        perm = morton_order(coord)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(perm.size)
        node_feat, coord, vel, coord_target = (
            _np(a)[perm] for a in (node_feat, coord, vel, coord_target)
        )
        dst, src = inv[_np(dst)], inv[_np(src)]
        if node_attr is not None:
            node_attr = _np(node_attr)[perm]
        if local_dst is not None:
            local_dst, local_src = inv[_np(local_dst)], inv[_np(local_src)]

    n = _np(coord).shape[0]
    e = _np(dst).shape[0]
    if n > spec.max_nodes or e > spec.max_edges:
        raise ValueError(
            f"graph ({n} nodes, {e} edges) exceeds spec "
            f"({spec.max_nodes} nodes, {spec.max_edges} edges)"
        )

    def pad_to(arr, cap, fill=0.0):
        arr = _np(arr)
        pad_width = [(0, cap - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width, constant_values=fill)

    out = {
        "node_feat": pad_to(node_feat, spec.max_nodes).astype(dtype),
        "coord": pad_to(coord, spec.max_nodes).astype(dtype),
        "vel": pad_to(vel, spec.max_nodes).astype(dtype),
        "coord_target": pad_to(coord_target, spec.max_nodes).astype(dtype),
        "node_mask": pad_to(np.ones(n, bool), spec.max_nodes).astype(bool),
        "dst": pad_to(_np(dst).astype(np.int32), spec.max_edges),
        "src": pad_to(_np(src).astype(np.int32), spec.max_edges),
        "edge_attr": pad_to(edge_attr, spec.max_edges).astype(dtype),
        "edge_mask": pad_to(np.ones(e, bool), spec.max_edges).astype(bool),
        "n_nodes": n,
        "n_edges": e,
    }
    if node_attr is not None:
        out["node_attr"] = pad_to(node_attr, spec.max_nodes).astype(dtype)
    if local_dst is not None:
        el = _np(local_dst).shape[0]
        if el > spec.max_local_edges:
            raise ValueError(
                f"{el} local edges exceed spec capacity {spec.max_local_edges}"
            )
        cap = spec.max_local_edges
        out["local_dst"] = pad_to(_np(local_dst).astype(np.int32), cap)
        out["local_src"] = pad_to(_np(local_src).astype(np.int32), cap)
        out["local_edge_attr"] = pad_to(local_edge_attr, cap).astype(dtype)
        out["local_edge_mask"] = pad_to(np.ones(el, bool), cap).astype(bool)
        out["n_local_edges"] = el
    return out


def batch_graphs(
    graphs: Sequence[dict],
    spec: GraphSpec,
    *,
    sort_edges: bool = True,
    build_csr: bool = True,
    edge_align: int = 1024,
    csr_rows: int = 128,
    # v5 packing defaults from the on-chip sweeps (scripts/r3_sweep.py,
    # scripts/r4_sblock_time.py, scripts/kernel_time.py r5 passes, Water-3D
    # bench geometry): c128/W1/G32/D64/S8 — S8 cuts slot padding 19.3% ->
    # 9.8% at zero per-slot cost; G32 re-won the round-5 sweep after the
    # 80-col role tables shrank the streamed working set (fwd 0.38 /
    # bwd 1.13 ms/layer vs 0.46/1.17 at G16)
    ek5_chunk: int = 128,
    ek5_window: int = 1,
    ek5_super: int = 32,
    ek5_dwin: int = 64,
    ek5_sblocks: int = 8,
    # graph-group batches: Pallas-CSR metas cost ~6-8 s of host time per
    # production batch (searchsorted + argsort over 12.6M edges) and only
    # serve model variants the fused kernel cannot cover
    # (attention/normalize/tanh, hidden != 64) — enable when training one
    csr_for_groups: bool = False,
) -> GraphBatch:
    """Concatenate padded single graphs into one packed ``GraphBatch``.

    Equivalent role to torch_geometric's ``Batch.from_data_list`` (node index
    offsetting + ``batch`` vector) but emits static shapes:
    total capacity is ``len(graphs) * spec.max_nodes`` / ``... * max_edges``.

    Edge indices of graph ``g`` are offset by ``g * spec.max_nodes``.  If
    ``sort_edges``, edges are globally sorted by ``dst`` (stable), putting
    padded edges (dst forced to 0 but masked) first; masking keeps this exact.
    """
    b = len(graphs)
    if b != spec.n_graphs:
        raise ValueError(f"got {b} graphs for spec with n_graphs={spec.n_graphs}")

    def cat(key, fill_missing=None):
        arrs = []
        for g in graphs:
            if key not in g and fill_missing is not None:
                arrs.append(fill_missing)
            else:
                arrs.append(g[key])
        return np.concatenate(arrs, axis=0)

    node_feat = cat("node_feat")
    coord = cat("coord")
    vel = cat("vel")
    coord_target = cat("coord_target")
    node_mask = cat("node_mask")
    edge_attr = cat("edge_attr")
    edge_mask = cat("edge_mask")

    # graph_id: real nodes -> g, padded nodes -> b (dump segment)
    graph_id = np.concatenate(
        [
            np.where(g["node_mask"], np.int32(i), np.int32(b))
            for i, g in enumerate(graphs)
        ]
    ).astype(np.int32)

    total_nodes = b * spec.max_nodes
    dst = np.concatenate(
        [
            # padded edges -> out-of-range sentinel (sorts last; dropped by
            # segment ops; never matches a Pallas row block)
            np.where(g["edge_mask"], g["dst"] + i * spec.max_nodes, total_nodes)
            for i, g in enumerate(graphs)
        ]
    ).astype(np.int32)
    src = np.concatenate(
        [
            np.where(g["edge_mask"], g["src"] + i * spec.max_nodes, 0)
            for i, g in enumerate(graphs)
        ]
    ).astype(np.int32)

    if sort_edges:
        from fastegnn_tpu import native

        # stable counting sort by dst (keys bounded by total_nodes+1):
        # ~6x faster than np.argsort at Water-3D scale
        order = native.counting_argsort(dst, total_nodes + 1)
        dst, src = dst[order], src[order]
        edge_attr, edge_mask = edge_attr[order], edge_mask[order]

    # align total edge capacity to the Pallas chunk size so kernel DMA needs
    # no extra copies; extra sentinel edges sort last and self-exclude
    e_total = dst.shape[0]
    e_aligned = ((e_total + edge_align - 1) // edge_align) * edge_align
    if e_aligned != e_total:
        extra = e_aligned - e_total
        dst = np.concatenate([dst, np.full(extra, total_nodes, np.int32)])
        src = np.concatenate([src, np.zeros(extra, np.int32)])
        edge_attr = np.concatenate(
            [edge_attr, np.zeros((extra, edge_attr.shape[1]), edge_attr.dtype)]
        )
        edge_mask = np.concatenate([edge_mask, np.zeros(extra, bool)])

    dst_count = np.bincount(
        dst[edge_mask], minlength=total_nodes + 1
    )[:total_nodes].astype(np.float32)

    csr_dst = csr_src = src_perm = src_sorted = None
    ek5 = ek5_groups = ek5_group_rows = None
    if build_csr and sort_edges:
        ek5_kw = dict(chunk=ek5_chunk, W=ek5_window, G=ek5_super,
                      D=ek5_dwin, S=ek5_sblocks)
        if total_nodes <= EK5_MAX_NODES and edge_attr.shape[1] <= 3:
            ek5 = make_v5_meta(
                dst, src, edge_attr, edge_mask, total_nodes, **ek5_kw)
        elif spec.max_nodes <= EK5_MAX_NODES and edge_attr.shape[1] <= 3:
            # graph groups: runs of whole graphs, each <= EK5_MAX_NODES
            # node rows; one fused kernel call per group (edges are always
            # intra-graph, so groups partition the edge set exactly)
            gper = max(EK5_MAX_NODES // spec.max_nodes, 1)
            # edges are dst-sorted with padded edges (dst = capacity)
            # last, so each group's edge run is ONE contiguous slice —
            # searchsorted instead of 20 boolean passes over 12.6M edges
            # (~12 s/production-batch in the round-5 host profile)
            rows_list = []
            bounds = []
            for g0 in range(0, b, gper):
                row0 = g0 * spec.max_nodes
                rows = min(gper, b - g0) * spec.max_nodes
                # dtype-matched keys: a python-int key promotes the whole
                # 12.6M-element array to int64 per call (~76 ms each)
                lo = int(np.searchsorted(dst, dst.dtype.type(row0)))
                hi = int(np.searchsorted(dst, dst.dtype.type(row0 + rows)))
                bounds.append((g0, row0, rows, lo, hi))
                rows_list.append((row0, rows))

            # when each group is ONE graph (production Water-3D: 8k nodes
            # per graph), its meta is independent of batch composition —
            # cache it on the graph dict so reshuffled epochs re-pack
            # nothing (packing dominates steady-state collation otherwise)
            ck = ("_ek5cache", ek5_chunk, ek5_window, ek5_super, ek5_dwin,
                  ek5_sblocks)

            def _mk(args):
                g0, row0, rows, lo, hi = args
                if gper == 1 and ck in graphs[g0]:
                    return graphs[g0][ck]
                m = make_v5_meta(
                    dst[lo:hi] - row0, src[lo:hi] - row0,
                    edge_attr[lo:hi], np.ones(hi - lo, bool), rows,
                    as_numpy=True, **ek5_kw)
                if gper == 1:
                    graphs[g0][ck] = m
                return m

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=4) as pool:
                groups = list(pool.map(_mk, bounds))
            # PACK the per-group metas into one (idsx, w0, dw0, sdb)
            # quadruple — 4 transferred leaves instead of 4 per group (the
            # ~100-leaf production batch cost ~15% wall in host dispatch
            # through the tunnel, docs/PERF.md round 4); groups address
            # their slice via the static super_off in ek5_group_rows
            import jax.numpy as _jnp

            descs, off = [], 0
            for m, (row0, rows) in zip(groups, rows_list):
                descs.append((row0, rows, off, m.n_super, m.n_blocks,
                              m.n_slots, m.n_chunks))
                off += m.n_super
            ek5_groups = groups[0].replace(
                idsx=_jnp.asarray(np.concatenate(
                    [np.asarray(m.idsx) for m in groups], axis=1)),
                w0=_jnp.asarray(np.concatenate(
                    [np.asarray(m.w0) for m in groups])),
                dw0=_jnp.asarray(np.concatenate(
                    [np.asarray(m.dw0) for m in groups])),
                sdb=_jnp.asarray(np.concatenate(
                    [np.asarray(m.sdb) for m in groups])),
                n_super=0, n_blocks=0, n_slots=0, n_chunks=0)
            ek5_group_rows = tuple(descs)
        if ek5 is None and (ek5_groups is None or csr_for_groups):
            # Pallas-CSR gather/scatter: the fallback for single graphs
            # beyond the v5 VMEM envelope and for layer variants the fused
            # kernel doesn't cover (attention/normalize/tanh, hidden != 64).
            # For graph-group batches it is opt-in (``csr_for_groups``):
            # at production scale the CSR build costs ~6-8 s of host time
            # per batch and the fused path never reads it.
            csr_dst = make_csr_meta(dst, total_nodes, rows=csr_rows,
                                    chunk=edge_align)
            perm = np.argsort(
                np.where(edge_mask, src, total_nodes), kind="stable"
            ).astype(np.int32)
            ssorted = np.where(edge_mask, src, total_nodes)[perm].astype(
                np.int32)
            csr_src = make_csr_meta(ssorted, total_nodes, rows=csr_rows,
                                    chunk=edge_align)
            src_perm = jnp.asarray(perm)
            src_sorted = jnp.asarray(ssorted)

    # Virtual-node init: per-graph mean of real coords, repeated across C
    # channels (reference datasets/nbody/dataset.py:96).
    c = spec.virtual_channels
    means = []
    for g in graphs:
        m = g["coord"][: g["n_nodes"]].mean(axis=0) if g["n_nodes"] else np.zeros(3)
        means.append(np.repeat(m[:, None], c, axis=1))
    loc_mean = np.stack(means).astype(np.float32)  # [B, 3, C]

    node_attr = None
    if all("node_attr" in g for g in graphs):
        node_attr = jnp.asarray(cat("node_attr"))

    local_dst = local_src = local_attr = local_mask = None
    if all("local_dst" in g for g in graphs):
        # local (bond) edges: offset per graph slot like the main edges;
        # masked slots point at node 0 but are excluded via local_edge_mask
        local_dst = jnp.asarray(
            np.concatenate(
                [
                    np.where(g["local_edge_mask"], g["local_dst"] + i * spec.max_nodes, 0)
                    for i, g in enumerate(graphs)
                ]
            ).astype(np.int32)
        )
        local_src = jnp.asarray(
            np.concatenate(
                [
                    np.where(g["local_edge_mask"], g["local_src"] + i * spec.max_nodes, 0)
                    for i, g in enumerate(graphs)
                ]
            ).astype(np.int32)
        )
        local_attr = jnp.asarray(cat("local_edge_attr"))
        local_mask = jnp.asarray(cat("local_edge_mask"))

    return GraphBatch(
        node_feat=jnp.asarray(node_feat),
        coord=jnp.asarray(coord),
        vel=jnp.asarray(vel),
        node_mask=jnp.asarray(node_mask),
        graph_id=jnp.asarray(graph_id),
        dst=jnp.asarray(dst),
        src=jnp.asarray(src),
        edge_attr=jnp.asarray(edge_attr),
        edge_mask=jnp.asarray(edge_mask),
        coord_target=jnp.asarray(coord_target),
        loc_mean=jnp.asarray(loc_mean),
        node_attr=node_attr,
        local_dst=local_dst,
        local_src=local_src,
        local_edge_attr=local_attr,
        local_edge_mask=local_mask,
        dst_count=jnp.asarray(dst_count),
        csr_dst=csr_dst,
        csr_src=csr_src,
        src_perm=src_perm,
        src_sorted=src_sorted,
        ek5=ek5,
        ek5_groups=ek5_groups,
        ek5_group_rows=ek5_group_rows,
        n_graphs=b,
    )
