"""Graph construction: top-k cutoff edges and radius graphs.

Host-side (numpy/scipy) builders match the reference dataset semantics:

- ``cutoff_edges_np``: complete graph minus self loops, keep the
  ``(1 - cutoff_rate)`` fraction of *shortest* edges by pairwise distance
  (reference ``datasets/nbody/dataset.py:102-113``).
- ``radius_graph_np``: all ordered pairs within radius ``r`` (both
  directions, no self loops) — PyG ``radius_graph`` with unbounded
  neighbour count (reference ``datasets/simulation/dataset.py:80``),
  implemented with a scipy cKDTree (C kernel) instead of CUDA.
- ``sort_cutoff_np``: keep the shortest fraction of an existing edge list
  (reference ``datasets/simulation/dataset.py:96-101``).

``cutoff_edges_topk`` is the on-device JAX variant (static shapes) used by
synthetic benchmarks and on-device pipelines.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cutoff_edges_np(loc: np.ndarray, cutoff_rate: float) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k shortest directed edges of the complete graph.

    Returns ``(dst, src)`` int32 arrays of length
    ``int(n*(n-1)*(1-cutoff_rate))``.  Ordering follows ascending distance
    (ties broken by flattened index), matching the reference's
    ``torch.topk(largest=False)`` over the flattened distance matrix with the
    diagonal masked by +1e18 (``datasets/nbody/dataset.py:102-113``).
    """
    loc = np.asarray(loc, np.float64)
    n = loc.shape[0]
    diff = loc[:, None, :] - loc[None, :, :]
    dist = np.sqrt((diff**2).sum(-1))
    dist[np.diag_indices(n)] = 1e18
    k = int(n * (n - 1) * (1.0 - cutoff_rate))
    flat = dist.reshape(-1)
    idx = np.argpartition(flat, k - 1)[:k] if k < flat.size else np.arange(flat.size)
    idx = idx[np.argsort(flat[idx], kind="stable")]
    dst = (idx // n).astype(np.int32)
    src = (idx % n).astype(np.int32)
    return dst, src


def radius_graph(loc: np.ndarray, r: float) -> Tuple[np.ndarray, np.ndarray]:
    """All ordered pairs strictly within radius ``r`` — native cell-list C++
    kernel (fastegnn_tpu.native) with KD-tree fallback."""
    from fastegnn_tpu import native

    return native.radius_graph(loc, r)


def radius_graph_np(loc: np.ndarray, r: float) -> Tuple[np.ndarray, np.ndarray]:
    """All ordered pairs strictly within radius ``r`` (no self loops).

    Uses scipy's cKDTree (C implementation) — the host-native replacement for
    torch_cluster's CUDA neighbour search.  Returns ``(dst, src)`` with both
    directions of every pair present.
    """
    from scipy.spatial import cKDTree

    loc = np.asarray(loc, np.float64)
    tree = cKDTree(loc)
    pairs = tree.query_pairs(r, output_type="ndarray")  # [P, 2], i < j
    if pairs.size == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    a, b = pairs[:, 0], pairs[:, 1]
    dst = np.concatenate([a, b]).astype(np.int32)
    src = np.concatenate([b, a]).astype(np.int32)
    return dst, src


def sort_cutoff_np(
    dst: np.ndarray, src: np.ndarray, loc: np.ndarray, cutoff_rate: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep the shortest ``(1-cutoff_rate)`` fraction of the given edges
    (reference ``datasets/simulation/dataset.py:96-101``)."""
    d = np.linalg.norm(loc[dst] - loc[src], axis=1)
    order = np.argsort(d, kind="stable")
    keep = order[: int(order.size * (1.0 - cutoff_rate))]
    return dst[keep].astype(np.int32), src[keep].astype(np.int32)


def cutoff_edges_topk(loc: jax.Array, num_edges: int) -> Tuple[jax.Array, jax.Array]:
    """On-device top-k shortest complete-graph edges (static edge count).

    JAX analogue of :func:`cutoff_edges_np` for jit-compiled pipelines and
    benchmarks; ``num_edges`` must be static.
    """
    n = loc.shape[0]
    diff = loc[:, None, :] - loc[None, :, :]
    dist2 = (diff**2).sum(-1)
    dist2 = dist2 + jnp.eye(n, dtype=loc.dtype) * jnp.asarray(1e18, loc.dtype)
    neg, idx = jax.lax.top_k(-dist2.reshape(-1), num_edges)
    dst = (idx // n).astype(jnp.int32)
    src = (idx % n).astype(jnp.int32)
    return dst, src
