"""Host-side batch sharding for mesh training (CLI ``--mesh`` path).

Turns a :class:`~fastegnn_tpu.data.batcher.GraphDataset` into stacked,
mesh-placed GraphBatch pytrees:

- ``data`` axis (D): the global batch of ``batch_size`` graphs is split into
  D contiguous sub-batches of ``batch_size / D`` graphs — the global
  training math (loss = mean over graphs, grad = pmean over shards) matches
  the single-device step on the same global batch.
- ``graph`` axis (G): each sub-batch's *edges* are partitioned into G
  contiguous dst-sorted slices (:func:`shard_graph_batch`); node state is
  replicated and the model (built with ``shard_axis="graph"``) keeps
  exactness with reduce-scatter / psum / all-gather (models/fast_egnn.py).

The reference has no distributed trainer to mirror (SURVEY.md §2c) — this
is new capability, designed TPU-first around ``jax.sharding``.

Note: the fused edge-kernel slot metas (ek/ek3/ek5) have data-dependent
sizes, so they cannot be stacked across shards; the mesh path clears them
and runs the Pallas-CSR (or plain segment) edge path per shard.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastegnn_tpu.graph import GraphBatch
from fastegnn_tpu.parallel.graph_parallel import shard_graph_batch


def _strip_slot_metas(batch: GraphBatch) -> GraphBatch:
    return dataclasses.replace(
        batch, ek5=None, ek5_groups=None, ek5_group_rows=None)


def shard_batch(
    dataset,
    indices: np.ndarray,
    mesh: Mesh,
    data: int,
    graph: int,
) -> GraphBatch:
    """Collate ``indices`` into a [D?, G?, ...]-stacked, mesh-placed batch."""
    D, G = data, graph
    if len(indices) % max(D, 1):
        raise ValueError(
            f"batch size {len(indices)} not divisible by data axis {D}")
    per = len(indices) // D
    subs = [
        _strip_slot_metas(dataset.collate(list(indices[d * per:(d + 1) * per])))
        for d in range(D)
    ]
    if G > 1:
        subs = [shard_graph_batch(b, G) for b in subs]   # leaves [G, ...]
    stacked = (
        jax.tree.map(lambda *xs: jnp.stack(xs), *subs) if D > 1 else subs[0]
    )
    axes = []
    if D > 1:
        axes.append("data")
    if G > 1:
        axes.append("graph")
    if not axes:
        return stacked
    sharding = NamedSharding(mesh, P(*axes))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        stacked,
    )


def iter_sharded_batches(
    dataset,
    batch_size: int,
    mesh: Mesh,
    data: int = 1,
    graph: int = 1,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = True,
) -> Iterator[GraphBatch]:
    """Yield mesh-placed batches; global batch semantics match
    ``dataset.iter_batches(batch_size)`` (shuffle + drop_last)."""
    order = np.arange(len(dataset))
    if rng is not None:
        rng.shuffle(order)
    n = len(order)
    end = n - (n % batch_size) if drop_last else n
    for lo in range(0, end, batch_size):
        idx = order[lo:lo + batch_size]
        if drop_last and idx.size < batch_size:
            continue
        yield shard_batch(dataset, idx, mesh, data, graph)
