"""Host-side dataset->GraphBatch streaming (the DataLoader replacement).

The reference relies on torch_geometric's loader to concatenate graphs and
offset edge indices per batch (``main_nbody.py:94-97``).  Here a dataset is a
list of *pre-padded* single-graph dicts (see :func:`fastegnn_tpu.graph.pad_graph`)
plus a per-graph :class:`GraphSpec`; batching stacks ``batch_size`` of them
into one static-shape :class:`GraphBatch`.  Batch shapes depend only on
``(spec, batch_size)``, so jitted steps compile once.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from fastegnn_tpu.graph import GraphBatch, GraphSpec, batch_graphs


class GraphDataset:
    """A sequence of padded graphs with a shared per-graph spec."""

    def __init__(self, graphs: Sequence[dict], spec: GraphSpec):
        if spec.n_graphs != 1:
            raise ValueError("per-graph spec must have n_graphs=1")
        self.graphs: List[dict] = list(graphs)
        self.spec = spec
        self._collate_cache: Optional[dict] = None

    def enable_collate_cache(self) -> None:
        """Memoize collated batches by index tuple.  Use for eval datasets,
        whose (unshuffled) batches repeat every eval epoch — saves the
        host-side CSR/slot-table rebuild (~10 ms/batch)."""
        self._collate_cache = {}

    def __len__(self) -> int:
        return len(self.graphs)

    def batch_spec(self, batch_size: int) -> GraphSpec:
        return dataclasses.replace(self.spec, n_graphs=batch_size)

    def collate(self, indices: Sequence[int]) -> GraphBatch:
        key = tuple(indices) if self._collate_cache is not None else None
        if key is not None and key in self._collate_cache:
            return self._collate_cache[key]
        spec = self.batch_spec(len(indices))
        out = batch_graphs([self.graphs[i] for i in indices], spec)
        if key is not None:
            self._collate_cache[key] = out
        return out

    def iter_batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        drop_last: bool = True,
        prefetch: int = 2,
    ) -> Iterator[GraphBatch]:
        """Yield batches; shuffled when ``rng`` is given.  ``drop_last``
        mirrors the reference loaders (``main_nbody.py:94``).

        ``prefetch`` > 0 collates up to that many batches ahead in a
        background thread so the host-side slot-table build (~10-30 ms for
        Water-3D-scale graphs) overlaps the device step instead of
        serializing with it (the reference gets this from torch
        DataLoader workers)."""
        order = np.arange(len(self.graphs))
        if rng is not None:
            rng.shuffle(order)
        n = len(order)
        end = n - (n % batch_size) if drop_last else n
        index_lists = [
            order[lo:lo + batch_size]
            for lo in range(0, end, batch_size)
            if not (end - lo < batch_size and drop_last)
        ]
        if prefetch <= 0 or len(index_lists) <= 1:
            for idx in index_lists:
                yield self.collate(idx)
            return
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(prefetch, 4)) as pool:
            pending = [
                pool.submit(self.collate, idx)
                for idx in index_lists[:prefetch]
            ]
            nxt = prefetch
            while pending:
                fut = pending.pop(0)
                if nxt < len(index_lists):
                    pending.append(
                        pool.submit(self.collate, index_lists[nxt]))
                    nxt += 1
                yield fut.result()

    def num_batches(self, batch_size: int, drop_last: bool = True) -> int:
        n = len(self.graphs)
        return n // batch_size if drop_last else -(-n // batch_size)
