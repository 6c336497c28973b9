"""Device mesh helpers.

The canonical mesh for this framework is 2D: ``("data", "graph")`` —
data parallelism over independent graphs, and graph parallelism (the GNN
analogue of sequence/context parallelism, SURVEY.md §5) partitioning the
edges/nodes of large graphs within a data replica.  All-new design: the
reference is single-device (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Tuple[int, ...] = (-1,),
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over ``devices`` (default: all).  One axis may be -1."""
    devices = list(devices if devices is not None else jax.devices())
    sizes = list(axis_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, axis_names)
