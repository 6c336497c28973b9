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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host entry: ``jax.distributed.initialize`` with env fallbacks.

    Call once per process before any other JAX API on multi-host pods (the
    reference has no distributed path at all, SURVEY.md §2c — this is new
    capability).  On single-process setups (no coordinator configured) it is
    a no-op returning False.  Env vars honoured (standard JAX names):
    ``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``.
    """
    import os

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return False
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0")
    )
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=nproc or None,
        process_id=pid,
    )
    return True


def make_hybrid_mesh(
    dcn_axis: str = "data",
    ici_axes: Tuple[str, ...] = ("graph",),
    ici_sizes: Tuple[int, ...] = (-1,),
    n_outer: Optional[int] = None,
) -> Mesh:
    """DCN x ICI mesh for multi-host pods.

    Layout policy (the scaling-book recipe): the *outer* axis spans hosts
    over DCN and carries data parallelism (one gradient ``psum`` per step —
    latency-tolerant); the *inner* axes stay within a host/slice so the
    per-layer graph-parallel collectives (halo all_gather, pool psum) ride
    ICI.  Uses ``mesh_utils.create_hybrid_device_mesh`` when multiple
    processes exist; degenerates to a plain mesh single-process (so the
    same code path runs under the virtual-CPU dryrun).
    """
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    n_hosts = n_outer or max(n_total // max(n_local, 1), 1)
    sizes = list(ici_sizes)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        per_replica = max(n_total // n_hosts, 1)
        sizes[sizes.index(-1)] = max(per_replica // known, 1)

    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=tuple(sizes),
            dcn_mesh_shape=(n_hosts,) + (1,) * len(sizes),
        )
        return Mesh(arr, (dcn_axis,) + tuple(ici_axes))
    # single process: outer axis = "hosts-worth" groups of devices
    arr = np.asarray(jax.devices()).reshape((n_hosts, *sizes))
    return Mesh(arr, (dcn_axis,) + tuple(ici_axes))
