"""Tracing / profiling utilities.

The reference's profiling story is an inert ``@profile`` decorator plus
wall-clock bookkeeping (SURVEY.md §5).  Here: a ``jax.profiler`` trace
context (view in TensorBoard / Perfetto) and an honest step timer that
syncs with a device-to-host readback — required because
``jax.block_until_ready`` does not block through tunneled TPU backends.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(log_dir: str, *, host_tracer_level: int = 2):
    """Capture a jax.profiler trace of the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Amortized step timing with readback-based synchronization.

    Usage::

        timer = StepTimer()
        timer.sync(any_device_array)      # start boundary
        for _ in range(n): out = step(...)
        dt = timer.lap(out_leaf, n)       # seconds per step
    """

    def __init__(self):
        self._t0: Optional[float] = None

    @staticmethod
    def _readback(x) -> float:
        return float(jnp.sum(jnp.ravel(x)[:8]))

    def sync(self, x) -> None:
        self._readback(x)
        self._t0 = time.perf_counter()

    def lap(self, x, iters: int = 1) -> float:
        assert self._t0 is not None, "call sync() first"
        self._readback(x)
        dt = (time.perf_counter() - self._t0) / max(iters, 1)
        self._t0 = time.perf_counter()
        return dt
