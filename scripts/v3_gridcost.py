"""Grid-step overhead microbench: what does an (almost) empty Pallas grid
step cost on this chip, and what feature of the v3 launch causes it?

  bare N      — no scalar prefetch, no inputs, full-VMEM out, grid=(N,)
  prefetch N  — scalar-prefetch launch like v3, unused scalars, full-VMEM out
  blockedout N— + blocked out spec indexed by cdb[c] (v3's out pattern)
  streams N   — + the two (CHUNK,8) input streams
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 512


def timeit(fn, label, n=50):
    r = fn(); float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:8]))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<24s} {dt:8.3f} ms")
    return dt


def bare(n_steps):
    def k(out_ref):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] += 1.0

    @jax.jit
    def run():
        return pl.pallas_call(
            k,
            grid=(n_steps,),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )()

    return run


def prefetch(n_steps, blocked_out=False, streams=False):
    cdb = jnp.asarray(np.arange(n_steps) % 63, jnp.int32)
    first = jnp.ones(n_steps, jnp.int32)
    ids = jnp.zeros((n_steps * CHUNK, 8), jnp.int32)
    ea = jnp.zeros((n_steps * CHUNK, 8), jnp.float32)

    def k(cdb_ref, first_ref, *rest):
        out_ref = rest[-1]
        c = pl.program_id(0)
        if blocked_out:
            @pl.when(first_ref[c] == 1)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += 1.0
        else:
            @pl.when(c == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += 1.0

    in_specs = []
    args = []
    if streams:
        in_specs = [
            pl.BlockSpec((CHUNK, 8), lambda c, cdb, first: (c, 0)),
            pl.BlockSpec((CHUNK, 8), lambda c, cdb, first: (c, 0)),
        ]
        args = [ids, ea]
    if blocked_out:
        out_specs = pl.BlockSpec((128, 72), lambda c, cdb, first: (cdb[c], 0))
        out_shape = jax.ShapeDtypeStruct((63 * 128, 72), jnp.float32)
    else:
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((8, 128), jnp.float32)

    @jax.jit
    def run():
        return pl.pallas_call(
            k,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_steps,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
        )(cdb, first, *args)

    return run


def main():
    print("backend:", jax.default_backend())
    for n in (1204, 602, 301):
        timeit(bare(n), f"bare {n}")
    for n in (1204, 602):
        timeit(prefetch(n), f"prefetch {n}")
        timeit(prefetch(n, blocked_out=True), f"blockedout {n}")
        timeit(prefetch(n, blocked_out=True, streams=True), f"streams {n}")


if __name__ == "__main__":
    main()
