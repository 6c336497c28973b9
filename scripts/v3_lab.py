"""Mosaic probes for the v3 tiled block-sparse edge kernel design.

Design under test: nodes spatially sorted, edges grouped into
(dst_block, src_block) tiles of 128-node blocks; node tables and the
node-grad accumulator live whole in VMEM (node-major [Npad, 128lanes]);
per-chunk gathers/scatters are eq-one-hot matmuls; the grid is sequential
over tiles and accumulates into the VMEM accumulator via dynamic sublane
slices at 128-aligned offsets.

Probes:
 1. dynamic sublane-slice accumulate into whole-VMEM output ref
 2. dynamic sublane-slice read of a whole-VMEM input table (gather side)
 3. matmul shape throughput: the exact dots of the v3 chain
 4. end-to-end fwd microkernel per-tile loop at workload scale
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, label, n=50):
    try:
        r = fn()
        float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    except Exception as e:
        print(f"{label:<58s} FAIL: {type(e).__name__}: {str(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<58s} {dt:9.3f} ms")
    return dt


NPAD = 8192
CH = 512
NT = 64  # tiles for probes 1/2


def probe1_subslice_accum():
    """acc[off[t]*128:+128, :] += dot(P, M, (1,1)) over sequential tiles."""

    def kernel(off_ref, p_ref, m_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(t, _):
            off = off_ref[t] * 128
            tile = jax.lax.dot_general(
                p_ref[t], m_ref[t], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [128, 128]
            cur = out_ref[pl.ds(off, 128), :]
            out_ref[pl.ds(off, 128), :] = cur + tile
            return 0

        jax.lax.fori_loop(0, NT, body, 0)

    rng = np.random.default_rng(0)
    off = jnp.asarray(rng.integers(0, NPAD // 128, NT), jnp.int32)
    p = jnp.asarray(rng.normal(size=(NT, 128, CH)), jnp.bfloat16)
    m = jnp.asarray(rng.normal(size=(NT, 128, CH)), jnp.bfloat16)

    @jax.jit
    def run(off, p, m):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NPAD, 128), jnp.float32),
        )(off, p, m)

    try:
        out = np.asarray(run(off, p, m))
        ref = np.zeros((NPAD, 128), np.float32)
        pn = np.asarray(p, np.float32)
        mn = np.asarray(m, np.float32)
        for t in range(NT):
            ref[int(off[t]) * 128 : int(off[t]) * 128 + 128] += pn[t] @ mn[t].T
        ok = np.allclose(out, ref, rtol=2e-2, atol=2e-1)
        print(f"{'probe1 subslice accumulate [8192,128] f32':<58s} correct={ok}")
    except Exception as e:
        print(f"{'probe1 subslice accumulate':<58s} FAIL: {str(e)[:150]}")
        return
    timeit(lambda: run(off, p, m), "probe1 timing (64 tiles, dot+accum)")


def probe2_subslice_gather():
    """g = dot(T[off*128:+128, :], P, (0,0)) — node-major table gather."""

    def kernel(off_ref, tab_ref, p_ref, out_ref):
        def body(t, acc):
            off = off_ref[t] * 128
            tile = tab_ref[pl.ds(off, 128), :]  # [128, 128] bf16
            g = jax.lax.dot_general(
                tile, p_ref[t], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [128 feat, CH]
            return acc + jnp.sum(g, axis=1, keepdims=True)

        out_ref[:] = jax.lax.fori_loop(
            0, NT, body, jnp.zeros((128, 1), jnp.float32)
        ) + jnp.zeros((128, 128), jnp.float32)

    rng = np.random.default_rng(1)
    off = jnp.asarray(rng.integers(0, NPAD // 128, NT), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(NPAD, 128)), jnp.bfloat16)
    p = jnp.asarray(rng.normal(size=(NT, 128, CH)), jnp.bfloat16)

    @jax.jit
    def run(off, tab, p):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(off, tab, p)

    try:
        out = np.asarray(run(off, tab, p))[:, 0]
        tn = np.asarray(tab, np.float32)
        pn = np.asarray(p, np.float32)
        ref = np.zeros(128, np.float32)
        for t in range(NT):
            tile = tn[int(off[t]) * 128 : int(off[t]) * 128 + 128]
            ref += (tile.T @ pn[t]).sum(axis=1)
        ok = np.allclose(out, ref, rtol=5e-2, atol=2.0)
        print(f"{'probe2 subslice-read gather dot (0,0)':<58s} correct={ok}")
    except Exception as e:
        print(f"{'probe2 subslice-read gather':<58s} FAIL: {str(e)[:150]}")
        return
    timeit(lambda: run(off, tab, p), "probe2 timing (64 tiles)")


def _mm_probe(label, M, K, N, n_loops=256):
    """Throughput of a chained dot [M,K]@[K,N] (weight-stationary-ish)."""

    def kernel(a_ref, b_ref, out_ref):
        def body(c, acc):
            g = jax.lax.dot_general(
                a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc + jnp.sum(g, axis=1, keepdims=True)

        out_ref[:] = jax.lax.fori_loop(
            0, n_loops, body, jnp.zeros((M, 1), jnp.float32)
        ) + jnp.zeros((M, 128), jnp.float32)

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32)
        )(a, b)

    dt = timeit(lambda: run(a, b), f"probe3 {label} [{M},{K}]@[{K},{N}] x{n_loops}")
    if dt:
        fl = n_loops * 2 * M * K * N / (dt / 1e3)
        print(f"    -> {fl/1e12:.1f} TFLOP/s")


def probe4_fwd_microkernel():
    """Full fwd tile loop at workload scale: gathers + MLP + scatters.

    ~680k slots in 512-slot chunks, one tile per chunk (worst-case tile
    granularity), random 128-aligned block offsets.
    """
    NCHUNK = 1328  # ~680k slots / 512
    H = 64

    def kernel(doff_ref, soff_ref, srcl_ref, dstl_ref, tab_ref, wp_ref,
               out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        def body(c, _):
            do = doff_ref[c] * 128
            so = soff_ref[c] * 128
            td = tab_ref[pl.ds(do, 128), :]          # [128, 128] bf16
            ts = tab_ref[pl.ds(so, 128), :]
            iota = jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0)
            Pd = (iota == jnp.broadcast_to(dstl_ref[c, 0:1, :], (128, CH))).astype(jnp.bfloat16)
            Ps = (iota == jnp.broadcast_to(srcl_ref[c, 0:1, :], (128, CH))).astype(jnp.bfloat16)
            hd = jax.lax.dot_general(td, Pd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            hs = jax.lax.dot_general(ts, Ps, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            hcat = jnp.concatenate([hd[:H], hs[:H]], axis=0).astype(jnp.bfloat16)
            w1 = wp_ref[0:128, :]
            z1 = jax.lax.dot_general(w1, hcat, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            a1 = (z1 * jax.nn.sigmoid(z1)).astype(jnp.bfloat16)
            w2 = wp_ref[128:192, :]
            z2 = jax.lax.dot_general(w2, a1, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            m = (z2 * jax.nn.sigmoid(z2)).astype(jnp.bfloat16)
            wg = wp_ref[192:256, :]
            zg = jax.lax.dot_general(wg, m, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            g1 = (zg * jax.nn.sigmoid(zg)).astype(jnp.bfloat16)
            mt = jnp.concatenate(
                [m, g1[0:8]], axis=0
            )  # [72, CH] stand-in for [m | trans]
            contrib = jax.lax.dot_general(
                Pd, mt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [128, 72]
            cur = acc[pl.ds(do, 128), 0:72]
            acc[pl.ds(do, 128), 0:72] = cur + contrib
            return 0

        jax.lax.fori_loop(0, NCHUNK, body, 0)
        out_ref[:] = acc[:]

    rng = np.random.default_rng(3)
    doff = jnp.asarray(rng.integers(0, NPAD // 128, NCHUNK), jnp.int32)
    soff = jnp.asarray(rng.integers(0, NPAD // 128, NCHUNK), jnp.int32)
    srcl = jnp.asarray(rng.integers(0, 128, (NCHUNK, 8, CH)), jnp.int32)
    dstl = jnp.asarray(rng.integers(0, 128, (NCHUNK, 8, CH)), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(NPAD, 128)) * 0.1, jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(256, 64)) * 0.1, jnp.bfloat16)

    @jax.jit
    def run(doff, soff, srcl, dstl, tab, wp):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((NPAD, 128), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((NPAD, 128), jnp.float32),
        )(doff, soff, srcl, dstl, tab, wp)

    dt = timeit(lambda: run(doff, soff, srcl, dstl, tab, wp),
                f"probe4 fwd microkernel ({NCHUNK} chunks x {CH})", n=20)
    if dt:
        edges = NCHUNK * CH
        print(f"    -> {edges / (dt/1e3) / 1e6:.0f} M edges/s fwd-only")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe1_subslice_accum()
    probe2_subslice_gather()
    _mm_probe("MLP small", 64, 64, CH)
    _mm_probe("MLP wide-in", 64, 128, CH)
    _mm_probe("blockdiag gather", 128, 256, CH)
    _mm_probe("gather 128", 128, 128, CH)
    probe4_fwd_microkernel()
