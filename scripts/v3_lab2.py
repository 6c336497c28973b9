"""Debug the v3 accumulate-at-dynamic-sublane-offset pattern + realistic
pipelined timing shaped like the v2 kernel (no serializing VPU reductions).
"""

import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPAD = 8192
CH = 1024
NT = 16


def try_run(label, fn):
    try:
        r = fn()
        return r
    except Exception as e:
        print(f"{label}: FAIL")
        tb = traceback.format_exc()
        print(tb[-3000:])
        return None


# --- variant A: accumulate via read-modify-write on out_ref (probe1 repro) ---
def variant(label, body_fn, grid=1):
    def kernel(off_ref, p_ref, m_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(t, _):
            body_fn(off_ref, p_ref, m_ref, out_ref, t)
            return 0

        jax.lax.fori_loop(0, NT, body, 0)

    rng = np.random.default_rng(0)
    off = jnp.asarray(rng.integers(0, NPAD // 128, NT), jnp.int32)
    p = jnp.asarray(rng.normal(size=(NT, 128, CH)), jnp.bfloat16)
    m = jnp.asarray(rng.normal(size=(NT, 72, CH)), jnp.bfloat16)

    @jax.jit
    def run(off, p, m):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NPAD, 128), jnp.float32),
        )(off, p, m)

    out = try_run(label, lambda: np.asarray(run(off, p, m)))
    if out is None:
        return
    ref = np.zeros((NPAD, 128), np.float32)
    pn = np.asarray(p, np.float32)
    mn = np.asarray(m, np.float32)
    for t in range(NT):
        o = int(off[t]) * 128
        ref[o : o + 128, 0:72] += pn[t] @ mn[t].T
    ok = np.allclose(out, ref, rtol=2e-2, atol=2e-1)
    print(f"{label}: correct={ok}")


def bodyA(off_ref, p_ref, m_ref, out_ref, t):
    off = off_ref[t] * 128
    tile = jax.lax.dot_general(
        p_ref[t], m_ref[t], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [128, 72]
    cur = out_ref[pl.ds(off, 128), 0:72]
    out_ref[pl.ds(off, 128), 0:72] = cur + tile


def bodyB(off_ref, p_ref, m_ref, out_ref, t):
    # full-lane write (pad tile to 128 lanes) at dynamic sublane offset
    off = off_ref[t] * 128
    tile = jax.lax.dot_general(
        p_ref[t], m_ref[t], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tile128 = jnp.pad(tile, ((0, 0), (0, 128 - 72)))
    cur = out_ref[pl.ds(off, 128), :]
    out_ref[pl.ds(off, 128), :] = cur + tile128


def bodyC(off_ref, p_ref, m_ref, out_ref, t):
    # via pl.load / pl.store
    off = off_ref[t] * 128
    tile = jax.lax.dot_general(
        p_ref[t], m_ref[t], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tile128 = jnp.pad(tile, ((0, 0), (0, 128 - 72)))
    idx = (pl.dslice(off, 128), slice(None))
    cur = pl.load(out_ref, idx)
    pl.store(out_ref, idx, cur + tile128)


# --- realistic pipelined timing: v2-style chunk loop, independent dots,
# accumulator carries only via MXU outputs ---
def timing_kernel():
    NCHUNK = 640  # ~ one layer's chunks at 1024
    H = 64

    def kernel(doff_ref, dl_ref, sl_ref, tab_ref, wp_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(c, _):
            do = doff_ref[c] * 128
            so = doff_ref[(c * 7 + 3) % NCHUNK] * 128  # pseudo src block
            iota = jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0)
            Pd = (iota == jnp.broadcast_to(dl_ref[c, 0:1, :], (128, CH))).astype(jnp.bfloat16)
            Ps = (iota == jnp.broadcast_to(sl_ref[c, 0:1, :], (128, CH))).astype(jnp.bfloat16)
            td = tab_ref[pl.ds(do, 128), :]
            ts = tab_ref[pl.ds(so, 128), :]
            gd = jax.lax.dot_general(td, Pd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # [128, CH]
            gs = jax.lax.dot_general(ts, Ps, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            hcat = jnp.concatenate(
                [gd[0:H], gs[0:H]], axis=0
            ).astype(jnp.bfloat16)
            z1 = jax.lax.dot_general(wp_ref[0:128, :], hcat, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            a1 = (z1 * jax.nn.sigmoid(z1)).astype(jnp.bfloat16)
            z2 = jax.lax.dot_general(wp_ref[128:192, :], a1, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            m = (z2 * jax.nn.sigmoid(z2)).astype(jnp.bfloat16)
            zg = jax.lax.dot_general(wp_ref[192:256, :], m, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            g1 = (zg * jax.nn.sigmoid(zg)).astype(jnp.bfloat16)
            mt = jnp.concatenate([m, g1[0:8]], axis=0)  # [72, CH] bf16
            contrib = jax.lax.dot_general(
                Pd, mt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [128, 72]
            cur = out_ref[pl.ds(do, 128), 0:72]
            out_ref[pl.ds(do, 128), 0:72] = cur + contrib
            return 0

        jax.lax.fori_loop(0, NCHUNK, body, 0)

    rng = np.random.default_rng(3)
    doff = jnp.asarray(rng.integers(0, NPAD // 128, NCHUNK), jnp.int32)
    dl = jnp.asarray(rng.integers(0, 128, (NCHUNK, 8, CH)), jnp.int32)
    sl = jnp.asarray(rng.integers(0, 128, (NCHUNK, 8, CH)), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(NPAD, 128)) * 0.1, jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(256, 64)) * 0.1, jnp.bfloat16)

    @jax.jit
    def run(doff, dl, sl, tab, wp):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((NPAD, 128), jnp.float32),
        )(doff, dl, sl, tab, wp)

    r = try_run("timing fwd-like kernel", lambda: run(doff, dl, sl, tab, wp))
    if r is None:
        return
    float(jnp.sum(r[:8]))
    t0 = time.perf_counter()
    for _ in range(30):
        r = run(doff, dl, sl, tab, wp)
    float(jnp.sum(r[:8]))
    dt = (time.perf_counter() - t0) / 30 * 1e3
    edges = NCHUNK * CH
    print(f"fwd-like v3 kernel: {dt:.3f} ms for {NCHUNK} chunks x {CH} "
          f"({edges/(dt/1e3)/1e6:.0f} M slots/s, {dt/NCHUNK*1e3:.2f} us/chunk)")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    variant("A subslice accum 72 lanes", bodyA)
    variant("B subslice accum full-lane pad", bodyB)
    variant("C pl.load/store accum", bodyC)
    timing_kernel()
