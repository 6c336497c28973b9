"""Ablation of the v4 kernel's per-chunk costs (chunk=1024, W=2).

Variants strip one piece each; the deltas localize the bottleneck:
  full      — as lab4
  nocmp     — Pd/Ps hoisted constants (no iota/compare/astype per chunk)
  nosilu    — sigmoid chain replaced by *0.5
  nofold    — window stack + w1s fold hoisted (dst slice reused)
  nodma     — DMA start/wait removed (buffers hold garbage)
  noea      — ea read removed from P assembly
  nocat     — P is Pd only (K=128; T shrunk) — isolates the big concat
  floor     — all of the above: bare matmul skeleton
"""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPAD = 8192
NBLK = NPAD // 128
H = 64
CHUNK = 1024
W = 2
FE = 2


def _sync(r):
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))


def bench(fn, label, n=30):
    try:
        r = fn()
        _sync(r)
    except Exception:
        print(f"{label}: FAIL")
        print(traceback.format_exc()[-1500:])
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _sync(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<40s} {dt:9.3f} ms")
    return dt


def build(cmp=True, silu=True, fold=True, dma=True, ea=True, cat=True):
    nchunks_per_blk = max(1, round(688128 / NBLK / CHUNK))
    rng = np.random.default_rng(11)
    n_chunks = NBLK * nchunks_per_blk
    n_slots = n_chunks * CHUNK
    cnum = np.full(NBLK, nchunks_per_blk, np.int32)
    cstart = (np.arange(NBLK) * nchunks_per_blk).astype(np.int32)
    db_of_chunk = np.repeat(np.arange(NBLK), nchunks_per_blk)
    win = ((db_of_chunk[:, None] + rng.integers(-8, 9, (n_chunks, W)))
           % NBLK).astype(np.int32)
    dstloc = rng.integers(0, 128, n_slots).astype(np.int32)
    gid = rng.integers(0, W * 128, n_slots).astype(np.int32)
    ids = np.stack([dstloc, gid]).astype(np.int32)
    eattr = (rng.normal(size=(8, n_slots)) * 0.1).astype(np.float32)
    tab = (rng.normal(size=(NPAD, 128)) * 0.2).astype(np.float32)
    wp = (rng.normal(size=(256, H)) * 0.2).astype(np.float32)
    vp = (rng.normal(size=(H, 8)) * 0.1).astype(np.float32)

    KW = 128 + (W * 128 if cat else 0)
    K = KW + 8

    def kernel(cstart_ref, cnum_ref, win_ref, wp_ref, vp_ref, tab_ref,
               ids_hbm, ea_hbm, out_ref, ids_buf, ea_buf, sems):
        b = pl.program_id(0)
        c0 = cstart_ref[b]
        nc = cnum_ref[b]

        def dma_(c, slot):
            s = pl.multiple_of((c0 + c) * CHUNK, CHUNK)
            return (
                pltpu.make_async_copy(ids_hbm.at[:, pl.ds(s, CHUNK)],
                                      ids_buf.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(ea_hbm.at[:, pl.ds(s, CHUNK)],
                                      ea_buf.at[slot], sems.at[1, slot]),
            )

        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(nc > 0)
        def _():
            if dma:
                for d in dma_(0, 0):
                    d.start()
            wp = wp_ref[:]
            w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]
            w2, wg1 = wp[2 * H : 3 * H, :], wp[3 * H : 4 * H, :]
            vp = vp_ref[:]
            w1r = vp[:, 0:1]
            w1e = vp[:, 2 : 2 + FE].astype(jnp.bfloat16)
            b1 = vp[:, 5:6]
            db = b * 128
            slice_d = tab_ref[pl.ds(db, 128), :]
            w1dT = jax.lax.dot_general(
                w1d, slice_d[:, 0:H], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            xdT = slice_d[:, H : H + 6]

            iota_d = jax.lax.broadcasted_iota(jnp.int32, (128, CHUNK), 0)
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (W * 128, CHUNK), 0)
            Pd_c = (iota_d == 3).astype(jnp.bfloat16)
            Ps_c = (iota_s == 7).astype(jnp.bfloat16)
            if not fold:
                stacked_c = jnp.concatenate([slice_d, slice_d], axis=0)
                w1sT_c = jax.lax.dot_general(
                    w1s, stacked_c[:, 0:H], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)

            def body(c, acc):
                slot = c % 2
                if dma:
                    @pl.when(c + 1 < nc)
                    def _():
                        for d in dma_(c + 1, (c + 1) % 2):
                            d.start()

                    for d in dma_(c, slot):
                        d.wait()
                if fold:
                    wparts = [
                        tab_ref[pl.ds(win_ref[c0 + c, k] * 128, 128), :]
                        for k in range(W)
                    ]
                    stacked = jnp.concatenate(wparts, axis=0)
                    w1sT = jax.lax.dot_general(
                        w1s, stacked[:, 0:H], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(jnp.bfloat16)
                else:
                    stacked = stacked_c
                    w1sT = w1sT_c
                xwT = stacked[:, H : H + 6]

                if cmp:
                    dl = ids_buf[slot][0:1, :]
                    gl = ids_buf[slot][1:2, :]
                    Pd = (iota_d == dl).astype(jnp.bfloat16)
                    Ps = (iota_s == gl).astype(jnp.bfloat16)
                else:
                    Pd, Ps = Pd_c, Ps_c

                parts_T = [w1dT]
                parts_P = [Pd]
                if cat:
                    parts_T.append(w1sT)
                    parts_P.append(Ps)
                parts_T += [w1e, b1.astype(jnp.bfloat16),
                            jnp.zeros((H, 5), jnp.bfloat16)]
                if ea:
                    ea_t = ea_buf[slot][0:FE, :].astype(jnp.bfloat16)
                else:
                    ea_t = jnp.zeros((FE, CHUNK), jnp.bfloat16)
                parts_P += [ea_t, jnp.ones((1, CHUNK), jnp.bfloat16),
                            jnp.zeros((5, CHUNK), jnp.bfloat16)]
                T = jnp.concatenate(parts_T, axis=1)
                P = jnp.concatenate(parts_P, axis=0)

                big = jax.lax.dot_general(
                    T, P, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xd6 = jax.lax.dot_general(
                    xdT, Pd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                xw6 = jax.lax.dot_general(
                    xwT, Ps, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                diff = (xd6[0:3] + xd6[3:6]) - (xw6[0:3] + xw6[3:6])
                radial = jnp.sum(diff * diff, axis=0, keepdims=True)
                z1 = big[0:H] + w1r * radial

                def act(z):
                    return z * (jax.nn.sigmoid(z) if silu else 0.5)

                a1 = act(z1).astype(jnp.bfloat16)
                z2 = jax.lax.dot_general(
                    w2, a1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + vp[:, 6:7]
                m = act(z2).astype(jnp.bfloat16)
                zg = jax.lax.dot_general(
                    wg1, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + vp[:, 7:8]
                g1 = act(zg)
                gate = jnp.sum(vp[:, 1:2] * g1, axis=0, keepdims=True)
                trans = diff * gate
                t_hi = trans.astype(jnp.bfloat16)
                t_lo = (trans - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                scat_in = jnp.concatenate([m, t_hi, t_lo], axis=0)
                scat = jax.lax.dot_general(
                    scat_in, Pd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc + scat

            acc = jax.lax.fori_loop(
                0, nc, body, jnp.zeros((70, 128), jnp.float32)
            )
            out_ref[0:70, :] = acc

    args = tuple(map(jnp.asarray, (
        cstart, cnum, win, wp.astype(np.float32), vp, tab, ids, eattr
    )))
    args = (args[0], args[1], args[2], args[3].astype(jnp.bfloat16),
            args[4], args[5].astype(jnp.bfloat16), args[6], args[7])

    @jax.jit
    def run(*a):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (70, 128), lambda i, *_: (0, i), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 2, CHUNK), jnp.int32),
                    pltpu.VMEM((2, 8, CHUNK), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((70, NPAD), jnp.float32),
        )(*a)

    return (lambda: run(*args)), n_chunks


VARIANTS = {
    "full": {},
    "nocmp": dict(cmp=False),
    "nosilu": dict(silu=False),
    "nofold": dict(fold=False),
    "nodma": dict(dma=False),
    "noea": dict(ea=False),
    "nocat": dict(cat=False),
    "floor": dict(cmp=False, silu=False, fold=False, dma=False, ea=False,
                  cat=False),
}

if __name__ == "__main__":
    print("backend:", jax.default_backend())
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        call, n_chunks = build(**VARIANTS[name])
        dt = bench(call, f"v5 {name} ({n_chunks} chunks x {CHUNK})")
        if dt:
            print(f"    {dt/n_chunks*1e3:.3f} us/chunk")
