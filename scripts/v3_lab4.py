"""v4 single-big-matmul edge-kernel prototype.

Per chunk (CHUNK slots, all dst in one 128-row block, src drawn from a
per-chunk *window* of W 128-node blocks):

    P_aug [K, CHUNK] = [ Pd one-hot (128)
                         Ps window one-hot (W*128)
                         ea rows (fe)
                         ones row ]             K = 128 + W*128 + 8
    T    [70, K]     = [ w1d@tab_d | w1s@tab_w | w1e | b1     (z1 rows)
                         xd_hi     | -xw_hi    | 0   | 0      (diff rows)
                         xd_lo     | -xw_lo    | 0   | 0  ]
    big  = T @ P_aug          -> z1_lin [64], diff_hi [3], diff_lo [3]
    z1   = z1_lin + w1r * radial;  silu chain;  gate
    scat = [m; trans_hi; trans_lo] @ P_aug[0:128].T  -> [70, 128] accumulate

5 MXU launches per chunk: fold(w1s), big, z2, zg, scatter.
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
NBLK = NPAD // 128
H = 64


def _sync(r):
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))


def bench(fn, label, n=30):
    try:
        r = fn()
        _sync(r)
    except Exception:
        print(f"{label}: FAIL")
        print(traceback.format_exc()[-2000:])
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    _sync(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<52s} {dt:9.3f} ms")
    return dt


def make_meta(chunk, W, nchunks_per_blk, rng):
    n_chunks = NBLK * nchunks_per_blk
    n_slots = n_chunks * chunk
    cnum = np.full(NBLK, nchunks_per_blk, np.int32)
    cstart = (np.arange(NBLK) * nchunks_per_blk).astype(np.int32)
    db_of_chunk = np.repeat(np.arange(NBLK), nchunks_per_blk)
    win = (
        db_of_chunk[:, None] + rng.integers(-8, 9, (n_chunks, W))
    ) % NBLK                                   # [n_chunks, W] src blocks
    win = win.astype(np.int32)
    dstloc = rng.integers(0, 128, n_slots).astype(np.int32)
    gid = rng.integers(0, W * 128, n_slots).astype(np.int32)
    sent = rng.random(n_slots) < 0.06
    dstloc[sent] = -1
    gid[sent] = -1
    return cstart, cnum, win, dstloc, gid, n_chunks, n_slots


def build(chunk, W, with_dma=True, nchunks_per_blk=None, fe=2):
    # keep total slots ~688k across configs
    if nchunks_per_blk is None:
        nchunks_per_blk = max(1, round(688128 / NBLK / chunk))
    rng = np.random.default_rng(11)
    cstart, cnum, win, dstloc, gid, n_chunks, n_slots = make_meta(
        chunk, W, nchunks_per_blk, rng
    )
    KW = 128 + W * 128
    K = KW + 8
    ids = np.stack([dstloc, gid]).astype(np.int32)  # [2, n]
    ea = (rng.normal(size=(8, n_slots)) * 0.1).astype(np.float32)
    tab = (rng.normal(size=(NPAD, 128)) * 0.2).astype(np.float32)
    wp = (rng.normal(size=(256, H)) * 0.2).astype(np.float32)
    vp = (rng.normal(size=(H, 8)) * 0.1).astype(np.float32)  # w1r etc

    tab_j = jnp.asarray(tab, jnp.bfloat16)
    wp_j = jnp.asarray(wp, jnp.bfloat16)
    vp_j = jnp.asarray(vp)

    def kernel(cstart_ref, cnum_ref, win_ref, wp_ref, vp_ref, tab_ref,
               ids_hbm, ea_hbm, out_ref, ids_buf, ea_buf, sems):
        b = pl.program_id(0)
        c0 = cstart_ref[b]
        nc = cnum_ref[b]

        def dma(c, slot):
            s = pl.multiple_of((c0 + c) * chunk, chunk)
            return (
                pltpu.make_async_copy(ids_hbm.at[:, pl.ds(s, chunk)],
                                      ids_buf.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(ea_hbm.at[:, pl.ds(s, chunk)],
                                      ea_buf.at[slot], sems.at[1, slot]),
            )

        out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(nc > 0)
        def _():
            if with_dma:
                for d in dma(0, 0):
                    d.start()
            wp = wp_ref[:]
            w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]
            w2, wg1 = wp[2 * H : 3 * H, :], wp[3 * H : 4 * H, :]
            vp = vp_ref[:]
            w1r = vp[:, 0:1]
            w1e = vp[:, 2 : 2 + fe].astype(jnp.bfloat16)
            b1 = vp[:, 5:6]
            db = b * 128
            slice_d = tab_ref[pl.ds(db, 128), :]          # [128n, 128f]
            w1dT = jax.lax.dot_general(
                w1d, slice_d[:, 0:H], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)                         # [64, 128]
            xdT = slice_d[:, H : H + 6]                    # [128, 6] hi|lo

            def body(c, acc):
                slot = c % 2
                if with_dma:
                    @pl.when(c + 1 < nc)
                    def _():
                        for d in dma(c + 1, (c + 1) % 2):
                            d.start()

                    for d in dma(c, slot):
                        d.wait()
                dl = ids_buf[slot][0:1, :]                 # [1, CHUNK]
                gl = ids_buf[slot][1:2, :]
                # window table: W subslices stacked [W*128, 128]
                wparts = [
                    tab_ref[pl.ds(win_ref[c0 + c, k] * 128, 128), :]
                    for k in range(W)
                ]
                stacked = jnp.concatenate(wparts, axis=0)  # [W*128, 128]
                w1sT = jax.lax.dot_general(
                    w1s, stacked[:, 0:H], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)                     # [64, W*128]
                xwT = stacked[:, H : H + 6]                # [W*128, 6]

                # T [64, K]: z1 rows only (x handled by node-major dots)
                T = jnp.concatenate(
                    [w1dT, w1sT, w1e,
                     b1.astype(jnp.bfloat16),
                     jnp.zeros((H, 5), jnp.bfloat16)], axis=1)

                iota_d = jax.lax.broadcasted_iota(jnp.int32, (128, chunk), 0)
                iota_s = jax.lax.broadcasted_iota(
                    jnp.int32, (W * 128, chunk), 0)
                Pd = (iota_d == dl).astype(jnp.bfloat16)
                Ps = (iota_s == gl).astype(jnp.bfloat16)
                ea_t = ea_buf[slot][0:fe, :].astype(jnp.bfloat16)
                ones = jnp.ones((1, chunk), jnp.bfloat16)
                P = jnp.concatenate(
                    [Pd, Ps, ea_t, ones,
                     jnp.zeros((5, chunk), jnp.bfloat16)], axis=0)

                big = jax.lax.dot_general(
                    T, P, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [64, CHUNK]
                xd6 = jax.lax.dot_general(
                    xdT, Pd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [6, CHUNK]
                xw6 = jax.lax.dot_general(
                    xwT, Ps, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                diff = (xd6[0:3] + xd6[3:6]) - (xw6[0:3] + xw6[3:6])
                radial = jnp.sum(diff * diff, axis=0, keepdims=True)
                z1 = big[0:H] + w1r * radial
                a1 = (z1 * jax.nn.sigmoid(z1)).astype(jnp.bfloat16)
                z2 = jax.lax.dot_general(
                    w2, a1, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + vp[:, 6:7]
                m = (z2 * jax.nn.sigmoid(z2)).astype(jnp.bfloat16)
                zg = jax.lax.dot_general(
                    wg1, m, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + vp[:, 7:8]
                g1 = zg * jax.nn.sigmoid(zg)
                gate = jnp.sum(vp[:, 1:2] * g1, axis=0, keepdims=True)
                trans = diff * gate
                t_hi = trans.astype(jnp.bfloat16)
                t_lo = (trans - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                scat_in = jnp.concatenate([m, t_hi, t_lo], axis=0)  # [70, CH]
                scat = jax.lax.dot_general(
                    scat_in, Pd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [70, 128]
                return acc + scat

            acc = jax.lax.fori_loop(
                0, nc, body, jnp.zeros((72, 128), jnp.float32)[0:70]
            )
            out_ref[0:70, :] = acc

    ids_j = jnp.asarray(ids)
    ea_j = jnp.asarray(ea)
    win_j = jnp.asarray(win)
    cstart_j = jnp.asarray(cstart)
    cnum_j = jnp.asarray(cnum)

    @jax.jit
    def run(cstart, cnum, win, wp, vp, tab, ids, ea):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(NBLK,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # wp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # vp
                    pl.BlockSpec(memory_space=pltpu.VMEM),   # tab
                    pl.BlockSpec(memory_space=pl.ANY),       # ids
                    pl.BlockSpec(memory_space=pl.ANY),       # ea
                ],
                out_specs=pl.BlockSpec(
                    (70, 128), lambda i, *_: (0, i), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 2, chunk), jnp.int32),
                    pltpu.VMEM((2, 8, chunk), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((70, NPAD), jnp.float32),
        )(cstart, cnum, win, wp, vp, tab, ids, ea)

    def call():
        return run(cstart_j, cnum_j, win_j, wp_j, vp_j, tab_j, ids_j, ea_j)

    def check():
        out = np.asarray(call())
        b = 3
        acc = np.zeros((70, 128), np.float32)
        wpf, vpf = wp.astype(np.float32), vp
        for c in range(cstart[b], cstart[b] + cnum[b]):
            for j in range(chunk):
                p = c * chunk + j
                dlv, gv = dstloc[p], gid[p]
                if dlv < 0:
                    continue
                sn = win[c, gv // 128] * 128 + gv % 128
                hd = tab[b * 128 + dlv, :H]
                hs = tab[sn, :H]
                xdv = tab[b * 128 + dlv, H : H + 3] + tab[b * 128 + dlv, H + 3 : H + 6]
                xsv = tab[sn, H : H + 3] + tab[sn, H + 3 : H + 6]
                diff = xdv - xsv
                radial = np.sum(diff * diff)
                z1 = (wpf[:H] @ hd + wpf[H : 2 * H] @ hs
                      + vpf[:, 2 : 2 + fe] @ ea[0:fe, p]
                      + vpf[:, 5] + vpf[:, 0] * radial)
                a1 = z1 / (1 + np.exp(-z1))
                z2 = wpf[2 * H : 3 * H] @ a1 + vpf[:, 6]
                m = z2 / (1 + np.exp(-z2))
                zg = wpf[3 * H :] @ m + vpf[:, 7]
                g1 = zg / (1 + np.exp(-zg))
                gate = np.sum(vpf[:, 1] * g1)
                acc[:H, dlv] += m
                acc[H : H + 3, dlv] += diff * gate
        got = out[:, b * 128 : (b + 1) * 128]
        gm = got[:H]
        gt = got[H : H + 3] + got[H + 3 : H + 6]
        em = np.max(np.abs(gm - acc[:H]) / (np.abs(acc[:H]) + 1))
        et = np.max(np.abs(gt - acc[H : H + 3]) / (np.abs(acc[H : H + 3]) + 1))
        print(f"    block3 rel err: m {em:.3e} t {et:.3e}")

    n_slots = cnum.sum() * chunk
    return call, check, int(n_slots), int(n_chunks)


if __name__ == "__main__":
    import sys

    print("backend:", jax.default_backend())
    configs = [(512, 2), (512, 3), (1024, 2), (1024, 3)]
    if len(sys.argv) > 1:
        configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
    first = True
    for chunk, W in configs:
        call, check, n_slots, n_chunks = build(chunk, W)
        dt = bench(call, f"v4 fwd chunk={chunk} W={W} ({n_chunks} chunks)")
        if dt:
            print(f"    -> {n_slots/(dt/1e3)/1e6:.0f} M slots/s")
            if first:
                check()
                first = False
