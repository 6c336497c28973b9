"""Round-3 v5-kernel dissection: what bounds the fwd kernel?

Times pallas_call variants sharing the production grid/block structure:
  full        — production fwd kernel body
  noact       — silu replaced by identity (isolate transcendentals)
  nohot       — one-hot PdT/PsT replaced by constants (isolate iota builds)
  nodots      — gather/scatter dots removed (chain on constant bigT)
  chainonly   — only the MLP chain on resident data
  copyonly    — DMA idsx in, write output block (grid+DMA floor)
Run on the real chip.
"""

import functools
import os
import time

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_batch
import fastegnn_tpu.ops.edge_kernel_v5 as ek5
from fastegnn_tpu.ops.edge_kernel_v5 import (
    H_MAX, ROWS, _chain_fwd, build_tab_v5, pack_w_v5,
)
from fastegnn_tpu.ops.edge_kernel_v5 import _hi_lo, _silu_f32


def make_fwd(meta, n_seg_pad, cd, variant):
    chunk, W, G, D, S = (meta.chunk, meta.W, meta.G, meta.D,
                         meta.S)
    n_super = meta.sdb.shape[0]

    def gather(tab_ref, eW_ref, sdb_ref, w0_ref, dw0_ref, blk, c, cg):
        dl, gl = blk[0:1, :], blk[1:2, :]
        if variant == "nohot":
            PdT = jnp.full((D, chunk), 1.0 / 128, cd)
            PsT = jnp.full((W * ROWS, chunk), 1.0 / 128, cd)
        elif variant == "bf16hot":
            # compare in bf16 (ids < 256 are exact): half the vregs
            iota_d = jax.lax.broadcasted_iota(
                jnp.int32, (D, chunk), 0).astype(cd)
            iota_s = jax.lax.broadcasted_iota(
                jnp.int32, (W * ROWS, chunk), 0).astype(cd)
            PdT = (iota_d == dl.astype(cd)).astype(cd)
            PsT = (iota_s == gl.astype(cd)).astype(cd)
        else:
            iota_d = jax.lax.broadcasted_iota(jnp.int32, (D, chunk), 0)
            iota_s = jax.lax.broadcasted_iota(jnp.int32, (W * ROWS, chunk), 0)
            PdT = (iota_d == dl).astype(cd)
            PsT = (iota_s == gl).astype(cd)
        eaT = jax.lax.bitcast_convert_type(blk[2:8, :], jnp.float32).astype(cd)
        td = tab_ref[
            pl.ds(pl.multiple_of(sdb_ref[c] * ROWS + dw0_ref[cg], 8), D),
            0:128]
        tw = tab_ref[pl.ds(w0_ref[cg] * ROWS, W * ROWS), 128:256]
        if variant == "nodots":
            bigT = jnp.broadcast_to(
                td[0:1, :].astype(jnp.float32).T[:, 0:1], (128, chunk)
            ) + jnp.sum(PdT.astype(jnp.float32)) * 0 + jnp.sum(
                PsT.astype(jnp.float32)) * 0 + jnp.sum(
                tw.astype(jnp.float32)) * 0
            ea_z1T = jnp.zeros((128, chunk), jnp.float32) + jnp.sum(
                eaT.astype(jnp.float32)) * 0
        else:
            bigT = jax.lax.dot_general(
                td, PdT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            bigT = bigT + jax.lax.dot_general(
                tw, PsT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ea_z1T = jax.lax.dot_general(
                eW_ref[:], eaT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return dict(PdT=PdT, bigT=bigT, ea_z1T=ea_z1T)

    def kernel(sdb_ref, w0_ref, dw0_ref, wp_ref, eW_ref, vpc_ref,
               tab_ref, idsx_ref, out_ref):
        c = pl.program_id(0)
        first = jnp.logical_or(
            c == 0, sdb_ref[c] != sdb_ref[jnp.maximum(c - 1, 0)])

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        if variant == "copyonly":
            acc = jnp.sum(idsx_ref[:].astype(jnp.float32))
            out_ref[0:8, :] += acc + jnp.sum(tab_ref[0:8, 0:128].astype(
                jnp.float32))
            return
        if variant == "perchunk":
            # no G-concat: chain + scatter per chunk
            for g in range(G):
                f = gather(tab_ref, eW_ref, sdb_ref, w0_ref, dw0_ref,
                           idsx_ref[:, g * chunk:(g + 1) * chunk], c,
                           c * G + g)
                w = _chain_fwd(f["bigT"], f["ea_z1T"], wp_ref, vpc_ref, cd)
                t_hi, t_lo = _hi_lo(w["trans"], cd)
                scat_T = jnp.concatenate(
                    [w["m"], t_hi, t_lo,
                     jnp.zeros((128 - H_MAX - 16, w["m"].shape[1]), cd)],
                    axis=0)
                d = jax.lax.dot_general(
                    f["PdT"], scat_T, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = pl.multiple_of(dw0_ref[c * G + g], 8)
                out_ref[pl.ds(o, D), :] += d
            return
        gs = [
            gather(tab_ref, eW_ref, sdb_ref, w0_ref, dw0_ref,
                   idsx_ref[:, g * chunk:(g + 1) * chunk], c, c * G + g)
            for g in range(G)
        ]
        bigT = jnp.concatenate([f["bigT"] for f in gs], axis=1)
        ea_z1T = jnp.concatenate([f["ea_z1T"] for f in gs], axis=1)
        w = _chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd)
        t_hi, t_lo = _hi_lo(w["trans"], cd)
        scat_T = jnp.concatenate(
            [w["m"], t_hi, t_lo,
             jnp.zeros((128 - H_MAX - 16, w["m"].shape[1]), cd)], axis=0)
        for g in range(G):
            if variant == "nodots":
                d = jnp.broadcast_to(
                    jnp.sum(scat_T[:, g * chunk:(g + 1) * chunk]
                            .astype(jnp.float32)), (D, 128))
            else:
                d = jax.lax.dot_general(
                    gs[g]["PdT"], scat_T[:, g * chunk:(g + 1) * chunk],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o = pl.multiple_of(dw0_ref[c * G + g], 8)
            out_ref[pl.ds(o, D), :] += d

    def run(wp, eW, vpc, tab, idsx):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(n_super,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, G * chunk),
                                 lambda c, sdb, w0, dw0: (0, c)),
                ],
                out_specs=pl.BlockSpec(
                    (S * ROWS, 128), lambda c, sdb, w0, dw0: (sdb[c], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, 128), jnp.float32),
        )(meta.sdb, meta.w0, meta.dw0, wp, eW, vpc, tab, idsx)

    return jax.jit(run)


def main():
    t00 = time.time()
    stage = lambda s: print(f"[{time.time() - t00:7.1f}s] {s}", flush=True)
    batch, n_real, _ = build_batch(8000, 60, channels=3)
    meta = batch.ek5
    print(f"chunk={meta.chunk} W={meta.W} G={meta.G} D={meta.D} "
          f"n_slots={meta.n_slots} n_super={meta.n_super} "
          f"pad={1 - n_real / meta.n_slots:.1%}", flush=True)
    N = batch.coord.shape[0]
    n_seg_pad = max(
        ((N + meta.S * ROWS - 1) // (meta.S * ROWS)) * meta.S * ROWS,
        meta.W * ROWS)
    cd = jnp.bfloat16
    H = H_MAX

    rng = np.random.default_rng(0)
    h = rng.normal(size=(N, H)).astype(np.float32)
    W1 = (rng.normal(size=(2 * H + 3, H)) * 0.1).astype(np.float32)
    b1 = np.zeros((H,), np.float32)
    W2 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    b2 = np.zeros((H,), np.float32)
    Wg1 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    bg1 = np.zeros((H,), np.float32)
    wg2 = (rng.normal(size=(H, 1)) * 0.01).astype(np.float32)

    # ONE jitted setup: eager ops pay a tunnel round trip each on axon
    @jax.jit
    def setup(h, x, W1, b1, W2, b2, Wg1, bg1, wg2):
        tab = build_tab_v5(h, x, W1, b1, cd, n_seg_pad)
        wp, eW, vpc = pack_w_v5(W1, b1, W2, b2, Wg1, bg1, wg2, 2, cd)
        return tab, wp, eW, vpc

    tab, wp, eW, vpc = setup(h, batch.coord, W1, b1, W2, b2, Wg1, bg1, wg2)
    stage("setup done")

    def overhead():
        t0 = time.perf_counter()
        float(jnp.sum(tab[:8, :8].astype(jnp.float32)))
        return time.perf_counter() - t0

    ov = min(overhead() for _ in range(3))
    stage(f"overhead {ov*1e3:.1f} ms")

    import fastegnn_tpu.ops.edge_kernel_v5 as m5
    real = m5._silu_f32

    variants = ("full", "perchunk", "bf16hot", "tanhsig", "noact",
                "nohot", "copyonly")
    if os.environ.get("R3_KLAB_VARIANTS"):
        variants = os.environ["R3_KLAB_VARIANTS"].split(",")
    for variant in variants:
        if variant == "noact":
            def fake_silu(z):
                zf = z.astype(jnp.float32)
                return (zf * 0.5).astype(z.dtype), zf * 0 + 0.5

            m5._silu_f32 = fake_silu
        elif variant == "tanhsig":
            def tanh_silu(z):
                zf = z.astype(jnp.float32)
                s = 0.5 + 0.5 * jnp.tanh(0.5 * zf)
                return (zf * s).astype(z.dtype), s

            m5._silu_f32 = tanh_silu
        elif variant == "tanhbf16":
            # tanh natively on the bf16 vector (half the vregs) — numerics
            # drop to bf16 tanh accuracy on the gate path; make_fwd treats
            # the unknown variant name as the production body
            def tanh_silu_bf16(z):
                half = jnp.asarray(0.5, z.dtype)
                s = half + half * jnp.tanh(half * z)
                return z * s, s

            m5._silu_f32 = tanh_silu_bf16
        try:
            fn = make_fwd(meta, n_seg_pad, cd, variant)
            r = fn(wp, eW, vpc, tab, meta.idsx)
            float(jnp.sum(r[:8, :8]))
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(wp, eW, vpc, tab, meta.idsx)
            float(jnp.sum(r[:8, :8]))
            dt = max(time.perf_counter() - t0 - ov, 1e-9) / n * 1e3
            print(f"fwd {variant:<10s} {dt:9.3f} ms", flush=True)
        except Exception as e:
            print(f"fwd {variant:<10s} FAILED: {str(e)[:160]}", flush=True)
        finally:
            m5._silu_f32 = real


if __name__ == "__main__":
    main()
