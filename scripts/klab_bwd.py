"""Round-3 v5 BACKWARD kernel dissection (run with nothing else on the box).

Variants of the production bwd kernel body:
  full       — as integrated (with tanh-sigmoid chain)
  nosrc      — src-role scatter + resident daccs accumulator removed
  nodst      — dst-role deT gather + dst scatter removed
  nowg       — weight-grad epilogue dots removed
  norecomp   — chain recompute replaced by constants (keeps gathers)
Plus the production fwd for scale.
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
from fastegnn_tpu.ops.edge_kernel_v5 import (
    H_MAX, ROWS, _chain_fwd, _chain_bwd, _gather, _fwd_impl,
    build_tab_v5, pack_w_v5, _hi_lo,
)
from fastegnn_tpu.ops.edge_kernel_v5 import _hi_lo


def make_bwd(meta, n_seg_pad, cd, variant):
    chunk, W, G, D, S = (meta.chunk, meta.W, meta.G, meta.D,
                         meta.S)
    n_super = meta.sdb.shape[0]
    H = H_MAX

    def kernel(sdb_ref, w0_ref, dw0_ref, wp_ref, eW_ref, vpc_ref,
               tabd_ref, tabs_ref, idsx_ref, dout_ref, daccd_ref,
               daccs_ref, dw_ref):
        c = pl.program_id(0)
        first = jnp.logical_or(
            c == 0, sdb_ref[c] != sdb_ref[jnp.maximum(c - 1, 0)])

        @pl.when(c == 0)
        def _():
            daccs_ref[:] = jnp.zeros_like(daccs_ref)
            dw_ref[:] = jnp.zeros_like(dw_ref)

        @pl.when(first)
        def _():
            daccd_ref[:] = jnp.zeros_like(daccd_ref)

        gs = []
        des = []
        for g in range(G):
            cg = c * G + g
            blk = idsx_ref[:, g * chunk:(g + 1) * chunk]
            f = _gather(tabd_ref, tabs_ref, eW_ref, sdb_ref, w0_ref,
                        dw0_ref, blk, c, cg, W, D, S, cd)
            gs.append(f)
            if variant == "nodst":
                des.append(jnp.zeros((72, chunk), jnp.float32)
                           + jnp.sum(dout_ref[0:8, :]) * 0)
            else:
                o = pl.multiple_of(dw0_ref[cg], 8)
                dout_c = dout_ref[pl.ds(o, D), :]
                des.append(jax.lax.dot_general(
                    dout_c, f["PdT"], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        bigT = jnp.concatenate([f["bigT"] for f in gs], axis=1)
        ea_z1T = jnp.concatenate([f["ea_z1T"] for f in gs], axis=1)
        deT = jnp.concatenate(des, axis=1)
        if variant == "norecomp":
            R = bigT.shape[1]
            z = bigT[0:H].astype(cd)
            w = dict(diff=bigT[64:72], radial=bigT[0:1], z1=z, s1=z, a1=z,
                     z2=z, s2=z, m=z, zg=z, sg=z, g1=z,
                     gate=bigT[0:1], trans=bigT[64:72])
        else:
            w = _chain_fwd(bigT, ea_z1T, wp_ref, vpc_ref, cd)
        b = _chain_bwd(w, deT, wp_ref, vpc_ref, cd)

        d_z1_c = b["d_z1"].astype(cd)
        dhi, dlo = _hi_lo(b["d_diff"], cd)
        dstuff = jnp.concatenate([d_z1_c, dhi, dlo], axis=0)

        if variant != "nodst":
            for g in range(G):
                d = jax.lax.dot_general(
                    gs[g]["PdT"], dstuff[:, g * chunk:(g + 1) * chunk],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = pl.multiple_of(dw0_ref[c * G + g], 8)
                daccd_ref[pl.ds(o, D), :] += d

        if variant != "nosrc":
            for g in range(G):
                cg = c * G + g
                dsw = jax.lax.dot_general(
                    gs[g]["PsT"], dstuff[:, g * chunk:(g + 1) * chunk],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o = pl.multiple_of(w0_ref[cg] * ROWS, ROWS)
                daccs_ref[pl.ds(o, W * ROWS), :] += dsw

        if variant != "nowg":
            dW2 = jax.lax.dot_general(
                w["a1"], b["d_z2_c"], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dWg1 = jax.lax.dot_general(
                w["m"], b["d_zg_c"], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            eaT = jnp.concatenate([f["eaT"] for f in gs], axis=1)
            dW1e = jax.lax.dot_general(
                eaT, d_z1_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dw1r = jax.lax.dot_general(
                w["radial"].astype(cd), d_z1_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            g1dg = w["g1"] * jnp.broadcast_to(b["d_gate"], w["g1"].shape)
            dwg2 = jnp.sum(g1dg, axis=1, keepdims=True)
            db2 = jnp.sum(b["d_z2"], axis=1, keepdims=True)
            dbg1 = jnp.sum(b["d_zg"], axis=1, keepdims=True)
            dw_ref[:] += jnp.concatenate(
                [dW2, dWg1, dW1e, dw1r, dwg2.T, db2.T, dbg1.T,
                 jnp.zeros((144 - 138, 64), jnp.float32)], axis=0)

    def run(wp, eW, vpc, tabd, tabs, idsx, dout):
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
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, G * chunk),
                                 lambda c, sdb, w0, dw0: (0, c)),
                    pl.BlockSpec((S * ROWS, 72),
                                 lambda c, sdb, w0, dw0: (sdb[c], 0)),
                ],
                out_specs=(
                    pl.BlockSpec((S * ROWS, 80),
                                 lambda c, sdb, w0, dw0: (sdb[c], 0)),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_seg_pad, 80), jnp.float32),
                jax.ShapeDtypeStruct((n_seg_pad, 80), jnp.float32),
                jax.ShapeDtypeStruct((144, 64), jnp.float32),
            ),
        )(meta.sdb, meta.w0, meta.dw0, wp, eW, vpc, tabd, tabs, idsx,
          dout)

    return jax.jit(run)


def main():
    t00 = time.time()
    stage = lambda s: print(f"[{time.time() - t00:7.1f}s] {s}", flush=True)
    batch, n_real, _ = build_batch(8000, 60, channels=3)
    meta = batch.ek5
    print(f"chunk={meta.chunk} W={meta.W} G={meta.G} D={meta.D} "
          f"slots={meta.n_slots} super={meta.n_super} "
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

    @jax.jit
    def setup(h, x, W1, b1, W2, b2, Wg1, bg1, wg2, key):
        tabd, tabs = build_tab_v5(h, x, W1, b1, cd, n_seg_pad)
        wp, eW, vpc = pack_w_v5(W1, b1, W2, b2, Wg1, bg1, wg2, 2, cd)
        dout = jax.random.normal(key, (n_seg_pad, 72), cd)
        return tabd, tabs, wp, eW, vpc, dout

    tabd, tabs, wp, eW, vpc, dout = setup(
        h, batch.coord, W1, b1, W2, b2, Wg1, bg1, wg2, jax.random.key(1))
    stage("setup done")

    def overhead():
        t0 = time.perf_counter()
        float(jnp.sum(tabd[:8, :8].astype(jnp.float32)))
        return time.perf_counter() - t0

    ov = min(overhead() for _ in range(3))
    stage(f"overhead {ov*1e3:.1f} ms")

    # production fwd for scale (integrated tanh-sigmoid)
    fwdj = jax.jit(functools.partial(
        _fwd_impl, chunk=meta.chunk, W=meta.W, G=meta.G, D=meta.D,
        S=meta.S, n_seg_pad=n_seg_pad, interpret=False))
    marrs = (meta.sdb, meta.w0, meta.dw0)
    r = fwdj(marrs, wp, eW, vpc, tabd, tabs, meta.idsx)
    float(jnp.sum(r[:8, :8]))
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        r = fwdj(marrs, wp, eW, vpc, tabd, tabs, meta.idsx)
    float(jnp.sum(r[:8, :8]))
    print(f"fwd production   {(time.perf_counter()-t0-ov)/n*1e3:9.3f} ms",
          flush=True)

    for variant in ("full", "nosrc", "nodst", "nowg", "norecomp"):
        try:
            fn = make_bwd(meta, n_seg_pad, cd, variant)
            r = fn(wp, eW, vpc, tabd, tabs, meta.idsx, dout)
            float(jnp.sum(r[0][:8, :8]))
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(wp, eW, vpc, tabd, tabs, meta.idsx, dout)
            float(jnp.sum(r[0][:8, :8]))
            dt = max(time.perf_counter() - t0 - ov, 1e-9) / n * 1e3
            print(f"bwd {variant:<10s} {dt:9.3f} ms", flush=True)
        except Exception as e:
            print(f"bwd {variant:<10s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
