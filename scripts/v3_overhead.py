"""Isolate the v3 kernel's per-chunk fixed overhead.

Variants build UP from nothing (unlike v3_ablate which deletes):
  empty    — write out only (grid + out DMA cost)
  ids      — + read ids/ea blocks
  slice1   — + dst table slice td
  slice4   — + W window slices, no concat (separate folds)
  concat   — + the real stacked concat
  folds    — concat + fold dots
  grid2d   — like empty but 2D grid (n_chunks, 1) to test grid overhead shape
Usage: python scripts/v3_overhead.py [variant ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastegnn_tpu.ops.edge_kernel_v3 import H_MAX, make_v3_meta, pack_weights_v3
from fastegnn_tpu.graph import morton_order
from fastegnn_tpu.ops.neighbors import radius_graph_np

H = H_MAX
CHUNK = int(__import__("os").environ.get("V3_CHUNK", "512"))
W = int(__import__("os").environ.get("V3_W", "4"))


def _kernel(cdb_ref, first_ref, win_ref, wp_ref, eT_ref, vp3_ref,
            tab_ref, ids_ref, ea_ref, out_ref, *, cd, mode):
    c = pl.program_id(0)
    chunk = ids_ref.shape[0]
    acc = jnp.float32(0.0)

    if mode in ("ids", "slice1", "slice4", "concat", "folds"):
        acc = acc + jnp.sum(ids_ref[:].astype(jnp.float32)) + jnp.sum(ea_ref[:])

    td = None
    if mode in ("slice1", "slice4", "concat", "folds"):
        td = tab_ref[pl.ds(cdb_ref[c] * 128, 128), :]
        acc = acc + jnp.sum(td.astype(jnp.float32))

    if mode == "slice4":
        for k in range(W):
            sk = tab_ref[pl.ds(win_ref[c, k] * 128, 128), :]
            acc = acc + jnp.sum(sk.astype(jnp.float32))
    if mode in ("concat", "folds"):
        stacked = jnp.concatenate(
            [tab_ref[pl.ds(win_ref[c, k] * 128, 128), :] for k in range(W)],
            axis=0,
        )
        acc = acc + jnp.sum(stacked.astype(jnp.float32))
    if mode == "folds":
        wp = wp_ref[:]
        fold_d = jax.lax.dot_general(
            td[:, 0:H], wp[0:H, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        fold_w = jax.lax.dot_general(
            stacked[:, 0:H], wp[H:2*H, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jnp.sum(fold_d) + jnp.sum(fold_w)

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def build(meta, tab, wp, eT, vp3, n_seg_pad, mode):
    @jax.jit
    def run(tab, wp, eT, vp3, ids, ea):
        return pl.pallas_call(
            functools.partial(_kernel, cd=jnp.bfloat16, mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(meta.n_chunks,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((CHUNK, 8), lambda c, cdb, first, win: (c, 0)),
                    pl.BlockSpec((CHUNK, 8), lambda c, cdb, first, win: (c, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (128, 72), lambda c, cdb, first, win: (cdb[c], 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((n_seg_pad, 72), jnp.float32),
        )(meta.cdb, meta.first, meta.win, wp, eT, vp3, tab, ids, ea)

    return lambda: run(tab, wp, eT, vp3, meta.ids, meta.eattr_k)


def main():
    print(f"backend={jax.default_backend()} chunk={CHUNK} W={W}")
    N, DEG = 8000, 60
    rng = np.random.default_rng(0)
    from bench import _positions

    loc, r = _positions(N, DEG, rng)
    dst, src = radius_graph_np(loc, r)
    actual = dst.size / N
    if abs(actual - DEG) > 0.15 * DEG:
        loc = (loc * (actual / DEG) ** (1 / 3)).astype(np.float32)
        dst, src = radius_graph_np(loc, r)
    perm = morton_order(loc)
    inv = np.empty_like(perm); inv[perm] = np.arange(perm.size)
    loc = loc[perm]
    dst, src = inv[dst].astype(np.int32), inv[src].astype(np.int32)
    E = dst.size
    ea = rng.normal(size=(E, 2)).astype(np.float32)
    meta = make_v3_meta(dst, src, ea, np.ones(E, bool), N, chunk=CHUNK, W=W)
    n_seg_pad = meta.n_blocks * 128
    print(f"E={E} slots={meta.n_slots} chunks={meta.n_chunks}")

    cd = jnp.bfloat16
    h = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.float32)
    x = jnp.asarray(loc)
    Wts = [rng.normal(size=(2 * H + 1 + 2, H)) * 0.2, rng.normal(size=H) * .1,
           rng.normal(size=(H, H)) * 0.2, rng.normal(size=H) * .1,
           rng.normal(size=(H, H)) * 0.2, rng.normal(size=H) * .1,
           rng.normal(size=(H, 1)) * 0.1]
    Wts = [jnp.asarray(a, jnp.float32) for a in Wts]
    wp, eT, vp3 = pack_weights_v3(*Wts, H, 2, cd)
    x_hi = x.astype(cd).astype(jnp.float32)
    tab = jnp.zeros((n_seg_pad, 128), jnp.float32)
    tab = tab.at[:N, 0:H].set(h).at[:N, H:H+3].set(x_hi).at[:N, H+3:H+6].set(x - x_hi)
    tab = tab.astype(cd)

    names = sys.argv[1:] or ["empty", "ids", "slice1", "slice4", "concat", "folds"]
    for name in names:
        fn = build(meta, tab, wp, eT, vp3, n_seg_pad, name)
        r = fn(); float(jnp.sum(r[:8]))
        t0 = time.perf_counter()
        for _ in range(50):
            r = fn()
        float(jnp.sum(r[:8]))
        dt = (time.perf_counter() - t0) / 50 * 1e3
        print(f"{name:<8s} {dt:8.3f} ms  ({dt*1e6/meta.n_chunks:7.2f} us/chunk)")


if __name__ == "__main__":
    main()
