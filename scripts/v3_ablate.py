"""Ablation timing of the v3 forward kernel: cost attribution by deletion.

Variants replace pieces of the chunk computation with cheap stand-ins while
keeping data deps alive (so Mosaic cannot DCE the remainder):
  full      — real forward
  nosilu    — silu -> identity (keeps all dots; removes 3 transcendental chains)
  noonehot  — Pd/Ps one-hot builds -> constant broadcast (removes iota compares)
  nobig     — big P@T dot -> cheap slice (removes the gather matmul)
  nomlp     — the three 64x64 MLP dots -> identity
  noscat    — scatter dot -> sum stand-in
  dotsonly  — one-hot build + all dots, no silu/elementwise
Usage: python scripts/v3_ablate.py [variant ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastegnn_tpu.ops.edge_kernel_v3 import (
    H_MAX, make_v3_meta, pack_weights_v3, _silu_f32,
)
from fastegnn_tpu.graph import morton_order
from fastegnn_tpu.ops.neighbors import radius_graph_np

H = H_MAX
CHUNK = int(__import__("os").environ.get("V3_CHUNK", "512"))
W = int(__import__("os").environ.get("V3_W", "4"))


def _kernel(cdb_ref, first_ref, win_ref, wp_ref, eT_ref, vp3_ref,
            tab_ref, ids_ref, ea_ref, out_ref, *, cd, mode):
    c = pl.program_id(0)
    chunk = ids_ref.shape[0]
    wp = wp_ref[:]
    w1d, w1s = wp[0:H, :], wp[H : 2 * H, :]

    td = tab_ref[pl.ds(cdb_ref[c] * 128, 128), :]
    stacked = jnp.concatenate(
        [tab_ref[pl.ds(win_ref[c, k] * 128, 128), :] for k in range(W)],
        axis=0,
    )
    fold_d = jax.lax.dot_general(
        td[:, 0:H], w1d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    fold_w = jax.lax.dot_general(
        stacked[:, 0:H], w1s, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    block_d = jnp.concatenate([fold_d, td[:, H : H + 6]], axis=1)
    block_w = jnp.concatenate([fold_w, -stacked[:, H : H + 6]], axis=1)
    T = jnp.concatenate([block_d, block_w, eT_ref[:, 0:70]], axis=0)

    dl = ids_ref[:, 0:1]
    gl = ids_ref[:, 1:2]
    if mode == "noonehot":
        Pd = jnp.broadcast_to(ea_ref[:, 0:1].astype(cd), (chunk, 128))
        Ps = jnp.broadcast_to(ea_ref[:, 1:2].astype(cd), (chunk, W * 128))
    else:
        iota_d = jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (chunk, W * 128), 1)
        Pd = (iota_d == dl).astype(cd)
        Ps = (iota_s == gl).astype(cd)
    P = jnp.concatenate([Pd, Ps, ea_ref[:].astype(cd)], axis=1)

    if mode == "nobig":
        big = jnp.broadcast_to(T[0:1, :], (chunk, 70)) + P[:, 0:1].astype(jnp.float32)
    else:
        big = jax.lax.dot_general(
            P, T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    diff = big[:, H : H + 3] + big[:, H + 3 : H + 6]
    radial = jnp.sum(diff * diff, axis=1, keepdims=True)
    w1r = vp3_ref[0]
    z1 = big[:, 0:H] + radial * w1r[:, 0:H]

    nosilu = mode in ("nosilu", "dotsonly")

    def act(z):
        if nosilu:
            return z, None
        return _silu_f32(z)

    a1f, _ = act(z1)
    a1 = a1f.astype(cd)
    if mode == "nomlp":
        m = a1
        g1 = a1f
    else:
        z2 = jax.lax.dot_general(
            a1, wp[2 * H : 3 * H, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + vp3_ref[2][:, 0:H]
        mf, _ = act(z2)
        m = mf.astype(cd)
        zg = jax.lax.dot_general(
            m, wp[3 * H : 4 * H, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + vp3_ref[3][:, 0:H]
        g1, _ = act(zg)
    gate = jnp.sum(g1 * vp3_ref[1][:, 0:H], axis=1, keepdims=True)
    trans = diff * gate
    t_hi = trans.astype(cd)
    t_lo = (trans - t_hi.astype(jnp.float32)).astype(cd)
    scat_in = jnp.concatenate(
        [m, t_hi, t_lo, jnp.zeros((chunk, 2), cd)], axis=1)
    if mode == "noscat":
        contrib = jnp.broadcast_to(
            jnp.sum(scat_in.astype(jnp.float32), axis=0, keepdims=True),
            (128, 72))
    else:
        contrib = jax.lax.dot_general(
            Pd, scat_in, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


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

    names = sys.argv[1:] or [
        "full", "nosilu", "noonehot", "nobig", "nomlp", "noscat", "dotsonly"]
    base = None
    for name in names:
        fn = build(meta, tab, wp, eT, vp3, n_seg_pad, name)
        r = fn(); float(jnp.sum(r[:8]))
        t0 = time.perf_counter()
        for _ in range(50):
            r = fn()
        float(jnp.sum(r[:8]))
        dt = (time.perf_counter() - t0) / 50 * 1e3
        extra = ""
        if name == "full":
            base = dt
        elif base is not None:
            extra = f"   saves {base - dt:+7.3f} ms"
        print(f"{name:<9s} {dt:8.3f} ms{extra}")


if __name__ == "__main__":
    main()
