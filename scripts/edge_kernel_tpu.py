"""Compile + verify + time the v2 fused edge kernel on the real TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.ops.edge_kernel import (
    fused_edge_block_v2,
    make_edge_kernel_meta,
)
from fastegnn_tpu.ops.neighbors import radius_graph_np

H, FE = 64, 2


def main():
    print("backend:", jax.default_backend())
    N, DEGREE = 8000, 60
    rng = np.random.default_rng(0)
    r = 0.035
    vol = N * (4 / 3) * np.pi * r**3 / DEGREE
    side = vol ** (1 / 3)
    loc = (rng.random((N, 3)) * side).astype(np.float32)
    dst, src = radius_graph_np(loc, r)
    o = np.argsort(dst, kind="stable")
    dst, src = dst[o].astype(np.int32), src[o].astype(np.int32)
    E = dst.size
    ea = rng.normal(size=(E, FE)).astype(np.float32)
    emask = np.ones(E, bool)
    meta = make_edge_kernel_meta(dst, src, ea, emask, N, rows=128, chunk=1024)
    print(f"E={E} slots={meta.n_slots} overhead={(meta.n_slots/E-1)*100:.1f}%")

    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32) * 0.5
    x = jnp.asarray(loc)
    w = [
        jnp.asarray(rng.normal(size=(2 * H + 1 + FE, H)), jnp.float32) * 0.1,
        jnp.zeros(H), jnp.asarray(rng.normal(size=(H, H)), jnp.float32) * 0.1,
        jnp.zeros(H), jnp.asarray(rng.normal(size=(H, H)), jnp.float32) * 0.1,
        jnp.zeros(H), jnp.asarray(rng.normal(size=(H, 1)), jnp.float32) * 0.1,
    ]

    # correctness vs XLA composition (f32)
    def unfused(h, x):
        m = jnp.asarray(emask)[:, None].astype(jnp.float32)
        d, s = jnp.asarray(dst), jnp.asarray(src)
        diff = (x[d] - x[s]) * m
        rad = jnp.sum(diff**2, axis=-1, keepdims=True)
        ein = jnp.concatenate([h[d], h[s], rad, jnp.asarray(ea)], axis=-1)
        a1 = jax.nn.silu(ein @ w[0] + w[1])
        mm = jax.nn.silu(a1 @ w[2] + w[3])
        g1 = jax.nn.silu(mm @ w[4] + w[5])
        trans = diff * (g1 @ w[6])
        seg = lambda z: jax.ops.segment_sum(z * m, d, num_segments=N)
        return seg(mm), seg(trans)

    for dt, label in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        fused = jax.jit(lambda h, x: fused_edge_block_v2(
            h, x, meta, *w, compute_dtype=dt,
            grad_stream_dtype=dt))
        gm, gt = fused(h, x)
        rm, rt = jax.jit(unfused)(h, x)
        em = float(jnp.max(jnp.abs(gm - rm)) / (jnp.max(jnp.abs(rm)) + 1e-9))
        et = float(jnp.max(jnp.abs(gt - rt)) / (jnp.max(jnp.abs(rt)) + 1e-9))
        print(f"fwd rel-err ({label}): msum {em:.2e} tsum {et:.2e}")

        def loss_f(h, x, *ws):
            ms, ts = fused_edge_block_v2(
                h, x, meta, *ws, compute_dtype=dt, grad_stream_dtype=dt)
            return jnp.sum(ms**2) + jnp.sum(ts**2)

        def loss_r(h, x):
            ms, ts = unfused(h, x)
            return jnp.sum(ms**2) + jnp.sum(ts**2)

        gf = jax.jit(jax.grad(loss_f, (0, 1)))
        gr = jax.jit(jax.grad(loss_r, (0, 1)))
        gfh, gfx = gf(h, x, *w)
        grh, grx = gr(h, x)
        eh = float(jnp.max(jnp.abs(gfh - grh)) / (jnp.max(jnp.abs(grh)) + 1e-9))
        ex = float(jnp.max(jnp.abs(gfx - grx)) / (jnp.max(jnp.abs(grx)) + 1e-9))
        print(f"bwd rel-err ({label}): d_h {eh:.2e} d_x {ex:.2e}")

        # timing
        def sync():
            return float(jnp.sum(x[:8]))
        t0 = time.perf_counter()
        for _ in range(50):
            gm, gt = fused(h, x)
        float(jnp.sum(gm[:8]))
        print(f"fused fwd ({label}):      {(time.perf_counter()-t0)/50*1e3:8.3f} ms")
        gfull = jax.jit(jax.grad(loss_f, tuple(range(2 + len(w)))))
        gs = gfull(h, x, *w)
        t0 = time.perf_counter()
        for _ in range(50):
            gs = gfull(h, x, *w)
        float(jnp.sum(gs[0][:8]))
        print(f"fused fwd+bwd ({label}):  {(time.perf_counter()-t0)/50*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
