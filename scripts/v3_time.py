"""Time the v3 edge kernel (fwd, fwd+bwd) at bench workload scale."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.ops.edge_kernel_v3 import fused_edge_block_v3, make_v3_meta
from fastegnn_tpu.ops.neighbors import radius_graph_np

H, FE = 64, 2


def timeit(fn, label, n=30):
    r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:<48s} {dt:9.3f} ms")
    return dt


def morton(x, bits=10):
    rng_ = np.ptp(x, 0).max() + 1e-9
    q = ((x - x.min(0)) / rng_ * (2**bits - 1)).astype(np.uint64)
    code = np.zeros(len(x), np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1) << np.uint64(3 * b + d)
    return np.argsort(code)


def main():
    print("backend:", jax.default_backend())
    N, DEGREE = 8000, 60
    chunk = int(os.environ.get("V3_CHUNK", 512))
    W = int(os.environ.get("V3_W", 2))
    use_morton = os.environ.get("V3_MORTON", "1") == "1"
    rng = np.random.default_rng(0)
    from bench import _positions

    loc, r = _positions(N, DEGREE, rng)
    dst, src = radius_graph_np(loc, r)
    actual = dst.size / N
    if abs(actual - DEGREE) > 0.15 * DEGREE:
        loc = (loc * (actual / DEGREE) ** (1 / 3)).astype(np.float32)
        dst, src = radius_graph_np(loc, r)
    if use_morton:
        perm = morton(loc)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        loc = loc[perm]
        dst, src = inv[dst].astype(np.int32), inv[src].astype(np.int32)
    E = dst.size
    ea = rng.normal(size=(E, FE)).astype(np.float32)
    meta = make_v3_meta(dst, src, ea, np.ones(E, bool), N, chunk=chunk, W=W)
    print(f"E={E} slots={meta.n_slots} (pad {meta.n_slots/E-1:.1%}) "
          f"chunks={meta.n_chunks} chunk={chunk} W={W} morton={use_morton}")

    cd = jnp.bfloat16
    h = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.float32)
    x = jnp.asarray(loc)
    W1 = jnp.asarray(rng.normal(size=(2 * H + 1 + FE, H)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=H) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.normal(size=(H, H)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=H) * 0.1, jnp.float32)
    Wg1 = jnp.asarray(rng.normal(size=(H, H)) * 0.2, jnp.float32)
    bg1 = jnp.asarray(rng.normal(size=H) * 0.1, jnp.float32)
    wg2 = jnp.asarray(rng.normal(size=(H, 1)) * 0.1, jnp.float32)
    w = (W1, b1, W2, b2, Wg1, bg1, wg2)

    @jax.jit
    def fwd(h, x, *w):
        return fused_edge_block_v3(h, x, meta, *w, compute_dtype=cd)

    dt = timeit(lambda: fwd(h, x, *w), "v3 fwd")
    if dt:
        print(f"    -> {E/(dt/1e3)/1e6:.0f} M edges/s")

    cot_m = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    cot_t = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    @jax.jit
    def step(h, x, *w):
        def L(*a):
            ms, ts = fused_edge_block_v3(a[0], a[1], meta, *a[2:],
                                         compute_dtype=cd)
            return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

        return jax.grad(L, argnums=tuple(range(9)))(h, x, *w)

    dt2 = timeit(lambda: step(h, x, *w), "v3 fwd+bwd", n=20)
    if dt2:
        print(f"    -> {E/(dt2/1e3)/1e6:.0f} M edges/s train-equiv")


if __name__ == "__main__":
    main()
