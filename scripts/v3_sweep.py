"""Sweep (chunk, W, G) of the current v3 edge kernel at bench geometry."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.ops.edge_kernel_v3 import fused_edge_block_v3, make_v3_meta
from fastegnn_tpu.ops.neighbors import radius_graph_np
from fastegnn_tpu.graph import morton_order

H, FE = 64, 2


def timeit(fn, n=30):
    r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("backend:", jax.default_backend())
    N, DEGREE = 8000, 60
    rng = np.random.default_rng(0)
    from bench import _positions

    loc, r = _positions(N, DEGREE, rng)
    dst, src = radius_graph_np(loc, r)
    actual = dst.size / N
    if abs(actual - DEGREE) > 0.15 * DEGREE:
        loc = (loc * (actual / DEGREE) ** (1 / 3)).astype(np.float32)
        dst, src = radius_graph_np(loc, r)
    perm = morton_order(loc)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    loc = loc[perm]
    dst, src = inv[dst].astype(np.int32), inv[src].astype(np.int32)
    E = dst.size
    ea = rng.standard_normal((E, FE), np.float32)
    mask = np.ones(E, bool)

    h = jnp.asarray(rng.standard_normal((N, H), np.float32))
    x = jnp.asarray(loc)
    k = jax.random.key(0)
    ks = jax.random.split(k, 7)
    W1 = jax.random.normal(ks[0], (2 * H + 1 + FE, H)) * 0.1
    b1 = jax.random.normal(ks[1], (H,)) * 0.1
    W2 = jax.random.normal(ks[2], (H, H)) * 0.1
    b2 = jax.random.normal(ks[3], (H,)) * 0.1
    Wg1 = jax.random.normal(ks[4], (H, H)) * 0.1
    bg1 = jax.random.normal(ks[5], (H,)) * 0.1
    wg2 = jax.random.normal(ks[6], (H, 1)) * 0.1
    weights = (W1, b1, W2, b2, Wg1, bg1, wg2)

    configs = [
        (512, 2, 4), (512, 2, 8), (512, 3, 4), (512, 4, 4),
        (1024, 2, 2), (1024, 2, 4), (1024, 3, 2), (1024, 4, 2),
        (2048, 4, 1), (2048, 4, 2), (2048, 6, 1),
    ]
    if len(sys.argv) > 1:
        configs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]

    for (chunk, W, G) in configs:
        meta = make_v3_meta(dst, src, ea, mask, N, chunk=chunk, W=W, G=G)
        pad = meta.n_slots / E - 1
        fwd = jax.jit(lambda h, x: fused_edge_block_v3(
            h, x, meta, *weights, compute_dtype=jnp.bfloat16))

        def loss(h, x):
            m, t = fused_edge_block_v3(
                h, x, meta, *weights, compute_dtype=jnp.bfloat16)
            return jnp.sum(m.astype(jnp.float32)) + jnp.sum(t)

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        try:
            tf = timeit(lambda: fwd(h, x))
            tb = timeit(lambda: g(h, x))
        except Exception as e:
            print(f"chunk={chunk:5d} W={W} G={G}  FAILED: {str(e)[:120]}")
            continue
        print(f"chunk={chunk:5d} W={W} G={G} pad={pad:6.1%} "
              f"slots={meta.n_slots:7d} fwd={tf:7.3f} ms  fwd+bwd={tb:7.3f} ms")


if __name__ == "__main__":
    main()
