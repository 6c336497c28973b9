"""Chained-backward anomaly: per-layer fwd+bwd cost vs chain depth.

Standalone (depth-1) v5 fwd+bwd measures ~1.7 ms; inside the 4-layer model
the marginal layer costs ~2.9-3.7 ms fwd+bwd.  Times grad of an L-chain for
L = 1, 2, 4, plus a jax.checkpoint (remat) variant, to see whether the
penalty is residual traffic, scheduling, or something else.
"""

import os
import time

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_batch
from fastegnn_tpu.ops.edge_kernel_v5 import fused_edge_block_v5


def main():
    t00 = time.time()
    stage = lambda s: print(f"[{time.time() - t00:7.1f}s] {s}", flush=True)
    batch, n_real, _ = build_batch(8000, 60, channels=3)
    N = batch.coord.shape[0]
    H = 64
    rng = np.random.default_rng(0)
    h_d = jax.device_put(rng.normal(size=(N, H)).astype(np.float32))
    ws = jax.device_put((
        (rng.normal(size=(2 * H + 3, H)) * 0.1).astype(np.float32),
        np.zeros((H,), np.float32),
        (rng.normal(size=(H, H)) * 0.1).astype(np.float32),
        np.zeros((H,), np.float32),
        (rng.normal(size=(H, H)) * 0.1).astype(np.float32),
        np.zeros((H,), np.float32),
        (rng.normal(size=(H, 1)) * 0.01).astype(np.float32),
    ))
    x_d = batch.coord
    float(jnp.sum(batch.coord[:8]))

    def overhead():
        t0 = time.perf_counter()
        float(jnp.sum(batch.coord[:8]))
        return time.perf_counter() - t0

    ov = min(overhead() for _ in range(3))
    stage(f"overhead {ov*1e3:.1f} ms")

    def timed(label, fn, n=50):
        r = fn()
        float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
        dt = max(time.perf_counter() - t0 - ov, 1e-9) / n * 1e3
        print(f"{label:<46s} {dt:9.3f} ms", flush=True)
        return dt

    def layer(h, x, m, *w):
        ms, ts = fused_edge_block_v5(h, x, m, *w, compute_dtype=jnp.bfloat16)
        return h + ms * 1e-3, x + ts * 1e-3

    for L in (1, 2, 4):
        def lossL(h, x, m, *w, L=L):
            for _ in range(L):
                h, x = layer(h, x, m, *w)
            return jnp.sum(h) + jnp.sum(x)

        g = jax.jit(jax.grad(lossL, argnums=(0, 1, 3, 5, 7, 9)))
        timed(f"chain L={L} fwd+bwd", lambda: g(h_d, x_d, batch.ek5, *ws))

    # 4 INDEPENDENT layers (no chaining): same pallas call count, no
    # cross-layer data dependencies — separates per-call overhead from
    # dependency-stall cost
    def lossI(h, x, m, *w):
        tot = 0.0
        for i in range(4):
            hh, xx = layer(h + i * 1e-3, x, m, *w)
            tot = tot + jnp.sum(hh) + jnp.sum(xx)
        return tot

    gi = jax.jit(jax.grad(lossI, argnums=(0, 1, 3, 5, 7, 9)))
    timed("4 independent fwd+bwd", lambda: gi(h_d, x_d, batch.ek5, *ws))

    # remat each layer: recompute the layer fwd in bwd instead of holding
    # residuals across the chain
    def lossR(h, x, m, *w):
        lay = jax.checkpoint(
            lambda hx, *w_: layer(hx[0], hx[1], m, *w_),
            static_argnums=())
        hx = (h, x)
        for _ in range(4):
            hx = lay(hx, *w)
        return jnp.sum(hx[0]) + jnp.sum(hx[1])

    gr = jax.jit(jax.grad(lossR, argnums=(0, 1, 3, 5, 7, 9)))
    timed("chain L=4 fwd+bwd (remat/layer)",
          lambda: gr(h_d, x_d, batch.ek5, *ws))


if __name__ == "__main__":
    main()
