"""Round-3 follow-up: correct chained-kernel bwd cost + model-level marginals.

The r3_parts.py "v5 kernel x4 fwd+bwd" measurement accidentally traced the
forward twice (grad of sum(k4()[0]) + sum(k4()[1]) — two separate calls are
not CSE'd across pallas custom_vjp), doubling everything.  Here:
  - k4 fwd / fwd+bwd with a SINGLE forward
  - model(n_layers) fwd and fwd+bwd for n_layers in (1, 4): marginal layer
  - model fwd+bwd with pytree grads vs flat-vector grads (ravel machinery)
"""

import os
import time

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_batch
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.ops.edge_kernel_v5 import fused_edge_block_v5
from fastegnn_tpu.train.step import TrainState
from fastegnn_tpu.train import torch_adam


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

    def overhead():
        t0 = time.perf_counter()
        float(jnp.sum(batch.coord[:8]))
        return time.perf_counter() - t0

    float(jnp.sum(batch.coord[:8]))
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
        print(f"{label:<52s} {dt:9.3f} ms", flush=True)
        return dt

    def k4(h, x, m, *w):
        for _ in range(4):
            ms, ts = fused_edge_block_v5(h, x, m, *w,
                                         compute_dtype=jnp.bfloat16)
            h = h + ms * 1e-3
            x = x + ts * 1e-3
        return h, x

    k4j = jax.jit(k4)
    timed("v5 x4 fwd (chained)", lambda: k4j(h_d, x_d, batch.ek5, *ws))

    def loss4(h, x, m, *w):
        hh, xx = k4(h, x, m, *w)   # ONE forward
        return jnp.sum(hh) + jnp.sum(xx)

    k4g = jax.jit(jax.grad(loss4, argnums=(0, 1, 3, 5, 7, 9)))
    timed("v5 x4 fwd+bwd (single fwd)",
          lambda: k4g(h_d, x_d, batch.ek5, *ws))

    tx = torch_adam(5e-4, 1e-12)
    for L in (1, 4):
        model = FastEGNN(hidden=H, virtual_channels=3, n_layers=L,
                         gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
        params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
        fwd = jax.jit(lambda p, b: model.apply({"params": p}, b))
        timed(f"model L={L} fwd", lambda: fwd(params, batch))
        gsum = jax.jit(jax.grad(
            lambda p, b: jnp.sum(model.apply({"params": p}, b)[0])))
        timed(f"model L={L} fwd+bwd (pytree grads)",
              lambda: gsum(params, batch))
        if L == 4:
            state = TrainState.create(params, tx)
            gflat = jax.jit(jax.grad(
                lambda pf, b: jnp.sum(model.apply(
                    {"params": state.unravel(pf)}, b)[0])))
            timed("model L=4 fwd+bwd (flat-vector grads)",
                  lambda: gflat(state.flat_params, batch))


if __name__ == "__main__":
    main()
