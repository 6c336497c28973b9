"""Dissect the non-edge-kernel cost of the train step.

Variants (all with the edge kernel monkeypatched to zeros):
  full        — step as-is (grad + Adam)
  fwd-only    — loss value only, no grad
  grad-only   — grad but no optimizer update
  no-virtual  — virtual dense block also zeroed (via C-channel MLPs patched)
"""

import time

import jax
import jax.numpy as jnp

from bench import build_batch
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_train_step
import fastegnn_tpu.ops.edge_kernel_v3 as ek3


def timed(label, fn, sync, n=50):
    fn(); sync()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    sync()
    print(f"{label:<44s} {(time.perf_counter() - t0) / n * 1e3:9.3f} ms")


def main():
    batch, _, _ = build_batch(8000, 60, channels=3)
    sync = lambda: float(jnp.sum(batch.coord[:8]))
    kw = dict(hidden=64, virtual_channels=3, n_layers=4,
              gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    model = FastEGNN(**kw)
    params = model.init(jax.random.key(0), batch)["params"]
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    key = jax.random.key(1)

    def fake(h, x, meta, *w, compute_dtype=jnp.float32):
        N = h.shape[0]
        s = jnp.sum(h) * 0.0 + jnp.sum(x) * 0.0
        for wi in w:
            s = s + jnp.sum(wi) * 0.0
        return (jnp.zeros((N, 64)) + s, jnp.zeros((N, 3)) + s)

    ek3.fused_edge_block_v3 = fake

    step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True, donate=False)
    s, m = step(state, batch, key); float(m["mse"])
    timed("step kernel->0 (grad+adam)", lambda: step(state, batch, key), sync)

    # fwd-only loss
    from fastegnn_tpu.train.step import make_loss_fn
    try:
        loss_fn = make_loss_fn(model, sigma=1.0, weight=0.01, sample=3,
                               per_graph_sampling=True)
        lf = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
        float(lf(params, batch, key))
        timed("fwd loss only (kernel->0)", lambda: lf(params, batch, key), sync)
    except Exception as e:
        print("fwd-only variant failed:", str(e)[:200])

    # grad-only
    try:
        gf = jax.jit(jax.grad(lambda p, b, k: loss_fn(p, b, k)[0]))
        r = gf(params, batch, key); float(jax.tree.leaves(r)[0].ravel()[0])
        timed("grad only, no adam (kernel->0)", lambda: gf(params, batch, key), sync)
    except Exception as e:
        print("grad-only variant failed:", str(e)[:200])

    # plain model fwd
    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b))
    r = fwd(params, batch); float(r[0][0, 0])
    timed("model fwd only (kernel->0)", lambda: fwd(params, batch), sync)


if __name__ == "__main__":
    main()
