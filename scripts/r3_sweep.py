"""Round-3 in-step v5 config sweep: (chunk, W, G, D) vs full train-step time.

For each packing config: rebuild the batch (host), time
  - kernel fwd (single pallas_call)
  - kernel fwd+bwd (custom_vjp grad)
  - FULL train step (fwd + MMD loss + bwd + Adam)
on the real chip, one process (compile cache shared).
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
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_train_step

import json as _json

CONFIGS = [
    (256, 2, 8, 128),   # current default
    (256, 1, 8, 128),
    (256, 1, 8, 64),
    (256, 1, 8, 32),
    (128, 1, 16, 32),
    (128, 1, 16, 64),
    (256, 2, 8, 64),
    (512, 2, 4, 128),
]
if os.environ.get("R3_SWEEP_CONFIGS"):
    CONFIGS = [tuple(c) for c in _json.loads(os.environ["R3_SWEEP_CONFIGS"])]


def main():
    t00 = time.time()
    stage = lambda s: print(f"[{time.time() - t00:7.1f}s] {s}", flush=True)

    rng = np.random.default_rng(0)
    H = 64
    h_np = rng.normal(size=(8000, H)).astype(np.float32)
    W1 = (rng.normal(size=(2 * H + 3, H)) * 0.1).astype(np.float32)
    b1 = np.zeros((H,), np.float32)
    W2 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    b2 = np.zeros((H,), np.float32)
    Wg1 = (rng.normal(size=(H, H)) * 0.1).astype(np.float32)
    bg1 = np.zeros((H,), np.float32)
    wg2 = (rng.normal(size=(H, 1)) * 0.01).astype(np.float32)
    ws = (W1, b1, W2, b2, Wg1, bg1, wg2)

    model = FastEGNN(hidden=H, virtual_channels=3, n_layers=4,
                     gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    tx = torch_adam(5e-4, 1e-12)
    key = jax.random.key(1)

    params = None
    state = None
    ov = None

    for (c_, w_, g_, d_) in CONFIGS:
        os.environ["FASTEGNN_BENCH_EK5"] = f"{c_},{w_},{g_},{d_}"
        batch, n_real, _ = build_batch(8000, 60, channels=3)
        meta = batch.ek5
        pad = 1 - n_real / meta.n_slots
        stage(f"config c{c_} W{w_} G{g_} D{d_}: slots={meta.n_slots} "
              f"super={meta.n_super} pad={pad:.1%}")

        if ov is None:
            def overhead():
                t0 = time.perf_counter()
                float(jnp.sum(batch.coord[:8]))
                return time.perf_counter() - t0
            float(jnp.sum(batch.coord[:8]))
            ov = min(overhead() for _ in range(3))
            stage(f"overhead {ov*1e3:.1f} ms")

        def timed(label, fn, n=50):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn()
            float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1]
                          .astype(jnp.float32)))
            dt = max(time.perf_counter() - t0 - ov, 1e-9) / n * 1e3
            print(f"  {label:<40s} {dt:9.3f} ms", flush=True)
            return dt

        # device-resident operands: numpy args / captured meta constants
        # re-upload through the tunnel EVERY call and inflate timings 10-20x
        h_d = jax.device_put(h_np)
        x_d = jax.device_put(batch.coord)
        ws_d = jax.device_put(ws)

        # kernel fwd (meta passed as a pytree ARG, not a closure constant)
        kf = jax.jit(lambda h, x, m, *ws_: fused_edge_block_v5(
            h, x, m, *ws_, compute_dtype=jnp.bfloat16))
        r = kf(h_d, x_d, meta, *ws_d)
        float(jnp.sum(r[0][:1]))
        timed("kernel fwd x1", lambda: kf(h_d, x_d, meta, *ws_d))

        # kernel fwd+bwd
        def loss1(h, x, m, *ws_):
            ms, ts = fused_edge_block_v5(
                h, x, m, *ws_, compute_dtype=jnp.bfloat16)
            return jnp.sum(ms) + jnp.sum(ts)
        kg = jax.jit(jax.grad(loss1, argnums=(0, 1, 3, 5, 7, 9)))
        r = kg(h_d, x_d, meta, *ws_d)
        float(jnp.sum(r[0][:1]))
        timed("kernel fwd+bwd x1", lambda: kg(h_d, x_d, meta, *ws_d))

        # full train step
        if os.environ.get("R3_SWEEP_KERNEL_ONLY"):
            continue
        if params is None:
            params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
            state = TrainState.create(params, tx)
        step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                               per_graph_sampling=True, donate=False)
        s, m = step(state, batch, key)
        float(m["mse"])

        def run_step():
            s, m = step(state, batch, key)
            return m["mse"]
        timed("train step", run_step)


if __name__ == "__main__":
    main()
