"""Split the v3-era train step cost: edge kernel vs everything else.

Times the full train step with (a) the real v3 kernel, (b) the kernel
monkeypatched to return zeros (isolating every non-edge cost: virtual dense
block, node MLPs, MMD, Adam, loss), and (c) no-MMD variants.
"""

import time

import jax
import jax.numpy as jnp

from bench import build_batch
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_train_step


def timed(label, fn, sync, n=50):
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
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

    step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True, donate=False)
    s, m = step(state, batch, key); float(m["mse"])
    timed("step (v3 kernel)", lambda: step(state, batch, key), sync)

    import fastegnn_tpu.ops.edge_kernel_v3 as ek3
    import fastegnn_tpu.models.fast_egnn as fe

    real = ek3.fused_edge_block_v3

    def fake(h, x, meta, *w, compute_dtype=jnp.float32):
        N = h.shape[0]
        s = jnp.sum(h) * 0.0 + jnp.sum(x) * 0.0
        for wi in w:
            s = s + jnp.sum(wi) * 0.0
        return (jnp.zeros((N, 64)) + s, jnp.zeros((N, 3)) + s)

    fe_mod_ref = fe  # the model imports inside the function body; patch module attr
    ek3.fused_edge_block_v3 = fake
    step2 = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                            per_graph_sampling=True, donate=False)
    s, m = step2(state, batch, key); float(m["mse"])
    timed("step (edge kernel -> zeros)", lambda: step2(state, batch, key), sync)
    ek3.fused_edge_block_v3 = real

    # no-MMD
    step3 = make_train_step(model, tx, sigma=1.0, weight=0.0, sample=3,
                            per_graph_sampling=True, donate=False, use_mmd=False)
    try:
        s, m = step3(state, batch, key); float(m["mse"])
        timed("step (no MMD)", lambda: step3(state, batch, key), sync)
    except TypeError:
        pass


if __name__ == "__main__":
    main()
