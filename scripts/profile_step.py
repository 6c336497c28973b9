"""Component-level timing of the FastEGNN training step on the real TPU.

Times (steady-state, readback-synced):
  - full fused train step (the bench number)
  - forward only (unfused / fused)
  - value_and_grad of fwd only (no Adam)
  - isolated primitives: XLA take gather [E,128], Pallas CSR segment-sum,
    gather_dst / gather_src fwd, edge-MLP matmuls, virtual dense block, MMD.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_batch
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_train_step, make_loss_fn


def make_timer(batch):
    def readback():
        t0 = time.perf_counter()
        float(jnp.sum(batch.coord[:8]))
        return time.perf_counter() - t0

    overhead = min(readback() for _ in range(3))

    def timeit(fn, sync, n=50, label=""):
        fn()  # compile
        sync()
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        sync_out = sync(out) if sync.__code__.co_argcount else sync()
        dt = max(time.perf_counter() - t0 - overhead, 1e-9) / n * 1e3
        print(f"{label:<42s} {dt:9.3f} ms")
        return dt

    return timeit


def main():
    N_NODES, DEGREE, LAYERS, HIDDEN, C = 8000, 60, 4, 64, 3
    batch, n_real, _ = build_batch(N_NODES, DEGREE, channels=C)
    E = batch.num_edges
    print(f"nodes={N_NODES} edges_padded={E} backend={jax.default_backend()}")
    timeit = make_timer(batch)

    kw = dict(hidden=HIDDEN, virtual_channels=C, n_layers=LAYERS,
              gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    model = FastEGNN(**kw)
    model_f = FastEGNN(**kw, fuse_edge=True)
    model_1l = FastEGNN(**{**kw, "n_layers": 1})
    params = model.init(jax.random.key(0), batch)["params"]
    p1 = {k: v for k, v in params.items()
          if k in ("embedding_in", "gcl_0", "virtual_node_feat")}
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True, donate=False)
    key = jax.random.key(1)

    s2, m = step(state, batch, key); float(m["mse"])
    def run_step():
        _, mm = step(state, batch, key)
        return mm
    sync = lambda: float(jnp.sum(batch.coord[:8]))
    t0 = time.perf_counter()
    for i in range(50):
        _, mm = step(state, batch, jax.random.fold_in(key, i))
    float(mm["mse"])
    print(f"{'full train step':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    # forward only
    fwd = jax.jit(lambda p, g: model.apply({"params": p}, g)[0])
    fwd_f = jax.jit(lambda p, g: model_f.apply({"params": p}, g)[0])
    fwd_1l = jax.jit(lambda p, g: model_1l.apply({"params": p}, g)[0])
    for name, f in [("fwd unfused (4L)", fwd), ("fwd fused (4L)", fwd_f)]:
        f(params, batch); sync()
        t0 = time.perf_counter()
        for _ in range(50):
            r = f(params, batch)
        float(jnp.sum(r[:8]))
        print(f"{name:<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")
    fwd_1l(p1, batch); sync()
    t0 = time.perf_counter()
    for _ in range(50):
        r = fwd_1l(p1, batch)
    float(jnp.sum(r[:8]))
    print(f"{'fwd unfused (1L)':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    # grad only (no optimizer)
    loss_fn = make_loss_fn(model, 1.0, 0.01, 3, per_graph_sampling=True)
    gradf = jax.jit(lambda p, g, k: jax.value_and_grad(loss_fn, has_aux=True)(p, g, k))
    (l, _), gr = gradf(params, batch, key); float(l)
    t0 = time.perf_counter()
    for i in range(50):
        (l, _), gr = gradf(params, batch, jax.random.fold_in(key, i))
    float(l)
    print(f"{'value_and_grad (no Adam, with MMD)':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    # loss without MMD grad
    loss_nm = make_loss_fn(model, 1.0, 0.01, 3, per_graph_sampling=True, use_mmd=False)
    gradnm = jax.jit(lambda p, g, k: jax.value_and_grad(loss_nm, has_aux=True)(p, g, k))
    (l, _), gr = gradnm(params, batch, key); float(l)
    t0 = time.perf_counter()
    for i in range(50):
        (l, _), gr = gradnm(params, batch, jax.random.fold_in(key, i))
    float(l)
    print(f"{'value_and_grad (no MMD)':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    # ------- primitives -------
    from fastegnn_tpu.ops.spmm import sorted_segment_sum_csr, gather_dst, gather_src

    hx = jnp.zeros((N_NODES, 128), jnp.bfloat16) + 1.0
    edata = jnp.zeros((E, 128), jnp.bfloat16) + 1.0
    edata32 = edata.astype(jnp.float32)

    take = jax.jit(lambda h: jnp.take(h, batch.src, axis=0, mode="clip"))
    take(hx)
    t0 = time.perf_counter()
    for _ in range(50):
        r = take(hx)
    float(jnp.sum(r[:8].astype(jnp.float32)))
    print(f"{'XLA take [8000,128]bf16 -> [E,128]':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    css = jax.jit(lambda d: sorted_segment_sum_csr(d, batch.dst, batch.csr_dst, N_NODES))
    css(edata)
    t0 = time.perf_counter()
    for _ in range(50):
        r = css(edata)
    float(jnp.sum(r[:8]))
    print(f"{'Pallas CSR segsum [E,128]bf16':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    gd = jax.jit(lambda h: gather_dst(h, batch.dst, batch.csr_dst))
    gd(hx)
    t0 = time.perf_counter()
    for _ in range(50):
        r = gd(hx)
    float(jnp.sum(r[:8].astype(jnp.float32)))
    print(f"{'gather_dst fwd':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    # edge MLP matmuls alone (bf16)
    W1 = jnp.zeros((128, 128), jnp.bfloat16)
    mlp = jax.jit(lambda d: jax.nn.silu(jax.nn.silu(d @ W1) @ W1))
    mlp(edata)
    t0 = time.perf_counter()
    for _ in range(50):
        r = mlp(edata)
    float(jnp.sum(r[:8].astype(jnp.float32)))
    print(f"{'edge MLP 2x[E,128]@[128,128] bf16':<42s} {(time.perf_counter()-t0)/50*1e3:9.3f} ms")

    # scatter via XLA segment_sum for comparison
    seg = jax.jit(lambda d: jax.ops.segment_sum(d, batch.dst, num_segments=N_NODES+1, indices_are_sorted=True))
    seg(edata32)
    t0 = time.perf_counter()
    for _ in range(20):
        r = seg(edata32)
    float(jnp.sum(r[:8]))
    print(f"{'XLA segment_sum [E,128]f32':<42s} {(time.perf_counter()-t0)/20*1e3:9.3f} ms")


if __name__ == "__main__":
    main()
