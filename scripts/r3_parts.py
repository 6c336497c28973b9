"""Round-3 step dissection at bench geometry (current v5-kernel step).

Times, on the real chip:
  1. full train step (grad + Adam) — should reproduce BENCH_r02 ~14.5 ms
  2. the same with the v5 kernel patched to zeros (non-kernel total)
  3. fwd loss only / fwd loss kernel->0
  4. model fwd only / kernel->0 / kernel->0 + vblock->0
  5. loss-only given a fixed prediction (MMD + MSE share)
  6. Adam-only on the flat param vector
  7. v5 kernel standalone: 4 chained layers fwd and fwd+bwd
Optionally sweeps in-step v5 packing configs via FASTEGNN_BENCH_EK5.
"""

import os
import time

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax
import jax.numpy as jnp

from bench import build_batch
import fastegnn_tpu.models.fast_egnn as fe
import fastegnn_tpu.ops.edge_kernel_v5 as ek5mod
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_loss_fn, make_train_step


def main():
    t00 = time.time()
    stage = lambda s: print(f"[{time.time() - t00:7.1f}s] {s}", flush=True)
    stage("building batch")
    batch, n_real, _ = build_batch(8000, 60, channels=3)
    stage("batch built")
    sync = lambda: float(jnp.sum(batch.coord[:8]))

    def overhead():
        t0 = time.perf_counter()
        sync()
        return time.perf_counter() - t0

    ov = min(overhead() for _ in range(3))
    stage(f"sync overhead {ov * 1e3:.1f} ms")

    def timed(label, fn, n=50):
        fn(); sync()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        sync()
        dt = max(time.perf_counter() - t0 - ov, 1e-9) / n * 1e3
        print(f"{label:<52s} {dt:9.3f} ms", flush=True)
        return dt

    kw = dict(hidden=64, virtual_channels=3, n_layers=4,
              gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    model = FastEGNN(**kw)
    # eager init pays a tunnel round trip per op — always jit it on axon
    params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
    stage("init done")
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    key = jax.random.key(1)
    print(f"backend={jax.default_backend()} edges_pad={batch.num_edges} "
          f"real={n_real}", flush=True)

    # ---------- real step ----------
    step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True, donate=False)
    s, m = step(state, batch, key); float(m["mse"])
    timed("step FULL (grad+adam)", lambda: step(state, batch, key))

    loss_fn = make_loss_fn(model, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True)
    lf = jax.jit(lambda p, b, k: loss_fn(p, b, k)[0])
    float(lf(params, batch, key))
    timed("fwd loss only", lambda: lf(params, batch, key))

    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b))
    r = fwd(params, batch); float(r[0][0, 0])
    timed("model fwd only", lambda: fwd(params, batch))

    gf = jax.jit(jax.grad(lambda p, b, k: loss_fn(p, b, k)[0]))
    g = gf(params, batch, key); float(jax.tree.leaves(g)[0].ravel()[0])
    timed("grad only, no adam", lambda: gf(params, batch, key))

    # ---------- loss-only (MMD share) ----------
    pred = r[0]
    vloc = r[1]
    from fastegnn_tpu.train.loss import masked_mse, mmd_loss

    def loss_only(pred, vloc, b, k):
        mse = masked_mse(pred, b.coord_target, b.node_mask)
        mmd = mmd_loss(pred, vloc, b, k, 1.0, 3, True)
        return mse + 0.01 * mmd

    lo = jax.jit(loss_only)
    float(lo(pred, vloc, batch, key))
    timed("loss only (MSE+MMD, given pred)", lambda: lo(pred, vloc, batch, key))

    glo = jax.jit(jax.grad(loss_only, argnums=(0, 1)))
    gg = glo(pred, vloc, batch, key); float(gg[0][0, 0])
    timed("loss only fwd+bwd", lambda: glo(pred, vloc, batch, key))

    # ---------- adam only ----------
    flat = state.flat_params
    fake_g = flat * 1e-3

    def adam_only(fl, gr, os_):
        up, os2 = tx.update(gr, os_, fl)
        import optax
        return optax.apply_updates(fl, up), os2

    ao = jax.jit(adam_only)
    r2 = ao(flat, fake_g, state.opt_state); float(r2[0][0])
    timed("adam only (flat vector)", lambda: ao(flat, fake_g, state.opt_state))

    # ---------- kernel standalone: 4 chained layers ----------
    p0 = params["gcl_0"]
    H = 64
    import numpy as np
    eyeE = jnp.eye(2 * H + 3, dtype=jnp.float32)
    eyeH = jnp.eye(H, dtype=jnp.float32)
    W1 = p0["edge_mlp_lin0"]["kernel"]; b1 = p0["edge_mlp_lin0"]["bias"]
    W2 = p0["edge_mlp_lin1"]["kernel"]; b2 = p0["edge_mlp_lin1"]["bias"]
    Wg1 = p0["coord_mlp_r_lin0"]["kernel"]; bg1 = p0["coord_mlp_r_lin0"]["bias"]
    wg2 = p0["coord_mlp_r_head"]["kernel"]
    h0 = jax.random.normal(jax.random.key(2), (batch.coord.shape[0], H))

    def k4(h, x, *w):
        for _ in range(4):
            ms, ts = ek5mod.fused_edge_block_v5(
                h, x, batch.ek5, *w, compute_dtype=jnp.bfloat16)
            h = h + ms * 1e-3
            x = x + ts * 1e-3
        return h, x

    k4j = jax.jit(k4)
    rr = k4j(h0, batch.coord, W1, b1, W2, b2, Wg1, bg1, wg2); float(rr[0][0, 0])
    timed("v5 kernel x4 fwd (chained)",
          lambda: k4j(h0, batch.coord, W1, b1, W2, b2, Wg1, bg1, wg2))

    k4g = jax.jit(jax.grad(
        lambda h, x, *w: jnp.sum(k4(h, x, *w)[0]) + jnp.sum(k4(h, x, *w)[1]),
        argnums=(0, 1, 2, 4, 6, 8)))
    # note: calling k4 twice inside — XLA CSEs the duplicate forward
    rr = k4g(h0, batch.coord, W1, b1, W2, b2, Wg1, bg1, wg2); float(rr[0][0, 0])
    timed("v5 kernel x4 fwd+bwd (chained)",
          lambda: k4g(h0, batch.coord, W1, b1, W2, b2, Wg1, bg1, wg2))

    # ---------- kernel -> zeros ----------
    real_v5 = ek5mod.fused_edge_block_v5

    def fake_v5(h, x, meta, *w, compute_dtype=jnp.float32):
        N = h.shape[0]
        s = jnp.sum(h) * 0.0 + jnp.sum(x) * 0.0
        for wi in w:
            s = s + jnp.sum(wi) * 0.0
        return (jnp.zeros((N, 64)) + s, jnp.zeros((N, 3)) + s)

    ek5mod.fused_edge_block_v5 = fake_v5
    try:
        step0 = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                                per_graph_sampling=True, donate=False)
        s, m = step0(state, batch, key); float(m["mse"])
        timed("step kernel->0 (grad+adam)", lambda: step0(state, batch, key))

        loss_fn0 = make_loss_fn(model, sigma=1.0, weight=0.01, sample=3,
                                per_graph_sampling=True)
        lf0 = jax.jit(lambda p, b, k: loss_fn0(p, b, k)[0])
        float(lf0(params, batch, key))
        timed("fwd loss kernel->0", lambda: lf0(params, batch, key))

        fwd0 = jax.jit(lambda p, b: model.apply({"params": p}, b))
        r = fwd0(params, batch); float(r[0][0, 0])
        timed("model fwd kernel->0", lambda: fwd0(params, batch))

        # vblock also zeroed: fwd is then kernel-zero + extraction + embed
        real_vu = fe.virtual_and_node_update

        def fake_vu(cfg, w, h_l, x_l, v_l, vx, vh, gid_l, agg_x_l, agg_e_l,
                    *, take, pool, gravity=None, node_attr=None):
            z = jnp.sum(agg_x_l) * 0.0 + jnp.sum(agg_e_l) * 0.0
            return h_l + z, x_l + z, vx + z, vh + z

        fe.virtual_and_node_update = fake_vu
        try:
            fwd00 = jax.jit(lambda p, b: model.apply({"params": p}, b))
            r = fwd00(params, batch); float(r[0][0, 0])
            timed("model fwd kernel->0 vblock->0 (extraction+embed)",
                  lambda: fwd00(params, batch))
            gf00 = jax.jit(jax.grad(
                lambda p, b: jnp.sum(model.apply({"params": p}, b)[0])))
            g = gf00(params, batch); float(jax.tree.leaves(g)[0].ravel()[0])
            timed("model fwd+bwd kernel->0 vblock->0",
                  lambda: gf00(params, batch))
        finally:
            fe.virtual_and_node_update = real_vu

        gf0 = jax.jit(jax.grad(lambda p, b, k: loss_fn0(p, b, k)[0]))
        g = gf0(params, batch, key); float(jax.tree.leaves(g)[0].ravel()[0])
        timed("grad kernel->0, no adam", lambda: gf0(params, batch, key))
    finally:
        ek5mod.fused_edge_block_v5 = real_v5


if __name__ == "__main__":
    main()
