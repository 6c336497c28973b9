"""Water-3D PRODUCTION-batch train-step timing: 20 graphs x 8k nodes.

The reference's Water-3D recipe trains batch_size=20 on ~8k-particle graphs
(``main_simulation.py:46``, ``datasets/simulation/dataset.py``) — a ~160k
node / ~11.6M edge batch far beyond one v5 kernel call's VMEM envelope.
Round 4's GRAPH GROUPS split such batches into per-graph kernel calls, so
the fused path covers the production config (previously the v2 streaming
kernel, ~5x slower per edge, now deleted).

This script (a) checks group-fused vs unfused forward numerics ON CHIP at a
small 2-group size, then (b) times the full 20-graph production train step.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/water_prod_bench.py
"""

import os
import time

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_batch


def main():
    import sys
    do_check = "nocheck" not in sys.argv[1:]
    do_pipe = "nopipe" not in sys.argv[1:]
    only_pipe = "pipeonly" in sys.argv[1:]
    t00 = time.time()
    stage = lambda s: print(f"[{time.time() - t00:7.1f}s] {s}", flush=True)
    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.train import TrainState, torch_adam
    from fastegnn_tpu.train.step import make_train_step

    # ---- (a) on-chip numeric check of the group path (2 x 2000 nodes) ----
    import fastegnn_tpu.graph as gmod

    if do_check and not only_pipe:
        old = gmod.EK5_MAX_NODES
        gmod.EK5_MAX_NODES = 2048   # force grouping at this small size
        try:
            small, _, _ = build_batch(2000, 40, n_graphs=2, channels=3)
        finally:
            gmod.EK5_MAX_NODES = old
        assert small.ek5 is None and small.ek5_groups is not None, \
            "expected grouped metas"
        model = FastEGNN(hidden=64, virtual_channels=3, n_layers=2,
                         gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
        params = jax.jit(model.init)(jax.random.key(0), small)["params"]
        fwd_fused = jax.jit(
            lambda p, g: model.apply({"params": p}, g)[0])
        model_nf = FastEGNN(hidden=64, virtual_channels=3, n_layers=2,
                            gravity=(0.0, -1.0, 0.0),
                            compute_dtype="bfloat16", fuse_edge=False)
        fwd_plain = jax.jit(
            lambda p, g: model_nf.apply({"params": p}, g)[0])
        a = np.asarray(fwd_fused(params, small))
        b = np.asarray(fwd_plain(params, small))
        err = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9)
        stage(f"group-fused vs unfused fwd rel err on chip: {err:.2e}")
        assert err < 5e-3, "group path mismatch on hardware"

    # ---- (b) production batch ----
    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=4,
                     gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    tx = torch_adam(5e-4, 1e-12)
    step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True)
    key = jax.random.key(1)
    dt = float("nan")
    state = None
    if not only_pipe:
        stage("building 20 x 8000-node batch (host)")
        batch, n_real, _ = build_batch(8000, 60, n_graphs=20, channels=3)
        n_groups = len(batch.ek5_group_rows or ())
        stage(f"batch: {batch.num_nodes} nodes, {batch.num_edges} edge "
              f"slots, {n_real} real edges, {n_groups} kernel groups")
        params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
        state = TrainState.create(params, tx)
        state, m = step(state, batch, key)
        float(m["mse"])
        stage("compiled")

        # keys precomputed: a per-step fold_in is a tiny jit whose tunnel
        # dispatch costs ~3 ms/call (measured round 5)
        keys = [jax.random.fold_in(key, i) for i in range(20)]
        jax.block_until_ready(keys)
        t0 = time.perf_counter()
        n = 20
        for i in range(n):
            state, m = step(state, batch, keys[i])
        float(m["mse"])
        dt = (time.perf_counter() - t0) / n
        rate = batch.num_edges * 4 / dt
        print(f"production step: {dt * 1e3:.2f} ms for {n_real} real edges "
              f"x 4 layers -> {rate / 1e6:.0f} M edge-messages/s",
              flush=True)
    if not do_pipe:
        return

    # ---- (c) full host pipeline: fresh collation + H2D every step ----
    # The training loop never reuses a device batch across steps (epochs
    # re-collate); this measures wall-clock per step with the REAL
    # GraphDataset.iter_batches path (threaded collation; batch_graphs
    # uploads inside the worker, so H2D overlaps the device step).
    stage("pipeline: building a 60-graph dataset (3 batches/epoch)")
    from fastegnn_tpu.data.batcher import GraphDataset
    from fastegnn_tpu.graph import GraphSpec, pad_graph
    from bench import _positions
    from fastegnn_tpu.ops.neighbors import radius_graph_np, sort_cutoff_np

    rng = np.random.default_rng(7)
    raw = []
    for g in range(60):
        loc, r = _positions(8000, 60, rng)
        vel = (rng.normal(size=(8000, 3)) * 0.01).astype(np.float32)
        dstv, srcv = radius_graph_np(loc, r)
        dstv, srcv = sort_cutoff_np(dstv, srcv, loc, 0.0)
        d0 = np.linalg.norm(loc[dstv] - loc[srcv], axis=1,
                            keepdims=True).astype(np.float32)
        raw.append(dict(
            node_feat=np.concatenate(
                [np.linalg.norm(vel, axis=1, keepdims=True),
                 np.ones((8000, 1), np.float32)], axis=1),
            coord=loc, vel=vel, dst=dstv, src=srcv,
            edge_attr=np.concatenate([d0, d0], axis=1),
            coord_target=loc + vel,
            node_attr=np.ones((8000, 1), np.float32)))
    e_max = max(x["dst"].size for x in raw)
    spec = GraphSpec(max_nodes=8000,
                     max_edges=int(np.ceil(e_max * 1.05 / 1024) * 1024),
                     n_graphs=1, edge_attr_dim=2, virtual_channels=3)
    ds = GraphDataset([pad_graph(spec, **x, spatial_sort=True) for x in raw],
                      spec)
    stage("dataset built; compiling pipeline step")
    first = next(iter(ds.iter_batches(20, prefetch=0)))
    if state is None:
        params = jax.jit(model.init)(jax.random.key(0), first)["params"]
        state = TrainState.create(params, tx)
    state, m = step(state, first, key)
    float(m["mse"])
    stage("timing 3 epochs x 3 batches")
    keys = [jax.random.fold_in(key, 1000 + i) for i in range(9)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    steps = 0
    for ep in range(3):
        for b in ds.iter_batches(20, prefetch=2):
            state, m = step(state, b, keys[steps])
            steps += 1
    float(m["mse"])
    wall = (time.perf_counter() - t0) / steps
    print(f"pipeline wall: {wall * 1e3:.2f} ms/step over {steps} fresh "
          f"batches (device step {dt * 1e3:.2f} ms -> "
          f"wall/device = {wall / dt:.3f})", flush=True)


if __name__ == "__main__":
    main()
