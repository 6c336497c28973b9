"""Scaling-efficiency harness: edges/s vs device count (weak scaling).

BASELINE.md target: >= 80% edges/s efficiency 1 chip -> 1 host -> N hosts.
Real multi-chip hardware is not available in this environment, so the
harness runs the REAL parallel code paths (owner-sharded graph parallelism
+ data parallelism over a DCN x ICI hybrid mesh) on virtual host-platform
devices: it validates the sharding/collective structure and measures the
per-shard work; absolute efficiency numbers become meaningful the day it
runs on a pod (same command, no code changes).

Weak scaling: each graph shard owns a fixed node/edge budget; the graph
grows with G.  Prints one JSON line per mesh shape.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py [--platform cpu] [--nodes-per-shard 512]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_batch(n_nodes: int, seed: int = 0):
    import jax  # noqa: F401
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from fastegnn_tpu.ops.neighbors import radius_graph_np

    rng = np.random.default_rng(seed)
    loc = rng.random((n_nodes, 3)).astype(np.float32)
    # Morton (Z-order) sort: contiguous owner ranges become compact 3D
    # blocks, so halo fraction scales with block surface x radius instead
    # of slab thickness (an x-sort gives slabs whose width shrinks ~1/G
    # and saturates the halo at moderate G)
    from fastegnn_tpu.graph import morton_order

    loc = loc[morton_order(loc)]
    vel = rng.normal(size=(n_nodes, 3)).astype(np.float32) * 0.1
    r = (20.0 / n_nodes) ** (1 / 3) * 0.7  # ~constant expected degree
    dst, src = radius_graph_np(loc, r)
    o = np.argsort(dst, kind="stable")
    dst, src = dst[o].astype(np.int32), src[o].astype(np.int32)
    d0 = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True)
    spec = GraphSpec(max_nodes=n_nodes, max_edges=dst.size, n_graphs=1,
                     edge_attr_dim=2, virtual_channels=3)
    g = pad_graph(
        spec,
        node_feat=np.concatenate(
            [np.linalg.norm(vel, axis=1, keepdims=True),
             np.ones((n_nodes, 1), np.float32)], axis=1),
        coord=loc, vel=vel, dst=dst, src=src,
        edge_attr=np.concatenate([d0, d0], 1).astype(np.float32),
        coord_target=loc + vel,
    )
    return batch_graphs([g], spec, edge_align=256), dst.size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--nodes-per-shard", type=int, default=512)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platform_name", args.platform)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.parallel.owner_graph import (
        make_owner_gp_train_step,
        make_owner_sharded_batch,
    )
    from fastegnn_tpu.train import TrainState, torch_adam

    devices = jax.devices()
    shapes = [g for g in (1, 2, 4, 8) if g <= len(devices)]
    base_rate = None
    results = []
    for G in shapes:
        n = args.nodes_per_shard * G
        batch, n_edges = build_batch(n)
        sb = make_owner_sharded_batch(batch, G)
        mesh = Mesh(np.asarray(devices[:G]), ("graph",))
        model = FastEGNN(hidden=64, virtual_channels=3,
                         n_layers=args.layers)
        params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
        tx = torch_adam(5e-4, 1e-12)
        state = TrainState.create(params, tx)
        step = make_owner_gp_train_step(
            tx, mesh, axis="graph", n_layers=args.layers,
            sigma=1.5, weight=0.01,
        )
        key = jax.random.key(1)
        state, m = step(state, sb, key)
        float(m["mse"])  # sync
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step(state, sb, jax.random.fold_in(key, i))
        float(m["mse"])
        dt = (time.perf_counter() - t0) / args.iters
        rate = n_edges * args.layers / dt
        if base_rate is None:
            base_rate = rate / G  # per-device rate at G=1
        eff = rate / (G * base_rate)
        from fastegnn_tpu.parallel.owner_graph import halo_pair_rows

        halo = int(sb.send_idx.shape[-1])
        halo_total = halo_pair_rows(batch, G)
        # comm accounting: per-layer all_to_all payload (padded) vs the
        # real boundary-pair rows; 67 f32s per row ([h|x], H=64)
        row_bytes = (64 + 3) * 4
        results.append(dict(devices=G, nodes=n, edges=n_edges,
                            step_ms=round(dt * 1e3, 2),
                            medges_per_s=round(rate / 1e6, 2),
                            efficiency=round(eff, 3),
                            halo_rows_max_pair=halo,
                            halo_rows_total=halo_total,
                            halo_kb_per_layer=round(
                                halo_total * row_bytes / 1024, 1),
                            halo_kb_padded=round(
                                G * G * halo * row_bytes / 1024, 1)))
        print(json.dumps({"metric": "gp_weak_scaling", **results[-1]}),
              flush=True)
    return results


if __name__ == "__main__":
    main()
