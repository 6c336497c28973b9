"""Headline benchmark: FastEGNN training-step throughput in edges/s per chip.

Workload: Water-3D-scale synthetic geometry (8k-node graph, radius-graph
degree ~60, reference ``run_simulation.sh`` config: H=64, C=3, L=4, gravity,
MMD loss with per-graph sampling) — one fused train step (forward + MMD loss
+ backward + Adam), jit-compiled, steady-state timed.

Metric: ``edges/s`` = (edges * message-passing layers) / step_time — the
rate at which edge messages are produced AND aggregated through the whole
training step.

``vs_baseline`` = fraction of the single-chip speed-of-light estimate from a
roofline model (BASELINE.md "SpMM SoL %" north star):
  - compute bound: edge/virtual/node MLP FLOPs at peak bf16 MXU throughput;
  - memory bound: minimal HBM traffic for the edge path at peak bandwidth;
  - fwd+bwd cost 3x forward (two matmul transposes per Linear);
  SoL step time = max(compute, memory); vs_baseline = sol_time / measured.

Prints ONE JSON line.
"""

from __future__ import annotations

import os
import subprocess
import sys

# Fail fast instead of hanging forever when the axon TPU tunnel is wedged
# (a SIGTERM-killed TPU run can hold the pool grant server-side; then every
# backend init blocks in make_c_api_client).  Probe in a subprocess with a
# timeout BEFORE importing jax in this process; report honestly and exit
# nonzero — never print a fabricated metric line.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "_FASTEGNN_BENCH_NOPROBE"):
    import time as _time

    # A held pool grant can clear after minutes; retry the probe a few
    # times (~8 min total) before giving up so a transient wedge at the
    # exact moment bench.py starts doesn't cost the round's measurement.
    _probe_ok = False
    for _attempt in range(4):
        try:
            _probe_ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.default_backend()"],
                timeout=90, capture_output=True, check=False,
            ).returncode == 0
        except subprocess.TimeoutExpired:
            _probe_ok = False
        if _probe_ok:
            break
        sys.stderr.write(
            f"bench.py: TPU backend probe {_attempt + 1}/4 did not complete "
            "within 90 s; retrying...\n")
        _time.sleep(30)
    if not _probe_ok:
        sys.stderr.write(
            "bench.py: TPU backend init never completed — axon tunnel "
            "wedged/unavailable; refusing to hang or emit a fake metric.\n")
        sys.exit(1)

import json
import jax.numpy as jnp
import time

import numpy as np

# v5e peak numbers (per chip)
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BW = 819e9  # bytes/s


def _positions(n_nodes, degree, rng):
    """Water-3D-like geometry.  Prefers a real ``Water-3D`` h5 trajectory
    when present (``data/simulation/*.h5``); otherwise samples a clustered
    Gaussian mixture — real SPH water is strongly non-uniform, and the
    fat-tailed degree distribution is the regime that stresses the kernel's
    interval matching (VERDICT r1: "benchmark inputs are synthetic")."""
    import glob

    r = 0.035
    for pat in ("data/simulation/*.h5", "/root/data/Water-3D/*.h5"):
        hits = sorted(glob.glob(pat))
        if hits:
            try:
                import h5py

                with h5py.File(hits[0], "r") as f:
                    key = sorted(f.keys())[0]
                    pos = np.asarray(f[key]["position"])
                    frame = pos[0] if pos.ndim == 3 else pos
                    if frame.shape[0] >= n_nodes:
                        return frame[:n_nodes].astype(np.float32), r
            except Exception:
                pass
    vol = n_nodes * (4.0 / 3.0) * np.pi * r**3 / degree
    side = vol ** (1.0 / 3.0)
    K = 24  # Gaussian blobs -> strong density contrast
    centers = rng.random((K, 3)) * side
    assign = rng.integers(0, K, n_nodes)
    loc = centers[assign] + rng.normal(size=(n_nodes, 3)) * (side * 0.07)
    return np.clip(loc, 0, side).astype(np.float32), r


def build_batch(n_nodes=8000, degree=60, n_graphs=1, channels=3, seed=0):
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from fastegnn_tpu.ops.neighbors import radius_graph_np, sort_cutoff_np

    rng = np.random.default_rng(seed)
    raw = []
    for g in range(n_graphs):
        loc, r = _positions(n_nodes, degree, rng)
        vel = (rng.normal(size=(n_nodes, 3)) * 0.01).astype(np.float32)
        dst, src = radius_graph_np(loc, r)
        # calibrate the clustered geometry to the target MEAN degree while
        # keeping its density contrast (degree ~ r^3 * density)
        actual = dst.size / n_nodes
        if abs(actual - degree) > 0.15 * degree:
            loc = (loc * (actual / degree) ** (1.0 / 3.0)).astype(np.float32)
            dst, src = radius_graph_np(loc, r)
        dst, src = sort_cutoff_np(dst, src, loc, 0.0)
        d0 = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True).astype(
            np.float32
        )
        q = np.ones((n_nodes, 1), np.float32)
        raw.append(dict(
            node_feat=np.concatenate(
                [np.linalg.norm(vel, axis=1, keepdims=True), q], axis=1),
            coord=loc, vel=vel, dst=dst, src=src,
            edge_attr=np.concatenate([d0, d0], axis=1),
            coord_target=loc + vel, node_attr=q,
        ))
    # tight per-bucket sizing (5% slack, 1024-aligned) instead of a fixed
    # 35% overallocation — production buckets are sized from data
    e_max = max(r_["dst"].size for r_ in raw)
    max_edges = int(np.ceil(e_max * 1.05 / 1024) * 1024)
    spec = GraphSpec(
        max_nodes=n_nodes, max_edges=max_edges, n_graphs=n_graphs,
        edge_attr_dim=2, virtual_channels=channels,
    )
    # Morton-order nodes so the v3 kernel's source windows stay block-local
    graphs = [pad_graph(spec, **r_, spatial_sort=True) for r_ in raw]
    n_real_edges = sum(int(g["n_edges"]) for g in graphs)
    deg = np.concatenate(
        [np.bincount(r_["dst"], minlength=n_nodes) for r_ in raw]
    )
    stats = dict(
        edge_degree_p50=int(np.percentile(deg, 50)),
        edge_degree_p99=int(np.percentile(deg, 99)),
        edge_degree_max=int(deg.max()),
    )
    # v5 kernel packing config, overridable for sweeps:
    #   FASTEGNN_BENCH_EK5="chunk,W,G,D"
    import os

    cfg = os.environ.get("FASTEGNN_BENCH_EK5", "")
    kw = {}
    if cfg:
        vals = [int(v) for v in cfg.split(",")]
        c_, w_, g_, d_ = vals[:4]
        kw = dict(ek5_chunk=c_, ek5_window=w_, ek5_super=g_, ek5_dwin=d_)
        if len(vals) > 4:
            kw["ek5_sblocks"] = vals[4]
    return batch_graphs(graphs, spec, **kw), n_real_edges, stats


def _nonedge_flops(n_nodes, hidden, channels, layers):
    """fwd+bwd FLOPs of the dense (virtual/node/velocity) MLPs."""
    H, C = hidden, channels
    virt_mlp = n_nodes * C * ((2 * H + 1 + C) * H + H * H) * 2
    virt_gates = 3 * n_nodes * C * (H * H + H) * 2
    node_mlp = n_nodes * ((2 * H + C * H) * H + H * H) * 2
    vel_mlp = n_nodes * (H * H + H) * 2
    return layers * (virt_mlp + virt_gates + node_mlp + vel_mlp) * 3


def sol_step_time(n_edges, n_nodes, n_graphs, hidden=64, channels=3, layers=4):
    """MLP-only roofline: useful MLP FLOPs at peak bf16 MXU, fwd+bwd = 3x fwd,
    vs minimal HBM residual traffic.  This prices gather/scatter at ZERO —
    a bound no TPU implementation can reach (the hardware has no gather at
    MXU rate); kept as the continuity metric (``sol_mlp_ms``)."""
    H = hidden
    edge_mlp = n_edges * ((2 * H + 3) * H + H * H) * 2
    coord_gate = n_edges * (H * H + H) * 2
    flops_total = layers * (edge_mlp + coord_gate) * 3 + _nonedge_flops(
        n_nodes, hidden, channels, layers)
    bytes_total = layers * n_edges * (2 * H) * 4
    return max(flops_total / PEAK_BF16_FLOPS, bytes_total / PEAK_HBM_BW)


def sol_machinery_time(n_edges, n_nodes, n_graphs, hidden=64, channels=3,
                       layers=4, D=64, W=1):
    """Machinery-aware speed of light for the gather-MLP-scatter train step.

    TPU has no hardware gather/scatter at compute rate: the fastest known
    mechanism for per-edge gather/scatter of H-wide rows is the one-hot MXU
    matmul (dst window D rows, src window W*128 rows — the measured-optimal
    window sizes; see docs/PERF.md round-4 entry for the derivation and the
    sweep that fixed D/W).  This roofline counts the mandatory MXU MACs of
    that formulation with IDEAL execution: zero slot padding, 100% MXU
    utilisation, free VPU/transcendentals, free scheduling.  Every term is
    a per-edge MAC count an implementation of this algorithm class must
    execute; measured-vs-sol therefore isolates implementation losses
    (padding, small-dot efficiency, VPU serialisation, DMA floors).

    Per edge per layer (H=64; one MAC = 2 FLOPs):
      fwd: dst one-hot gather D*128 + src one-hot gather W*128*128
           (these FOLD the useful first edge-MLP layer: the gathered table
           rows are pre-multiplied h W1 + b1) + edge-attr fold 6*128
           + chain dots 2*H*H (W2, Wg1) + dst one-hot scatter D*128
      bwd: the same gathers again (recompute), the upstream-grad gather
           D*128, transposed chain dots 2*H*H, weight-grad dots
           2*H*H + 6*128 + 128, dst scatter D*128, src scatter W*128*128.
    """
    H = hidden
    g_dst, g_src, g_ea = D * 128, W * 128 * 128, 6 * 128
    chain = 2 * H * H
    fwd = g_dst + g_src + g_ea + chain + g_dst
    bwd = (g_dst + g_src + g_ea) + g_dst + chain + chain + (g_ea + 128) \
        + g_dst + g_src
    edge_flops = layers * n_edges * (fwd + bwd) * 2
    flops_total = edge_flops + _nonedge_flops(n_nodes, hidden, channels,
                                              layers)
    # mandatory HBM: the slot stream (8 i32 rows/edge, read in fwd AND bwd)
    # + the fwd/bwd node-table builds (read h, write [N, 256] cd)
    bytes_total = layers * (n_edges * 8 * 4 * 2 + n_nodes * 256 * 2 * 2)
    return max(flops_total / PEAK_BF16_FLOPS, bytes_total / PEAK_HBM_BW)


def main():
    import jax

    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.train import TrainState, torch_adam
    from fastegnn_tpu.train.step import make_train_step

    N_NODES, DEGREE, LAYERS, HIDDEN, C = 8000, 60, 4, 64, 3
    batch, n_real_edges, deg_stats = build_batch(N_NODES, DEGREE, channels=C)

    model = FastEGNN(
        hidden=HIDDEN, virtual_channels=C, n_layers=LAYERS,
        gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16",
    )
    params = model.init(jax.random.key(0), batch)["params"]
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    step = make_train_step(
        model, tx, sigma=1.0, weight=0.01, sample=3, per_graph_sampling=True
    )

    key = jax.random.key(1)
    # NOTE: through the axon TPU tunnel, jax.block_until_ready does NOT wait
    # for device completion — only a device->host readback does.  All timing
    # here syncs by fetching a scalar that depends on the full step, and
    # subtracts the measured readback overhead.
    state, metrics = step(state, batch, key)  # compile
    float(metrics["mse"])  # real sync

    def readback_overhead():
        t0 = time.perf_counter()
        float(jnp.sum(batch.coord[:8]))
        return time.perf_counter() - t0

    overhead = min(readback_overhead() for _ in range(3))

    n_iters = 100
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    float(metrics["mse"])  # sync the whole chain
    dt = max(time.perf_counter() - t0 - overhead, 1e-9) / n_iters

    # secondary: inference forward through the fused v2 kernel path
    model_f = FastEGNN(
        hidden=HIDDEN, virtual_channels=C, n_layers=LAYERS,
        gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16", fuse_edge=True,
    )
    fwd_fused = jax.jit(lambda p, g: model_f.apply({"params": p}, g)[0])
    # materialize the param pytree ONCE: state.params is an unravel property
    # and calling it per-iteration would dispatch 135 slices per call
    params_f = jax.tree.map(lambda a: a, state.params)
    r = fwd_fused(params_f, batch); float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(50):
        r = fwd_fused(params_f, batch)
    float(jnp.sum(r))
    fwd_ms = max(time.perf_counter() - t0 - overhead, 1e-9) / 50 * 1e3

    n_pad_edges = batch.num_edges
    edges_per_s = n_pad_edges * LAYERS / dt
    # headline roofline: machinery-aware (one-hot gather/scatter priced at
    # MXU rate with ideal packing — see sol_machinery_time docstring and
    # docs/PERF.md); sol_mlp is the old gather-free bound, kept for
    # continuity with BENCH_r01..r03
    sol_mlp = sol_step_time(n_pad_edges, N_NODES, 1, HIDDEN, C, LAYERS)
    sol = sol_machinery_time(n_real_edges, N_NODES, 1, HIDDEN, C, LAYERS)
    print(
        json.dumps(
            {
                "metric": "fastegnn_train_step_edge_rate",
                "value": round(edges_per_s / 1e6, 3),
                "unit": "M edge-messages/s/chip",
                "vs_baseline": round(sol / dt, 4),
                "detail": {
                    "step_ms": round(dt * 1e3, 3),
                    "fwd_fused_ms": round(fwd_ms, 3),
                    "sol_ms": round(sol * 1e3, 3),
                    "sol_mlp_ms": round(sol_mlp * 1e3, 3),
                    "vs_mlp_roofline": round(sol_mlp / dt, 4),
                    "nodes": N_NODES,
                    "edges_padded": n_pad_edges,
                    "edges_real": n_real_edges,
                    "layers": LAYERS,
                    "backend": jax.default_backend(),
                    **deg_stats,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
