"""Round-4: xplane trace dissection of the chained v5 fwd+bwd anomaly.

r3_chain measured (on chip): L=1 fwd+bwd 1.83 ms, L=4 chained 9.48 ms
(2.37/layer), 4 INDEPENDENT layers 6.83 ms (1.71/layer) — chaining itself
costs ~0.66 ms/layer and remat does not recover it.  This script captures a
jax.profiler trace of the chained-4 grad and aggregates device-plane op
durations to name the cost.

Usage: PYTHONPATH=/root/repo python scripts/r4_profile_chain.py [indep]
"""

import collections
import glob
import os
import sys
import time

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_batch
from fastegnn_tpu.ops.edge_kernel_v5 import fused_edge_block_v5


def parse_trace(logdir):
    """Aggregate device-lane op durations from the Chrome trace.json.gz."""
    import gzip
    import json

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace.json.gz under {logdir}"
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    pid_name = {}
    tid_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_name[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    rows = collections.Counter()
    counts = collections.Counter()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_name.get(ev.get("pid"), "")
        tname = tid_name.get((ev.get("pid"), ev.get("tid")), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        rows[(pname, tname, ev["name"])] += ev.get("dur", 0)
        counts[(pname, tname, ev["name"])] += 1
    return rows, counts


def main():
    indep = "indep" in sys.argv[1:]
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

    def layer(h, x, m, *w):
        ms, ts = fused_edge_block_v5(h, x, m, *w, compute_dtype=jnp.bfloat16)
        return h + ms * 1e-3, x + ts * 1e-3

    if indep:
        def loss(h, x, m, *w):
            tot = 0.0
            for i in range(4):
                hh, xx = layer(h + i * 1e-3, x, m, *w)
                tot = tot + jnp.sum(hh) + jnp.sum(xx)
            return tot
    else:
        def loss(h, x, m, *w):
            for _ in range(4):
                h, x = layer(h, x, m, *w)
            return jnp.sum(h) + jnp.sum(x)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 3, 5, 7, 9)))
    r = g(h_d, x_d, batch.ek5, *ws)
    float(jnp.ravel(r[0])[0])

    logdir = f"/tmp/r4_chain_trace_{'indep' if indep else 'chain'}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(10):
        r = g(h_d, x_d, batch.ek5, *ws)
    float(jnp.ravel(r[0])[0])
    jax.profiler.stop_trace()

    rows, counts = parse_trace(logdir)
    total = sum(rows.values())
    print(f"\n==== {'independent' if indep else 'chained'} L=4 fwd+bwd, "
          f"10 steps, device-lane total {total/1e3:.3f} ms ====")
    by_line = collections.Counter()
    for (plane, line, name), us in rows.items():
        by_line[(plane, line)] += us
    for (plane, line), us in by_line.most_common(12):
        print(f"  [lane] {plane} :: {line:<24s} {us/1e3:9.3f} ms")
    print()
    for (plane, line, name), us in rows.most_common(48):
        n = counts[(plane, line, name)]
        print(f"  {us/1e3:9.3f} ms  x{n:<5d} {line:<12.12s} {name[:110]}")


if __name__ == "__main__":
    main()
