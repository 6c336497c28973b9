"""Round-4: xplane trace of the FULL production train step at bench geometry.

Aggregates device-lane op durations by op-name family so the 12.1 ms step
decomposes exactly (kernels / vblock dots / loss / Adam / glue).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_profile_step.py
"""

import collections
import os
import re

os.environ.setdefault("_FASTEGNN_BENCH_NOPROBE", "1")

import jax

from bench import build_batch
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_train_step
from profile_trace import parse_trace


def main():
    batch, n_real, _ = build_batch(8000, 60, channels=3)
    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=4,
                     gravity=(0.0, -1.0, 0.0), compute_dtype="bfloat16")
    params = jax.jit(model.init)(jax.random.key(0), batch)["params"]
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, sigma=1.0, weight=0.01, sample=3,
                           per_graph_sampling=True, donate=False)
    key = jax.random.key(1)
    s, m = step(state, batch, key)
    float(m["mse"])

    logdir = "/tmp/r4_step_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for i in range(10):
        s, m = step(state, batch, key)
    float(m["mse"])
    jax.profiler.stop_trace()

    rows, counts = parse_trace(logdir)
    ops = {(n, line): us for (p, line, n), us in rows.items()
           if line == "XLA Ops"}
    total = sum(ops.values())
    print(f"device XLA-op total over 10 steps: {total/1e3:.3f} ms "
          f"({total/1e4:.3f} ms/step)\n")

    fam = collections.Counter()
    for (n, _), us in ops.items():
        if "bwd_impl" in n:
            f = "pallas bwd kernel"
        elif "fwd_impl" in n:
            f = "pallas fwd kernel"
        else:
            f = re.sub(r"[.\d]+$", "", n)
        fam[f] += us
    for f, us in fam.most_common(40):
        print(f"  {us/1e4:9.4f} ms/step  {f}")
    print()
    singles = collections.Counter(
        {n: us for (n, _), us in ops.items()
         if "impl" not in n})
    for n, us in singles.most_common(30):
        print(f"  {us/1e4:9.4f} ms/step  {n[:120]}")


if __name__ == "__main__":
    main()
