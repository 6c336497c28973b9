"""Time the PRODUCTION fused_edge_block_v5 across (chunk, W, G, D) configs.

Meta arrays travel as jit arguments (struct pytree) — never closure
captures (axon re-uploads captured constants per call).  Timing subtracts
one readback (~28 ms through the tunnel).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from v4_lab import build_graph  # noqa: E402

from fastegnn_tpu.ops.edge_kernel_v5 import (  # noqa: E402
    fused_edge_block_v5, make_v5_meta)

H = 64


def timeit(fn, label, n=50):
    try:
        r = fn()
        float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    except Exception as e:
        print(f"{label}: FAIL {str(e)[:250]}")
        return None
    z = jnp.zeros((8,), jnp.float32)
    float(jnp.sum(z))
    t0 = time.perf_counter()
    float(jnp.sum(z))
    sync = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(jnp.sum(jax.tree.leaves(r)[0][:8].astype(jnp.float32)))
    dt = max(time.perf_counter() - t0 - sync, 1e-9) / n * 1e3
    print(f"{label:<44s} {dt:8.3f} ms")
    return dt


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(1)
    N, DEG = 8000, 60
    loc, dst, src, ea, _ = build_graph(N, DEG)
    E = dst.size
    h = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    x = jnp.asarray(loc)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
    ws = (r(2 * H + 1 + 2, H), r(H), r(H, H), r(H), r(H, H), r(H), r(H, 1))
    cot_m = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    cot_t = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    fwd_j = jax.jit(functools.partial(
        fused_edge_block_v5, compute_dtype=jnp.bfloat16))

    @jax.jit
    def grad_j(h, x, meta, cot_m, cot_t, *ws):
        def loss(h, x):
            m, t = fused_edge_block_v5(h, x, meta, *ws,
                                       compute_dtype=jnp.bfloat16)
            return jnp.sum(m * cot_m) + jnp.sum(t * cot_t)
        return jax.grad(loss, argnums=(0, 1))(h, x)

    configs = [(256, 2, 8, 128), (128, 2, 8, 32), (128, 2, 16, 32),
               (128, 1, 8, 32), (256, 2, 8, 64), (128, 2, 8, 64)]
    if len(sys.argv) > 1:
        configs = configs[: int(sys.argv[1])]
    for chunk, W, G, D in configs:
        meta = make_v5_meta(dst, src, ea, np.ones(E, bool), N,
                            chunk=chunk, W=W, G=G, D=D)
        pad = (meta.n_slots - E) / E * 100
        tag = f"c{chunk} W{W} G{G} D{D} (pad {pad:.1f}%)"
        dt = timeit(lambda: fwd_j(h, x, meta, *ws), f"v5 fwd {tag}")
        if dt:
            print(f"   -> {E / (dt / 1e3) / 1e6:.0f} M edges/s")
        dt = timeit(lambda: grad_j(h, x, meta, cot_m, cot_t, *ws),
                    f"v5 fwd+bwd {tag}")
        if dt:
            print(f"   -> {E / (dt / 1e3) / 1e6:.0f} M edges/s train-equiv")


if __name__ == "__main__":
    main()
