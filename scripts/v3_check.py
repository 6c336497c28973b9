"""Minimal correctness check: fused_edge_block_v3 vs plain jnp composition.

Run CPU (interpret) or TPU. Small graph, f32, deterministic.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from fastegnn_tpu.ops.edge_kernel_v3 import (
    fused_edge_block_v3, make_v3_meta,
)

H, FE = 64, 2


def ref_edge_block(h, x, dst, src, ea, W1, b1, W2, b2, Wg1, bg1, wg2):
    hd, hs = h[dst], h[src]
    diff = x[dst] - x[src]
    radial = jnp.sum(diff * diff, axis=1, keepdims=True)
    inp = jnp.concatenate([hd, hs, radial, ea], axis=1)
    z1 = inp @ W1 + b1
    a1 = jax.nn.silu(z1)
    z2 = a1 @ W2 + b2
    m = jax.nn.silu(z2)
    zg = m @ Wg1 + bg1
    gate = jax.nn.silu(zg) @ wg2
    trans = diff * gate
    N = h.shape[0]
    msum = jax.ops.segment_sum(m, dst, num_segments=N)
    tsum = jax.ops.segment_sum(trans, dst, num_segments=N)
    return msum, tsum


def main():
    N = int(os.environ.get("N", 300))
    deg = int(os.environ.get("DEG", 12))
    cd = jnp.bfloat16 if os.environ.get("BF16") == "1" else jnp.float32
    rng = np.random.default_rng(3)
    loc = rng.normal(size=(N, 3)).astype(np.float32)
    # kNN-ish graph for locality
    d2 = ((loc[:, None] - loc[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :deg]
    dst = np.repeat(np.arange(N), deg).astype(np.int32)
    src = nbr.reshape(-1).astype(np.int32)
    E = dst.size
    ea = (rng.normal(size=(E, FE)) * 0.3).astype(np.float32)
    meta = make_v3_meta(dst, src, ea, np.ones(E, bool), N,
                        chunk=int(os.environ.get("CHUNK", 256)),
                        W=int(os.environ.get("W", 2)))
    print(f"N={N} E={E} slots={meta.n_slots} chunks={meta.n_chunks} "
          f"W={meta.W} backend={jax.default_backend()} cd={cd}")

    h = jnp.asarray(rng.normal(size=(N, H)) * 0.5, jnp.float32)
    x = jnp.asarray(loc)
    W1 = jnp.asarray(rng.normal(size=(2 * H + 1 + FE, H)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=H) * 0.1, jnp.float32)
    W2 = jnp.asarray(rng.normal(size=(H, H)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=H) * 0.1, jnp.float32)
    Wg1 = jnp.asarray(rng.normal(size=(H, H)) * 0.2, jnp.float32)
    bg1 = jnp.asarray(rng.normal(size=H) * 0.1, jnp.float32)
    wg2 = jnp.asarray(rng.normal(size=(H, 1)) * 0.1, jnp.float32)
    w = (W1, b1, W2, b2, Wg1, bg1, wg2)

    ms_r, ts_r = ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                jnp.asarray(ea), *w)
    ms_k, ts_k = fused_edge_block_v3(h, x, meta, *w, compute_dtype=cd)

    def rel(a, b):
        return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))

    print(f"fwd msum rel={rel(ms_k, ms_r):.3e}  tsum rel={rel(ts_k, ts_r):.3e}")

    # gradients
    cot_m = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    cot_t = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    def loss_ref(h, x, *w):
        ms, ts = ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                jnp.asarray(ea), *w)
        return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

    def loss_k(h, x, *w):
        ms, ts = fused_edge_block_v3(h, x, meta, *w, compute_dtype=cd)
        return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(h, x, *w)
    gk = jax.grad(loss_k, argnums=tuple(range(9)))(h, x, *w)
    names = "h x W1 b1 W2 b2 Wg1 bg1 wg2".split()
    for n, a, b in zip(names, gk, gr):
        print(f"grad {n:<4s} rel={rel(a, b):.3e}")


if __name__ == "__main__":
    main()
