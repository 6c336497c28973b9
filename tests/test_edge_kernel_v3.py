"""v3 fused edge kernel vs the unfused composition (CPU interpret mode).

The kernel computes the FastEGNN real<->real edge block
(reference ``models/FastEGNN.py:102-133,180-189``): per-edge 2-layer silu
MLP, scalar gate, and per-destination sums of messages and gated
coordinate differences — with gather AND scatter done in-kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastegnn_tpu.ops.edge_kernel_v3 import fused_edge_block_v3, make_v3_meta

H, FE = 64, 2


def _ref_edge_block(h, x, dst, src, ea, W1, b1, W2, b2, Wg1, bg1, wg2):
    hd, hs = h[dst], h[src]
    diff = x[dst] - x[src]
    radial = jnp.sum(diff * diff, axis=1, keepdims=True)
    inp = jnp.concatenate([hd, hs, radial, ea], axis=1)
    m = jax.nn.silu(jax.nn.silu(inp @ W1 + b1) @ W2 + b2)
    gate = jax.nn.silu(m @ Wg1 + bg1) @ wg2
    N = h.shape[0]
    return (
        jax.ops.segment_sum(m, dst, num_segments=N),
        jax.ops.segment_sum(diff * gate, dst, num_segments=N),
    )


def _setup(n=260, deg=8, seed=0, isolate_tail=False):
    rng = np.random.default_rng(seed)
    loc = rng.normal(size=(n, 3)).astype(np.float32)
    d2 = ((loc[:, None] - loc[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :deg]
    dst = np.repeat(np.arange(n), deg).astype(np.int32)
    src = nbr.reshape(-1).astype(np.int32)
    if isolate_tail:
        # drop every edge whose dst lands in the last 128-row block, so
        # that block is never visited by a packed chunk (regression: the
        # kernel must still zero its output rows)
        keep = dst < (n - 1) // 128 * 128
        dst, src = dst[keep], src[keep]
    e = dst.size
    ea = (rng.normal(size=(e, FE)) * 0.3).astype(np.float32)
    w = [
        rng.normal(size=(2 * H + 1 + FE, H)) * 0.2,
        rng.normal(size=H) * 0.1,
        rng.normal(size=(H, H)) * 0.2,
        rng.normal(size=H) * 0.1,
        rng.normal(size=(H, H)) * 0.2,
        rng.normal(size=H) * 0.1,
        rng.normal(size=(H, 1)) * 0.1,
    ]
    w = [jnp.asarray(a, jnp.float32) for a in w]
    h = jnp.asarray(rng.normal(size=(n, H)) * 0.5, jnp.float32)
    return h, jnp.asarray(loc), dst, src, ea, w


@pytest.mark.parametrize("chunk,window", [(256, 2), (128, 4)])
def test_forward_matches_unfused(chunk, window):
    h, x, dst, src, ea, w = _setup()
    meta = make_v3_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=chunk, W=window)
    ms, ts = fused_edge_block_v3(h, x, meta, *w)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    np.testing.assert_allclose(ms, ms_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ts, ts_r, rtol=2e-5, atol=2e-5)


def test_gradients_match_unfused():
    h, x, dst, src, ea, w = _setup()
    meta = make_v3_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=256, W=2)
    rng = np.random.default_rng(1)
    cot_m = jnp.asarray(rng.normal(size=(h.shape[0], H)), jnp.float32)
    cot_t = jnp.asarray(rng.normal(size=(h.shape[0], 3)), jnp.float32)

    def loss_k(h, x, *w):
        ms, ts = fused_edge_block_v3(h, x, meta, *w)
        return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

    def loss_r(h, x, *w):
        ms, ts = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
        return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

    gk = jax.grad(loss_k, argnums=tuple(range(9)))(h, x, *w)
    gr = jax.grad(loss_r, argnums=tuple(range(9)))(h, x, *w)
    for a, b in zip(gk, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_uncovered_dst_block_is_zero():
    h, x, dst, src, ea, w = _setup(isolate_tail=True)
    n = h.shape[0]
    meta = make_v3_meta(dst, src, ea, np.ones(dst.size, bool), n,
                        chunk=256, W=2)
    ms, ts = fused_edge_block_v3(h, x, meta, *w)
    lo = (n - 1) // 128 * 128
    np.testing.assert_array_equal(np.asarray(ms[lo:]), 0.0)
    np.testing.assert_array_equal(np.asarray(ts[lo:]), 0.0)
    # gradients through the isolated rows must also be exactly zero-safe
    g = jax.grad(
        lambda h: jnp.sum(fused_edge_block_v3(h, x, meta, *w)[0])
    )(h)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_compute_dtype_close():
    h, x, dst, src, ea, w = _setup()
    meta = make_v3_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=256, W=2)
    ms, ts = fused_edge_block_v3(h, x, meta, *w, compute_dtype=jnp.bfloat16)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    # bf16 MLP path: ~1e-2 relative of the output scale
    scale = float(jnp.max(jnp.abs(ms_r)))
    assert float(jnp.max(jnp.abs(ms - ms_r))) < 2e-2 * scale
    scale_t = float(jnp.max(jnp.abs(ts_r)))
    assert float(jnp.max(jnp.abs(ts - ts_r))) < 2e-2 * scale_t
