"""v2 fused edge-block kernel: forward and gradient parity vs the plain-JAX
composition of the same math (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.ops.edge_kernel import (
    fused_edge_block_v2,
    make_edge_kernel_meta,
)

H, FE = 64, 2


def make_problem(seed, n=40, deg=6):
    rng = np.random.default_rng(seed)
    dst = np.repeat(np.arange(n), deg)
    src = rng.integers(0, n, n * deg)
    keep = dst != src
    dst, src = dst[keep].astype(np.int32), src[keep].astype(np.int32)
    E = dst.size
    edge_attr = rng.normal(size=(E, FE)).astype(np.float32)
    emask = np.ones(E, bool)
    # drop a few edges via the mask to exercise exclusion
    emask[rng.integers(0, E, 5)] = False
    h = rng.normal(size=(n, H)).astype(np.float32) * 0.5
    x = rng.normal(size=(n, 3)).astype(np.float32)
    W1 = rng.normal(size=(2 * H + 1 + FE, H)).astype(np.float32) * 0.2
    b1 = rng.normal(size=H).astype(np.float32) * 0.1
    W2 = rng.normal(size=(H, H)).astype(np.float32) * 0.2
    b2 = rng.normal(size=H).astype(np.float32) * 0.1
    Wg1 = rng.normal(size=(H, H)).astype(np.float32) * 0.2
    bg1 = rng.normal(size=H).astype(np.float32) * 0.1
    wg2 = rng.normal(size=(H, 1)).astype(np.float32) * 0.1
    meta = make_edge_kernel_meta(dst, src, edge_attr, emask, n,
                                 rows=128, chunk=256)
    return (dst, src, edge_attr, emask, h, x,
            (W1, b1, W2, b2, Wg1, bg1, wg2), meta)


def unfused(h, x, dst, src, edge_attr, emask, W1, b1, W2, b2, Wg1, bg1, wg2):
    n = h.shape[0]
    m = emask[:, None].astype(jnp.float32)
    hd, hs = h[dst], h[src]
    diff = (x[dst] - x[src]) * m
    rad = jnp.sum(diff**2, axis=-1, keepdims=True)
    ein = jnp.concatenate([hd, hs, rad, edge_attr], axis=-1)
    a1 = jax.nn.silu(ein @ W1 + b1)
    mm = jax.nn.silu(a1 @ W2 + b2)
    g1 = jax.nn.silu(mm @ Wg1 + bg1)
    gate = g1 @ wg2
    trans = diff * gate
    seg = lambda d: jax.ops.segment_sum(d * m, dst, num_segments=n)
    return seg(mm), seg(trans)


@pytest.mark.parametrize("seed", [0, 1])
def test_fwd_matches_unfused(seed):
    dst, src, ea, emask, h, x, w, meta = make_problem(seed)
    ref_m, ref_t = unfused(h, x, dst, src, ea, emask, *w)
    got_m, got_t = fused_edge_block_v2(h, x, meta, *w)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(ref_t),
                               atol=2e-4, rtol=2e-4)


def test_grads_match_unfused():
    dst, src, ea, emask, h, x, w, meta = make_problem(2)
    cot_m = jnp.asarray(
        np.random.default_rng(9).normal(size=(h.shape[0], H)), jnp.float32
    )
    cot_t = jnp.asarray(
        np.random.default_rng(10).normal(size=(h.shape[0], 3)), jnp.float32
    )

    def loss_ref(h, x, *w):
        ms, ts = unfused(h, x, dst, src, ea, emask, *w)
        return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

    def loss_fused(h, x, *w):
        ms, ts = fused_edge_block_v2(h, x, meta, *w)
        return jnp.sum(ms * cot_m) + jnp.sum(ts * cot_t)

    argnums = tuple(range(2 + len(w)))
    g_ref = jax.grad(loss_ref, argnums)(h, x, *w)
    g_fus = jax.grad(loss_fused, argnums)(h, x, *w)
    names = ["h", "x", "W1", "b1", "W2", "b2", "Wg1", "bg1", "wg2"]
    for name, a, b in zip(names, g_fus, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_meta_slot_layout():
    dst, src, ea, emask, h, x, w, meta = make_problem(3)
    # every block's slot range is chunk-aligned and intervals stay inside it
    cstart = np.asarray(meta.cstart)
    cnum = np.asarray(meta.cnum)
    starts, ends = np.asarray(meta.starts), np.asarray(meta.ends)
    assert np.all(cstart % meta.chunk == 0)
    for b in range(cstart.shape[0]):
        assert np.all(starts[b] >= cstart[b])
        assert np.all(ends[b] <= cstart[b] + cnum[b] * meta.chunk)
    # real (masked-in, in-range) edge count preserved
    n_real = int((emask & (dst < h.shape[0])).sum())
    assert int((np.asarray(meta.ssorted) < h.shape[0]).sum()) == n_real


def test_fastegnn_fused_matches_unfused():
    """Full-model check: FastEGNN with the fused kernel forced on (interpret
    mode on CPU) matches the XLA path, forward and gradients."""
    from fastegnn_tpu.models import FastEGNN
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_batch

    rng = np.random.default_rng(5)
    batch, _, _ = make_batch(rng, n_graphs=2, n_nodes=9, cutoff_rate=0.3)
    m_on = FastEGNN(hidden=64, virtual_channels=3, n_layers=2, fuse_edge=True)
    m_off = FastEGNN(hidden=64, virtual_channels=3, n_layers=2, fuse_edge=False)
    params = m_off.init(jax.random.key(0), batch)["params"]

    x_on, v_on = m_on.apply({"params": params}, batch)
    x_off, v_off = m_off.apply({"params": params}, batch)
    np.testing.assert_allclose(np.asarray(x_on), np.asarray(x_off),
                               atol=1e-4, rtol=1e-4)

    def loss(p, m):
        xp, _ = m.apply({"params": p}, batch)
        return jnp.sum((xp - batch.coord_target) ** 2 *
                       batch.node_mask[:, None])

    g_on = jax.grad(lambda p: loss(p, m_on))(params)
    g_off = jax.grad(lambda p: loss(p, m_off))(params)
    flat_on = jax.tree.leaves(g_on)
    flat_off = jax.tree.leaves(g_off)
    for a, b in zip(flat_on, flat_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
