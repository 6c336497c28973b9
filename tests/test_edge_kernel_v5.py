"""v5 feature-major fused edge kernel vs the unfused composition (CPU
interpret mode).

Reference math (reference ``models/FastEGNN.py:102-133``,
180-189): per-edge 2-layer silu MLP, scalar gate, per-destination sums of
messages and gated coordinate differences — gather AND scatter in-kernel,
chain computed feature-major, dst blocks streamed per superchunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastegnn_tpu.ops.edge_kernel_v5 import fused_edge_block_v5, make_v5_meta

from helpers import _ref_edge_block, _setup

H = 64


@pytest.mark.parametrize("chunk,window,G,S",
                         [(256, 2, 2, 1), (128, 4, 4, 1), (128, 2, 2, 2),
                          (128, 1, 4, 4)])
def test_forward_matches_unfused(chunk, window, G, S):
    h, x, dst, src, ea, w = _setup()
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=chunk, W=window, G=G, S=S)
    ms, ts = fused_edge_block_v5(h, x, meta, *w)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    np.testing.assert_allclose(ms, ms_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ts, ts_r, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("S", [1, 4])
def test_gradients_match_unfused(S):
    h, x, dst, src, ea, w = _setup()
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=256, W=2, G=2, S=S)
    rng = np.random.default_rng(1)
    cot_m = jnp.asarray(rng.normal(size=(h.shape[0], H)), jnp.float32)
    cot_t = jnp.asarray(rng.normal(size=(h.shape[0], 3)), jnp.float32)

    def loss_k(h, x, *w):
        ms, ts = fused_edge_block_v5(h, x, meta, *w)
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
    # every dst block gets at least one (empty) superchunk, so the streamed
    # output block of an edge-less region must come back exactly zero
    h, x, dst, src, ea, w = _setup(isolate_tail=True)
    n = h.shape[0]
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), n,
                        chunk=256, W=2, G=2)
    ms, ts = fused_edge_block_v5(h, x, meta, *w)
    lo = (n - 1) // 128 * 128
    np.testing.assert_array_equal(np.asarray(ms[lo:]), 0.0)
    np.testing.assert_array_equal(np.asarray(ts[lo:]), 0.0)
    g = jax.grad(
        lambda h: jnp.sum(fused_edge_block_v5(h, x, meta, *w)[0])
    )(h)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_compute_dtype_close():
    h, x, dst, src, ea, w = _setup()
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=256, W=2, G=2)
    ms, ts = fused_edge_block_v5(h, x, meta, *w, compute_dtype=jnp.bfloat16)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    scale = float(jnp.max(jnp.abs(ms_r)))
    assert float(jnp.max(jnp.abs(ms - ms_r))) < 2e-2 * scale
    scale_t = float(jnp.max(jnp.abs(ts_r)))
    assert float(jnp.max(jnp.abs(ts - ts_r))) < 2e-2 * scale_t


def test_small_graph_window_exceeds_blocks():
    # N < W*128: the src window slice must stay in-bounds via table padding
    h, x, dst, src, ea, w = _setup(n=100, deg=6)
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), 100,
                        chunk=128, W=2, G=2)
    ms, ts = fused_edge_block_v5(h, x, meta, *w)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    np.testing.assert_allclose(ms, ms_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ts, ts_r, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("D", [32, 64])
def test_dst_window_forward_and_grad(D):
    """D < 128 shrinks the dst one-hot/scatter window; results must be
    identical to the unfused composition."""
    h, x, dst, src, ea, w = _setup()
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=128, W=2, G=2, D=D)
    ms, ts = fused_edge_block_v5(h, x, meta, *w)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    np.testing.assert_allclose(ms, ms_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ts, ts_r, rtol=2e-5, atol=2e-5)
    g = jax.grad(
        lambda h, x: jnp.sum(jnp.sin(fused_edge_block_v5(h, x, meta, *w)[0])),
        argnums=(0, 1))(h, x)
    gr = jax.grad(
        lambda h, x: jnp.sum(jnp.sin(_ref_edge_block(
            h, x, jnp.asarray(dst), jnp.asarray(src), jnp.asarray(ea),
            *w)[0])), argnums=(0, 1))(h, x)
    for a, b in zip(g, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_bf16_gradients_finite_and_close():
    """bf16 fwd+bwd: grads finite and within bf16 tolerance of f32."""
    h, x, dst, src, ea, w = _setup()
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), h.shape[0],
                        chunk=256, W=2, G=2)

    def loss(h, x, cd):
        ms, ts = fused_edge_block_v5(h, x, meta, *w, compute_dtype=cd)
        return jnp.sum(ms * 0.01) + jnp.sum(ts * 0.01)

    g16 = jax.grad(lambda h, x: loss(h, x, jnp.bfloat16), argnums=(0, 1))(
        h, x)
    g32 = jax.grad(lambda h, x: loss(h, x, jnp.float32), argnums=(0, 1))(
        h, x)
    for a, b in zip(g16, g32):
        assert np.isfinite(np.asarray(a, np.float32)).all()
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        assert float(jnp.max(jnp.abs(a.astype(jnp.float32) - b))) < 3e-2 * scale


def test_graph_groups_match_single_meta():
    """Batches beyond EK5_MAX_NODES split into per-graph-group kernel calls
    whose concatenated output equals the monolithic composition."""
    import fastegnn_tpu.graph as gmod
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph

    rng = np.random.default_rng(3)
    spec = GraphSpec(max_nodes=64, max_edges=512, n_graphs=6,
                     edge_attr_dim=2, virtual_channels=3)
    graphs = []
    for g in range(6):
        n = 50 + g
        e = 300
        dst = rng.integers(0, n, e)
        src = rng.integers(0, n, e)
        graphs.append(pad_graph(
            spec,
            node_feat=rng.normal(size=(n, 2)).astype(np.float32),
            coord=rng.normal(size=(n, 3)).astype(np.float32),
            vel=rng.normal(size=(n, 3)).astype(np.float32),
            dst=dst, src=src,
            edge_attr=rng.normal(size=(e, 2)).astype(np.float32),
            coord_target=rng.normal(size=(n, 3)).astype(np.float32),
        ))
    old = gmod.EK5_MAX_NODES
    gmod.EK5_MAX_NODES = 128   # force grouping: 2 graphs (128 rows) per group
    try:
        b = batch_graphs(graphs, spec, ek5_sblocks=1)
    finally:
        gmod.EK5_MAX_NODES = old
    assert b.ek5 is None and b.ek5_groups is not None
    assert len(b.ek5_group_rows) == 3
    assert [(d[0], d[1]) for d in b.ek5_group_rows] == [
        (0, 128), (128, 128), (256, 128)]
    # packed layout invariants: group super_offs are cumulative n_supers
    assert b.ek5_group_rows[0][2] == 0
    assert b.ek5_group_rows[1][2] == b.ek5_group_rows[0][3]
    assert b.ek5_groups.sdb.shape[0] == sum(d[3] for d in b.ek5_group_rows)
    w = _setup()[5]
    h = jnp.asarray(rng.normal(size=(b.num_nodes, H)), jnp.float32)
    parts = [
        fused_edge_block_v5(
            h[r0:r0 + rr], b.coord[r0:r0 + rr],
            b.ek5_groups.replace(super_off=soff, n_super=nsup,
                                 n_blocks=nblk, n_slots=nsl, n_chunks=nch),
            *w)
        for (r0, rr, soff, nsup, nblk, nsl, nch) in b.ek5_group_rows
    ]
    ms = jnp.concatenate([p[0] for p in parts])
    ts = jnp.concatenate([p[1] for p in parts])
    ms_r, ts_r = _ref_edge_block(
        h, b.coord, b.dst, b.src, b.edge_attr, *w)
    np.testing.assert_allclose(ms, ms_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ts, ts_r, rtol=2e-5, atol=2e-5)


def test_n_seg_pad_nonmultiple_window():
    # S=2, W=3, tiny N: W*ROWS (384) dominates and is NOT a multiple of
    # S*ROWS (256); n_seg_pad must round up to the streamed BlockSpec
    # (latent trace-time failure, round-4 advisor finding)
    h, x, dst, src, ea, w = _setup(n=100, deg=6)
    meta = make_v5_meta(dst, src, ea, np.ones(dst.size, bool), 100,
                        chunk=128, W=3, G=2, S=2)
    ms, ts = fused_edge_block_v5(h, x, meta, *w)
    ms_r, ts_r = _ref_edge_block(h, x, jnp.asarray(dst), jnp.asarray(src),
                                 jnp.asarray(ea), *w)
    np.testing.assert_allclose(ms, ms_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ts, ts_r, rtol=2e-5, atol=2e-5)


def test_group_meta_cache_consistency():
    # per-graph meta caching (gper == 1): a second collation of the same
    # graphs in a DIFFERENT batch order must produce metas identical to a
    # fresh uncached build at each position
    import fastegnn_tpu.graph as gmod
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph

    rng = np.random.default_rng(5)
    spec = GraphSpec(max_nodes=64, max_edges=256, n_graphs=3,
                     edge_attr_dim=2)
    graphs = []
    for _ in range(3):
        n, e = 64, 256
        graphs.append(pad_graph(
            spec,
            node_feat=rng.normal(size=(n, 2)).astype(np.float32),
            coord=rng.normal(size=(n, 3)).astype(np.float32),
            vel=rng.normal(size=(n, 3)).astype(np.float32),
            dst=rng.integers(0, n, e), src=rng.integers(0, n, e),
            edge_attr=rng.normal(size=(e, 2)).astype(np.float32),
            coord_target=rng.normal(size=(n, 3)).astype(np.float32),
        ))
    old = gmod.EK5_MAX_NODES
    gmod.EK5_MAX_NODES = 64    # gper == 1 -> per-graph groups, cache on
    try:
        b1 = batch_graphs(graphs, spec, ek5_sblocks=1)
        # second call in permuted order hits the cache
        perm = [2, 0, 1]
        b2 = batch_graphs([graphs[i] for i in perm], spec, ek5_sblocks=1)
        fresh = [dict(g) for g in graphs]   # copies without the cache key
        for g in fresh:
            g.pop(next(k for k in g if isinstance(k, tuple)), None)
        b3 = batch_graphs([fresh[i] for i in perm], spec, ek5_sblocks=1)
    finally:
        gmod.EK5_MAX_NODES = old
    np.testing.assert_array_equal(np.asarray(b2.ek5_groups.idsx),
                                  np.asarray(b3.ek5_groups.idsx))
    np.testing.assert_array_equal(np.asarray(b2.ek5_groups.w0),
                                  np.asarray(b3.ek5_groups.w0))
    assert b2.ek5_group_rows == b3.ek5_group_rows
