"""Loss functions vs explicit numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from fastegnn_tpu.train.loss import masked_mse, mmd_loss, rbf_kernel

from helpers import make_batch


def test_masked_mse_matches_unpadded():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(10, 3)).astype(np.float32)
    target = rng.normal(size=(10, 3)).astype(np.float32)
    mask = np.array([True] * 7 + [False] * 3)
    got = float(masked_mse(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))
    expect = np.mean((pred[:7] - target[:7]) ** 2)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_rbf_kernel_unsquared_distance():
    x = np.array([[0.0, 0.0, 0.0]], np.float32)
    y = np.array([[3.0, 4.0, 0.0]], np.float32)  # dist 5
    sigma = 1.5
    got = float(rbf_kernel(jnp.asarray(x), jnp.asarray(y), sigma)[0, 0])
    np.testing.assert_allclose(got, np.exp(-5.0 / (2 * sigma**2)), rtol=1e-5)


def _mmd_oracle(coords, vloc, sampled_idx_per_graph, sigma):
    """Reference formula (utils/train.py:137-163) with explicit loops."""
    B, C = vloc.shape[0], vloc.shape[1]
    s = len(sampled_idx_per_graph[0])
    l_vv = l_rv = 0.0
    for b in range(B):
        for i in range(C):
            for j in range(C):
                d = np.linalg.norm(vloc[b, i] - vloc[b, j])
                l_vv += np.exp(-d / (2 * sigma**2))
            for k in sampled_idx_per_graph[b]:
                d = np.linalg.norm(coords[b, k] - vloc[b, i])
                l_rv += np.exp(-d / (2 * sigma**2))
    return l_vv / B / C / C - 2 * l_rv / B / s / C


def test_mmd_shared_sampling_matches_oracle():
    rng = np.random.default_rng(1)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=8)
    B, n = 2, 8
    pred = np.asarray(graph.coord)
    vloc = rng.normal(size=(B, 3, 3)).astype(np.float32)  # [B, 3, C]
    key = jax.random.key(0)
    sigma, sample = 1.5, 2
    got = float(
        mmd_loss(jnp.asarray(pred), jnp.asarray(vloc), graph, key, sigma, sample)
    )
    # recover the shared permutation the implementation used
    s = min(sample * 3, n)
    idx = np.asarray(jax.random.permutation(key, n)[:s])
    oracle = _mmd_oracle(
        pred.reshape(B, n, 3),
        np.transpose(vloc, (0, 2, 1)),
        [idx, idx],
        sigma,
    )
    np.testing.assert_allclose(got, oracle, rtol=1e-4)


def test_mmd_per_graph_sampling_masks_padding():
    """Per-graph sampling must never pick padded nodes when enough real
    nodes exist."""
    rng = np.random.default_rng(2)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=8, pad_nodes=4)
    pred = jnp.asarray(np.asarray(graph.coord))
    vloc = jnp.asarray(rng.normal(size=(2, 3, 3)).astype(np.float32))
    out = mmd_loss(
        pred, vloc, graph, jax.random.key(3), 1.0, 2, per_graph_sampling=True
    )
    assert np.isfinite(float(out))
    # padded coords are zeros; kernel with padded rows would inflate l_rv.
    # Verify independence from padded coordinate values:
    coords2 = np.asarray(graph.coord).copy()
    coords2[~np.asarray(graph.node_mask)] = 77.0
    g2 = graph.replace(coord=jnp.asarray(coords2))
    out2 = mmd_loss(
        jnp.asarray(coords2), vloc, g2, jax.random.key(3), 1.0, 2,
        per_graph_sampling=True,
    )
    np.testing.assert_allclose(float(out), float(out2), rtol=1e-5)
