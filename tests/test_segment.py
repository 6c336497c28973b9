"""Segment ops vs dense numpy oracles (masking, clamping, softmax)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fastegnn_tpu.ops.segment import (
    graph_mean_pool,
    segment_mean,
    segment_softmax,
    segment_sum,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_segment_sum_masked(rng):
    data = rng.normal(size=(10, 4)).astype(np.float32)
    ids = rng.integers(0, 5, size=10)
    mask = rng.random(10) > 0.3
    out = segment_sum(jnp.asarray(data), jnp.asarray(ids), 5, mask=jnp.asarray(mask))
    expect = np.zeros((5, 4), np.float32)
    for i in range(10):
        if mask[i]:
            expect[ids[i]] += data[i]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_segment_mean_clamps_empty(rng):
    data = rng.normal(size=(6, 3)).astype(np.float32)
    ids = np.array([0, 0, 1, 1, 1, 3])  # segment 2 empty
    out = segment_mean(jnp.asarray(data), jnp.asarray(ids), 4)
    expect = np.zeros((4, 3), np.float32)
    expect[0] = data[:2].mean(0)
    expect[1] = data[2:5].mean(0)
    expect[2] = 0.0  # empty -> 0 via count clamp (ref models/FastEGNN.py:294)
    expect[3] = data[5]
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_segment_mean_mask_excludes(rng):
    data = rng.normal(size=(5, 2)).astype(np.float32)
    ids = np.zeros(5, np.int32)
    mask = np.array([True, True, False, True, False])
    out = segment_mean(jnp.asarray(data), jnp.asarray(ids), 1, mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out)[0], data[mask].mean(0), atol=1e-6)


def test_segment_mean_3d(rng):
    data = rng.normal(size=(7, 3, 4)).astype(np.float32)
    ids = np.array([0, 1, 0, 1, 1, 0, 0])
    out = segment_mean(jnp.asarray(data), jnp.asarray(ids), 2)
    for s in range(2):
        np.testing.assert_allclose(
            np.asarray(out)[s], data[ids == s].mean(0), atol=1e-6
        )


def test_segment_softmax(rng):
    logits = rng.normal(size=(8,)).astype(np.float32)
    ids = np.array([0, 0, 0, 1, 1, 2, 2, 2])
    out = np.asarray(segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 3))
    for s in range(3):
        sel = ids == s
        e = np.exp(logits[sel] - logits[sel].max())
        np.testing.assert_allclose(out[sel], e / e.sum(), rtol=1e-5)


def test_segment_softmax_masked(rng):
    logits = rng.normal(size=(6,)).astype(np.float32)
    ids = np.array([0, 0, 0, 1, 1, 1])
    mask = np.array([True, False, True, True, True, False])
    out = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(ids), 2, mask=jnp.asarray(mask))
    )
    assert out[1] == 0.0 and out[5] == 0.0
    np.testing.assert_allclose(out[[0, 2]].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[[3, 4]].sum(), 1.0, rtol=1e-5)


def test_graph_mean_pool_with_dump_segment(rng):
    data = rng.normal(size=(6, 3)).astype(np.float32)
    gid = np.array([0, 0, 1, 1, 2, 2])  # last two nodes padded -> dump id 2
    mask = np.array([True, True, True, True, False, False])
    out = np.asarray(
        graph_mean_pool(jnp.asarray(data), jnp.asarray(gid), 2, jnp.asarray(mask))
    )
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], data[:2].mean(0), atol=1e-6)
    np.testing.assert_allclose(out[1], data[2:4].mean(0), atol=1e-6)
