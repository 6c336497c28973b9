"""Pallas sorted-CSR segment-sum vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.ops.spmm import sorted_segment_sum


@pytest.mark.parametrize("E,N,H", [(1000, 64, 8), (4096, 300, 64), (513, 40, 3)])
def test_matches_jnp(E, N, H):
    rng = np.random.default_rng(0)
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    data = rng.normal(size=(E, H)).astype(np.float32)
    got = sorted_segment_sum(jnp.asarray(data), jnp.asarray(dst), N,
                             rows=32, chunk=256)
    want = jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(dst), N,
                               indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-5)


def test_out_of_range_sentinel_dropped():
    rng = np.random.default_rng(1)
    E, N, H = 600, 50, 4
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dst[-100:] = N + 7  # padded sentinel beyond range, still sorted
    data = rng.normal(size=(E, H)).astype(np.float32)
    got = sorted_segment_sum(jnp.asarray(data), jnp.asarray(dst), N,
                             rows=16, chunk=128)
    want = np.zeros((N, H), np.float32)
    for e in range(E - 100):
        want[dst[e]] += data[e]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_empty_rows_zero():
    dst = np.array([5, 5, 9], np.int32)
    data = np.ones((3, 2), np.float32)
    got = np.asarray(sorted_segment_sum(jnp.asarray(data), jnp.asarray(dst), 12,
                                        rows=8, chunk=128))
    assert got[5].tolist() == [2.0, 2.0]
    assert got[9].tolist() == [1.0, 1.0]
    assert np.abs(got).sum() == 3 * 2


def test_gradient_is_gather():
    rng = np.random.default_rng(2)
    E, N, H = 200, 30, 5
    dst_np = np.sort(rng.integers(0, N, E)).astype(np.int32)
    dst = jnp.asarray(dst_np)
    data = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))

    def loss(d):
        out = sorted_segment_sum(d, dst, N, rows=16, chunk=64)
        return jnp.sum(out**2)

    g = jax.grad(loss)(data)
    out = jax.ops.segment_sum(data, dst, N, indices_are_sorted=True)
    expect = 2.0 * np.asarray(out)[dst_np]
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-4, rtol=1e-4)
