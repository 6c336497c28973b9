"""Native C++ graph kernels vs python oracles (skip if toolchain missing)."""

import numpy as np
import pytest

from fastegnn_tpu import native
from fastegnn_tpu.ops.neighbors import radius_graph_np


def _edge_set(dst, src):
    return set(zip(dst.tolist(), src.tolist()))


def test_radius_graph_matches_kdtree():
    rng = np.random.default_rng(0)
    loc = rng.random((300, 3)).astype(np.float32)
    r = 0.15
    nd, ns = native.radius_graph(loc, r)
    kd, ks = radius_graph_np(loc, r)
    assert _edge_set(nd, ns) == _edge_set(kd, ks)


def test_radius_graph_no_self_loops_and_symmetric():
    rng = np.random.default_rng(1)
    loc = rng.normal(size=(100, 3)).astype(np.float32)
    nd, ns = native.radius_graph(loc, 1.0)
    assert (nd != ns).all()
    es = _edge_set(nd, ns)
    assert all((b, a) in es for a, b in es)


def test_argsort_and_bincount():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 50, 1000).astype(np.int32)
    perm = native.argsort_i32(keys)
    assert (keys[perm] == np.sort(keys)).all()
    counts = native.bincount_f32(keys, 50)
    np.testing.assert_array_equal(counts, np.bincount(keys, minlength=50))


def test_bincount_drops_out_of_range():
    keys = np.array([0, 1, 5, 99, -1], np.int32)
    counts = native.bincount_f32(keys, 6)
    assert counts.sum() == 3.0


def test_native_available_or_fallback():
    # either path must work end to end
    rng = np.random.default_rng(3)
    loc = rng.random((50, 3)).astype(np.float32)
    d, s = native.radius_graph(loc, 0.3)
    assert d.dtype == np.int32 and len(d) == len(s)


def test_pack_v5_native_matches_python():
    """C++ packer must be bit-identical to the python make_v5_meta path."""
    import os

    from fastegnn_tpu import native
    from fastegnn_tpu.ops import edge_kernel_v5 as ek5

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    n = 700
    e = 9000
    dst = rng.integers(0, n, e).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    ea = rng.normal(size=(e, 2)).astype(np.float32)
    mask = rng.random(e) > 0.05
    for chunk, W, G, D, S in [(256, 2, 4, 128, 1), (128, 3, 2, 128, 1),
                              (128, 2, 2, 32, 1), (128, 2, 2, 64, 2),
                              (128, 1, 4, 64, 4)]:
        m_nat = ek5.make_v5_meta(dst, src, ea, mask, n, chunk=chunk, W=W,
                                 G=G, D=D, S=S)
        os.environ["FASTEGNN_TPU_NO_NATIVE"] = "1"
        try:
            native._LIB = None
            native._TRIED = False
            m_py = ek5.make_v5_meta(dst, src, ea, mask, n,
                                    chunk=chunk, W=W, G=G, D=D, S=S)
        finally:
            del os.environ["FASTEGNN_TPU_NO_NATIVE"]
            native._LIB = None
            native._TRIED = False
        assert m_nat.n_chunks == m_py.n_chunks
        np.testing.assert_array_equal(np.asarray(m_nat.idsx),
                                      np.asarray(m_py.idsx))
        np.testing.assert_array_equal(np.asarray(m_nat.w0),
                                      np.asarray(m_py.w0))
        np.testing.assert_array_equal(np.asarray(m_nat.dw0),
                                      np.asarray(m_py.dw0))
        np.testing.assert_array_equal(np.asarray(m_nat.sdb),
                                      np.asarray(m_py.sdb))


def test_counting_argsort_matches_numpy_stable():
    from fastegnn_tpu import native

    rng = np.random.default_rng(5)
    keys = rng.integers(-3, 50, 4000).astype(np.int32)  # incl out-of-range
    got = native.counting_argsort(keys, 40)
    want = np.argsort(np.where((keys >= 0) & (keys < 40), keys, 40),
                      kind="stable").astype(np.int32)
    np.testing.assert_array_equal(got, want)
