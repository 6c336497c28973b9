"""DimeNet/DimeNet++: basis correctness, invariance, triplet table."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.models.dimenet import (
    DimeNet,
    DimeNetPlusPlus,
    Triplets,
    build_triplets,
    envelope,
    make_basis_fns,
)
from fastegnn_tpu.ops.rotation import random_rotation

from helpers import make_batch


def test_envelope_zero_beyond_cutoff():
    x = jnp.asarray([0.5, 0.99, 1.0, 1.5])
    v = np.asarray(envelope(x))
    assert v[2] == 0.0 and v[3] == 0.0 and v[0] > 0.0


def test_bessel_basis_matches_scipy():
    from scipy import special
    bessel, sph = make_basis_fns(3, 4)
    from fastegnn_tpu.models.dimenet import _jn_zeros
    zeros = _jn_zeros(3, 4)
    x = np.linspace(0.05, 0.95, 7)
    got = np.asarray(bessel(jnp.asarray(x)))  # [7, 12]
    for l in range(3):
        for m in range(4):
            z = zeros[l, m]
            norm = np.sqrt(2.0) / abs(special.spherical_jn(l + 1, z))
            expect = norm * special.spherical_jn(l, z * x)
            np.testing.assert_allclose(
                got[:, l * 4 + m], expect, rtol=1e-4, atol=1e-5
            )


def test_sph_harm_matches_scipy():
    from scipy import special
    _, sph = make_basis_fns(4, 2)
    theta = np.linspace(0.1, 3.0, 5)
    got = np.asarray(sph(jnp.asarray(theta)))  # [5, 4]
    for l in range(4):
        expect = np.sqrt((2 * l + 1) / (4 * np.pi)) * special.eval_legendre(
            l, np.cos(theta)
        )
        np.testing.assert_allclose(got[:, l], expect, rtol=1e-4, atol=1e-6)


def test_triplets_small_graph():
    # edges (j->i): 0->1, 1->2, 2->1
    dst = np.array([0, 1, 2])  # j
    src = np.array([1, 2, 1])  # i
    mask = np.ones(3, bool)
    t = build_triplets(dst, src, mask, 3)
    # for edge e1=(1->2): incoming to j=1 are edges with i==1: e0 (k=0), e2 (k=2)
    # k==i(=2) excludes e2 -> triplet (k=0, j=1, i=2)
    tm = np.asarray(t.mask)
    tri = set(
        zip(np.asarray(t.idx_k)[tm], np.asarray(t.idx_j)[tm],
            np.asarray(t.idx_i)[tm])
    )
    assert (0, 1, 2) in tri


@pytest.mark.parametrize("plusplus", [False, True])
def test_dimenet_invariance(plusplus):
    """DimeNet output is built from distances and angles only -> invariant
    (not equivariant: it predicts per-node scalars stacked as 3 channels)."""
    rng = np.random.default_rng(0)
    graph, _, _ = make_batch(rng, n_graphs=1, n_nodes=6)
    trip = build_triplets(
        np.asarray(graph.dst), np.asarray(graph.src),
        np.asarray(graph.edge_mask), graph.num_nodes,
    )
    model = DimeNet(hidden=16, num_blocks=1, num_spherical=3, num_radial=3,
                    plusplus=plusplus, out_emb_channels=16, int_emb_size=8,
                    basis_emb_size=4)
    params = model.init(jax.random.key(0), graph, trip)["params"]
    out0 = model.apply({"params": params}, graph, trip)
    assert out0.shape == (6, 3)
    assert np.isfinite(np.asarray(out0)).all()

    R = random_rotation(np.random.default_rng(1)).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    g2 = graph.replace(coord=graph.coord @ R + t)
    out1 = model.apply({"params": params}, graph.replace(coord=graph.coord @ R + t), trip)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), atol=2e-4, rtol=2e-4
    )


def test_dimenet_grad_finite():
    rng = np.random.default_rng(2)
    graph, _, _ = make_batch(rng, n_graphs=1, n_nodes=5)
    trip = build_triplets(
        np.asarray(graph.dst), np.asarray(graph.src),
        np.asarray(graph.edge_mask), graph.num_nodes,
    )
    model = DimeNet(hidden=8, num_blocks=1, num_spherical=2, num_radial=2)
    params = model.init(jax.random.key(0), graph, trip)["params"]

    def loss(p):
        out = model.apply({"params": p}, graph, trip)
        return jnp.sum((out - graph.coord_target) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
