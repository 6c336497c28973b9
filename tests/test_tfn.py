"""TFN stack: SO(3) machinery + layer/model equivariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.models.tfn import (
    FastTFN,
    OurDynamics,
    compute_basis,
    real_clebsch_gordan,
    real_sph_harm_all,
)
from fastegnn_tpu.ops.rotation import random_rotation

from helpers import make_batch


def test_sph_harm_vs_scipy():
    from scipy.special import sph_harm_y

    rng = np.random.default_rng(0)
    v = rng.normal(size=(6, 3))
    r = np.linalg.norm(v, axis=1)
    theta = np.arccos(v[:, 2] / r)
    phi = np.arctan2(v[:, 1], v[:, 0])
    Y = real_sph_harm_all(3, jnp.asarray(v))
    for l in range(4):
        got = np.asarray(Y[l])
        for m in range(-l, l + 1):
            if m == 0:
                exp = np.real(sph_harm_y(l, 0, theta, phi))
            elif m > 0:
                exp = np.sqrt(2) * (-1) ** m * np.real(sph_harm_y(l, m, theta, phi))
            else:
                exp = np.sqrt(2) * (-1) ** (-m) * np.imag(
                    sph_harm_y(l, -m, theta, phi)
                )
            np.testing.assert_allclose(got[:, m + l], exp, atol=1e-5)


def test_gaunt_consistency():
    """CG-contracted products of SH of the same direction are proportional
    to SH — the consistency that makes kernels equivariant."""
    rng = np.random.default_rng(1)
    v = rng.normal(size=(4, 3))
    Y = real_sph_harm_all(4, jnp.asarray(v))
    for (j1, j2, j3) in [(1, 1, 2), (1, 1, 0), (1, 2, 1), (2, 2, 2)]:
        C = real_clebsch_gordan(j1, j2, j3)
        lhs = np.einsum("na,nb,abc->nc", np.asarray(Y[j1]), np.asarray(Y[j2]), C)
        rhs = np.asarray(Y[j3])
        coef = (lhs * rhs).sum(1) / (rhs * rhs).sum(1)
        assert np.abs(coef - coef.mean()).max() < 1e-5
        assert np.abs(lhs - coef[:, None] * rhs).max() < 1e-5


def _rotate_batch(graph, R):
    return graph.replace(
        coord=graph.coord @ R,
        vel=graph.vel @ R,
        coord_target=graph.coord_target @ R,
        loc_mean=jnp.einsum("ji,bjc->bic", jnp.asarray(R), graph.loc_mean),
    )


@pytest.mark.parametrize("model_kind", ["tfn", "se3_transformer"])
def test_dynamics_equivariance(model_kind):
    rng = np.random.default_rng(2)
    graph, _, _ = make_batch(rng, n_graphs=1, n_nodes=6)
    model = OurDynamics(nf=4, n_layers=2, model=model_kind, num_degrees=2)
    params = model.init(jax.random.key(0), graph)["params"]
    x0 = model.apply({"params": params}, graph)
    R = random_rotation(np.random.default_rng(3)).astype(np.float32)
    x1 = model.apply({"params": params}, _rotate_batch(graph, R))
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x0) @ R, atol=3e-4, rtol=3e-4
    )


def test_fast_tfn_se3_equivariance():
    rng = np.random.default_rng(4)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=5)
    model = FastTFN(hidden=8, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), graph)["params"]
    x0, vx0 = model.apply({"params": params}, graph)
    R = random_rotation(np.random.default_rng(5)).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    g2 = _rotate_batch(graph, R).replace(
        coord=graph.coord @ R + t,
        coord_target=graph.coord_target @ R + t,
        loc_mean=jnp.einsum("ji,bjc->bic", jnp.asarray(R), graph.loc_mean)
        + t[None, :, None],
    )
    x1, vx1 = model.apply({"params": params}, g2)
    mask = np.asarray(graph.node_mask)
    np.testing.assert_allclose(
        np.asarray(x1)[mask], (np.asarray(x0) @ R + t)[mask],
        atol=3e-4, rtol=3e-4,
    )


def test_fast_tfn_trains_one_step():
    from fastegnn_tpu.train import TrainState, torch_adam
    from fastegnn_tpu.train.step import make_train_step

    rng = np.random.default_rng(6)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=5)
    model = FastTFN(hidden=8, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), graph)["params"]
    tx = torch_adam(1e-3)
    step = make_train_step(model, tx, use_mmd=True)
    state = TrainState.create(params, tx)
    state, metrics = step(state, graph, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("cls_name", ["TFN", "SE3Transformer"])
def test_pooled_scalar_heads_invariance(cls_name):
    """The scalar-output TFN / SE(3)-Transformer (attention stack incl.
    GMABSE3 + segment softmax) must be *invariant* under rotation
    (reference ``models/se3_dynamics/models.py:15-205``)."""
    from fastegnn_tpu.models.tfn.models import TFN, SE3Transformer

    cls = {"TFN": TFN, "SE3Transformer": SE3Transformer}[cls_name]
    rng = np.random.default_rng(11)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=5)
    model = cls(num_layers=1, atom_feature_size=2, num_channels=4,
                num_degrees=2)
    params = model.init(jax.random.key(0), graph.node_feat, graph)["params"]
    y0 = model.apply({"params": params}, graph.node_feat, graph)
    R = random_rotation(np.random.default_rng(12)).astype(np.float32)
    y1 = model.apply({"params": params}, graph.node_feat, _rotate_batch(graph, R))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=5e-4, rtol=5e-4)
