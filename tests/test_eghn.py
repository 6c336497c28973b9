"""EGHN: forward shapes, finiteness, rotation equivariance, training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.models.eghn import EGHN
from fastegnn_tpu.ops.rotation import random_rotation

from helpers import make_batch


def _local_edges(graph, n_max):
    """Chain bond graph per graph slot (both directions)."""
    B = graph.n_graphs
    d, s = [], []
    for g in range(B):
        base = g * n_max
        for i in range(n_max - 1):
            d += [base + i, base + i + 1]
            s += [base + i + 1, base + i]
    dst = np.asarray(d, np.int32)
    src = np.asarray(s, np.int32)
    loc = np.asarray(graph.coord)
    attr = np.linalg.norm(loc[dst] - loc[src], axis=1, keepdims=True)
    attr = np.concatenate([attr, attr], axis=1).astype(np.float32)
    mask = np.ones(len(d), bool)
    return (jnp.asarray(dst), jnp.asarray(src), jnp.asarray(attr),
            jnp.asarray(mask))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    ld, ls, la, lm = _local_edges(graph, 6)
    model = EGHN(hidden=16, n_cluster=3, layer_per_block=1, layer_pooling=1,
                 layer_decoder=2)
    params = model.init(jax.random.key(0), graph, ld, ls, la, lm)["params"]
    return model, params, graph, (ld, ls, la, lm)


def test_forward_shapes(setup):
    model, params, graph, le = setup
    x_out, h_out, cut = model.apply({"params": params}, graph, *le)
    assert x_out.shape == (12, 3)
    assert np.isfinite(np.asarray(x_out)).all()
    assert np.isfinite(float(cut))


def test_rotation_equivariance(setup):
    """EGHN is O(3)-equivariant (x_mean centering handles translation of the
    pooling inputs; cluster coords are position means)."""
    model, params, graph, (ld, ls, la, lm) = setup
    x0, _, _ = model.apply({"params": params}, graph, ld, ls, la, lm)
    R = random_rotation(np.random.default_rng(1)).astype(np.float32)
    t = np.random.default_rng(2).normal(size=3).astype(np.float32)
    g2 = graph.replace(
        coord=graph.coord @ R + t,
        vel=graph.vel @ R,
        coord_target=graph.coord_target @ R + t,
    )
    x1, _, _ = model.apply({"params": params}, g2, ld, ls, la, lm)
    mask = np.asarray(graph.node_mask)
    np.testing.assert_allclose(
        np.asarray(x1)[mask], (np.asarray(x0) @ R + t)[mask],
        atol=5e-4, rtol=5e-4,
    )


def test_training_step(setup):
    import optax
    model, params, graph, le = setup

    def loss(p):
        x_out, _, cut = model.apply({"params": p}, graph, *le)
        mse = jnp.mean((x_out - graph.coord_target) ** 2)
        return mse + 0.1 * cut

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
