"""Fused edge-block kernel vs the unfused path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train.step import make_loss_fn

from helpers import make_batch


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=2, fuse_edge=True)
    params = model.init(jax.random.key(0), graph)["params"]
    return model, params, graph


def test_fused_matches_unfused_forward(setup):
    model, params, graph = setup
    x_f, vx_f = model.apply({"params": params}, graph)
    g_nofuse = graph.replace(csr_dst=None, csr_src=None, src_perm=None,
                             src_sorted=None)
    x_u, vx_u = model.apply({"params": params}, g_nofuse)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_u),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(vx_f), np.asarray(vx_u),
                               atol=2e-5, rtol=2e-5)


def test_fused_gradients_match(setup):
    model, params, graph = setup
    lf = make_loss_fn(model, 1.5, 0.01, 3, use_mmd=False)
    key = jax.random.key(1)
    g_f = jax.grad(lambda p: lf(p, graph, key)[0])(params)
    g_nofuse = graph.replace(csr_dst=None, csr_src=None, src_perm=None,
                             src_sorted=None)
    g_u = jax.grad(lambda p: lf(p, g_nofuse, key)[0])(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_fused_respects_attention_fallback():
    """attention=True must take the unfused path and still be correct."""
    rng = np.random.default_rng(1)
    graph, _, _ = make_batch(rng, n_graphs=1, n_nodes=5)
    model = FastEGNN(hidden=8, virtual_channels=3, n_layers=1, attention=True)
    params = model.init(jax.random.key(0), graph)["params"]
    x, vx = model.apply({"params": params}, graph)
    assert np.isfinite(np.asarray(x)).all()
