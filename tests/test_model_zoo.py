"""Model-zoo property tests: equivariance/invariance per family.

Each geometric model must satisfy the reference's SE(3) property
(``equivariant_test.py:38-62``); GNN/MLP are deliberately non-equivariant.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.models import get_model, MODEL_REGISTRY
from fastegnn_tpu.ops.rotation import random_rotation

from helpers import make_batch


def _rotate_batch(graph, R, t):
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    lm = jnp.einsum("ji,bjc->bic", R, graph.loc_mean) + t[None, :, None]
    g = graph.replace(
        coord=graph.coord @ R + t,
        vel=graph.vel @ R,
        coord_target=graph.coord_target @ R + t,
        loc_mean=lm,
    )
    if graph.virtual_fibonacci is not None:
        g = g.replace(
            virtual_fibonacci=jnp.einsum("ji,bjc->bic", R, graph.virtual_fibonacci)
            + t[None, :, None]
        )
    return g


def _first_coord_output(out):
    return out[0] if isinstance(out, tuple) else out


EQUIVARIANT = ["FastEGNN", "FastRF", "FastSchNet", "VNEGNN", "EGNN", "RF", "Linear", "SchNet"]


@pytest.mark.parametrize("name", EQUIVARIANT)
def test_se3_equivariance(name):
    rng = np.random.default_rng(17)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    if name == "VNEGNN":
        fib = rng.normal(size=(2, 3, 3)).astype(np.float32)
        graph = graph.replace(virtual_fibonacci=jnp.asarray(fib))
    kw = {"num_interactions": 2} if name == "SchNet" else {}
    model = get_model(name, hidden=16, virtual_channels=3, n_layers=2, **kw)
    params = model.init(jax.random.key(0), graph)["params"]

    R = random_rotation(np.random.default_rng(5)).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    x0 = _first_coord_output(model.apply({"params": params}, graph))
    x1 = _first_coord_output(model.apply({"params": params}, _rotate_batch(graph, R, t)))
    mask = np.asarray(graph.node_mask)
    np.testing.assert_allclose(
        np.asarray(x1)[mask], (np.asarray(x0) @ R + t)[mask], atol=2e-4, rtol=2e-4
    )


def test_gvp_rotation_equivariance():
    """GVP uses absolute positions as vector features -> O(3)-equivariant
    (not translation-equivariant); check rotation only."""
    rng = np.random.default_rng(19)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    model = get_model("GVP", n_layers=2)
    params = model.init(jax.random.key(0), graph)["params"]
    R = random_rotation(np.random.default_rng(5)).astype(np.float32)
    x0, _ = model.apply({"params": params}, graph)
    x1, _ = model.apply(
        {"params": params}, _rotate_batch(graph, R, np.zeros(3, np.float32))
    )
    mask = np.asarray(graph.node_mask)
    np.testing.assert_allclose(
        np.asarray(x1)[mask], (np.asarray(x0) @ R)[mask], atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("name", ["GNN"])
def test_gnn_runs_and_is_not_equivariant(name):
    rng = np.random.default_rng(3)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    model = get_model(name, hidden=16, n_layers=2)
    params = model.init(jax.random.key(0), graph)["params"]
    x0 = model.apply({"params": params}, graph)
    assert x0.shape == (12, 3)
    R = random_rotation(np.random.default_rng(5)).astype(np.float32)
    x1 = model.apply({"params": params}, _rotate_batch(graph, R, np.zeros(3, np.float32)))
    # a plain GNN on raw coords is NOT equivariant
    assert not np.allclose(np.asarray(x1), np.asarray(x0) @ R, atol=1e-3)


# DimeNet takes (graph, triplets) — covered by tests/test_dimenet.py;
# EGHN takes (graph, local bond edges) — covered by tests/test_eghn.py
@pytest.mark.parametrize(
    "name",
    sorted(set(MODEL_REGISTRY) - {"MLP", "DimeNet", "DimeNet++", "EGHN"}),
)
def test_forward_shapes_and_finite(name):
    rng = np.random.default_rng(7)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    kw = {"num_interactions": 1} if name == "SchNet" else {}
    model = get_model(name, hidden=16, virtual_channels=3, n_layers=1, **kw)
    params = model.init(jax.random.key(1), graph)["params"]
    out = model.apply({"params": params}, graph)
    x = _first_coord_output(out)
    assert x.shape == (12, 3)
    assert np.isfinite(np.asarray(x)).all()


def test_linear_dynamics_exact():
    rng = np.random.default_rng(9)
    graph, _, _ = make_batch(rng, n_graphs=1, n_nodes=5)
    model = get_model("Linear")
    params = model.init(jax.random.key(0), graph)["params"]
    out = model.apply({"params": params}, graph)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(graph.coord + graph.vel), atol=1e-6
    )


def test_batching_independence_vnegnn_fastrf():
    """Virtual-node pooling must stay per-graph for the new families."""
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from helpers import random_raw_graph

    rng = np.random.default_rng(21)
    raws = [random_raw_graph(rng, 6) for _ in range(2)]
    e = raws[0]["dst"].shape[0]
    spec2 = GraphSpec(max_nodes=6, max_edges=e, n_graphs=2, edge_attr_dim=2)
    spec1 = GraphSpec(max_nodes=6, max_edges=e, n_graphs=1, edge_attr_dim=2)
    gb = batch_graphs([pad_graph(spec2, **r) for r in raws], spec2)

    for name in ["FastRF", "VNEGNN"]:
        model = get_model(name, hidden=16, virtual_channels=3, n_layers=2)
        params = model.init(jax.random.key(0), gb)["params"]
        xb = _first_coord_output(model.apply({"params": params}, gb))
        for i, r in enumerate(raws):
            gi = batch_graphs([pad_graph(spec1, **r)], spec1)
            xi = _first_coord_output(model.apply({"params": params}, gi))
            np.testing.assert_allclose(
                np.asarray(xb)[i * 6 : (i + 1) * 6],
                np.asarray(xi),
                atol=1e-5,
                rtol=1e-5,
                err_msg=name,
            )
