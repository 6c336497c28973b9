"""FastEGNN correctness: SE(3) equivariance, padding & batching invariance.

The equivariance check re-expresses the reference's standalone test
(``equivariant_test.py:38-62``: assert ``f(xR + t) == f(x)R + t`` at
atol 1e-4) as a property test over random rotations/translations; the
padding/batching invariances are the new guarantees our static-shape
masked batching must uphold (no reference equivalent exists).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.ops.rotation import random_rotation

from helpers import make_batch, random_raw_graph


def _apply(model, params, graph):
    return model.apply({"params": params}, graph)


@pytest.fixture(scope="module")
def model_and_params():
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=2)
    rng = np.random.default_rng(7)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    params = model.init(jax.random.key(0), graph)["params"]
    return model, params


def _rotate_batch(graph, R, t):
    """x -> xR + t for all geometric tensors; features stay fixed."""
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    # loc_mean is [B, 3, C]: columns are 3-vectors -> R^T from the left
    lm = jnp.einsum("ji,bjc->bic", R, graph.loc_mean) + t[None, :, None]
    return graph.replace(
        coord=graph.coord @ R + t,
        vel=graph.vel @ R,
        coord_target=graph.coord_target @ R + t,
        loc_mean=lm,
    )


def test_se3_equivariance(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(11)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)

    for trial in range(3):
        R = random_rotation(np.random.default_rng(100 + trial)).astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        x1, vx1 = _apply(model, params, _rotate_batch(graph, R, t))
        x0, vx0 = _apply(model, params, graph)
        x0_rt = np.asarray(x0) @ R + t
        vx0_rt = np.einsum("ji,bjc->bic", R, np.asarray(vx0)) + t[None, :, None]
        mask = np.asarray(graph.node_mask)
        np.testing.assert_allclose(
            np.asarray(x1)[mask], x0_rt[mask], atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(vx1), vx0_rt, atol=1e-4, rtol=1e-4)


def test_padding_invariance(model_and_params):
    """Extra padded nodes/edges must not change real-node outputs."""
    model, params = model_and_params
    rng = np.random.default_rng(3)
    raws = [random_raw_graph(rng, 6) for _ in range(2)]
    e = raws[0]["dst"].shape[0]

    def build(pad_nodes, pad_edges):
        spec = GraphSpec(
            max_nodes=6 + pad_nodes,
            max_edges=e + pad_edges,
            n_graphs=2,
            edge_attr_dim=2,
        )
        return batch_graphs([pad_graph(spec, **r) for r in raws], spec)

    g0 = build(0, 0)
    g1 = build(5, 9)
    x0, vx0 = _apply(model, params, g0)
    x1, vx1 = _apply(model, params, g1)
    m0, m1 = np.asarray(g0.node_mask), np.asarray(g1.node_mask)
    np.testing.assert_allclose(
        np.asarray(x0)[m0], np.asarray(x1)[m1], atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(vx0), np.asarray(vx1), atol=1e-5, rtol=1e-5)


def test_batching_independence(model_and_params):
    """Graphs in one batch must not interact: batch-of-2 == each alone."""
    model, params = model_and_params
    rng = np.random.default_rng(5)
    raws = [random_raw_graph(rng, 6) for _ in range(2)]
    e = raws[0]["dst"].shape[0]
    spec2 = GraphSpec(max_nodes=6, max_edges=e, n_graphs=2, edge_attr_dim=2)
    spec1 = GraphSpec(max_nodes=6, max_edges=e, n_graphs=1, edge_attr_dim=2)

    gb = batch_graphs([pad_graph(spec2, **r) for r in raws], spec2)
    xb, vxb = _apply(model, params, gb)
    for i, r in enumerate(raws):
        gi = batch_graphs([pad_graph(spec1, **r)], spec1)
        xi, vxi = _apply(model, params, gi)
        np.testing.assert_allclose(
            np.asarray(xb)[i * 6 : (i + 1) * 6], np.asarray(xi), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(vxb)[i], np.asarray(vxi)[0], atol=1e-5, rtol=1e-5
        )


def test_gravity_breaks_full_rotation_but_keeps_y(model_and_params):
    """With gravity, equivariance holds only for rotations about the gravity
    axis (the Water-3D setting, ref main_simulation.py:105 + y-only test
    rotation datasets/simulation/dataset.py:71-77)."""
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=2, gravity=(0.0, -1.0, 0.0))
    rng = np.random.default_rng(13)
    graph, _, _ = make_batch(rng, n_graphs=2, n_nodes=6)
    params = model.init(jax.random.key(1), graph)["params"]

    from fastegnn_tpu.ops.rotation import rotation_y

    R = rotation_y(1.1).astype(np.float32)
    t = np.zeros(3, np.float32)
    x1, _ = _apply(model, params, _rotate_batch(graph, R, t))
    x0, _ = _apply(model, params, graph)
    mask = np.asarray(graph.node_mask)
    np.testing.assert_allclose(
        np.asarray(x1)[mask], (np.asarray(x0) @ R)[mask], atol=1e-4, rtol=1e-4
    )


def test_split_mlp_weight_extraction():
    """SplitMLP/SplitCoordMLP raw weights reproduce their own __call__ and
    keep the MLP/CoordMLP param trees (torch import compatibility)."""
    import jax.numpy as jnp
    from fastegnn_tpu.models.nn import (
        MLP, CoordMLP, SplitCoordMLP, SplitMLP)

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (5, 12))

    sm = SplitMLP(8, 4, act_final=True)
    params = sm.init(key, x)
    y = sm.apply(params, x)
    W0, b0, W1, b1 = sm.apply(params, 12, method=SplitMLP.weights)
    y2 = jax.nn.silu(jax.nn.silu(x @ W0 + b0) @ W1 + b1)
    assert jnp.allclose(y, y2, atol=1e-6)
    # identical tree to MLP
    ref = MLP([8, 4], act_final=True).init(key, x)
    assert jax.tree.structure(ref) == jax.tree.structure(params)
    assert jnp.allclose(MLP([8, 4], act_final=True).apply(params, x), y)

    cm = SplitCoordMLP(12)
    params_c = cm.init(key, x)
    yc = cm.apply(params_c, x)
    Wc0, bc0, wc1 = cm.apply(params_c, method=SplitCoordMLP.weights)
    yc2 = jax.nn.silu(x @ Wc0 + bc0) @ wc1
    assert jnp.allclose(yc, yc2, atol=1e-6)
    ref_c = CoordMLP(12).init(key, x)
    assert jax.tree.structure(ref_c) == jax.tree.structure(params_c)
    assert jnp.allclose(CoordMLP(12).apply(params_c, x), yc)


def test_fused_graph_groups_match_monolithic_model():
    """FastEGNN forward through grouped kernel calls == single-meta batch."""
    import fastegnn_tpu.graph as gmod
    from helpers import random_raw_graph
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from fastegnn_tpu.models import FastEGNN

    rng = np.random.default_rng(5)
    raws = [random_raw_graph(rng, 40) for _ in range(4)]
    spec = GraphSpec(max_nodes=40, max_edges=40 * 39, n_graphs=4,
                     edge_attr_dim=2, virtual_channels=3)
    padded = [pad_graph(spec, **r) for r in raws]
    mono = batch_graphs(padded, spec)
    old = gmod.EK5_MAX_NODES
    gmod.EK5_MAX_NODES = 80     # 2 graphs (80 rows) per group
    try:
        grouped = batch_graphs(padded, spec)
    finally:
        gmod.EK5_MAX_NODES = old
    assert mono.ek5 is not None and grouped.ek5_groups is not None

    model = FastEGNN(hidden=64, virtual_channels=3, n_layers=2,
                     fuse_edge=True)
    params = model.init(jax.random.key(0), mono)["params"]
    x_m, v_m = model.apply({"params": params}, mono)
    x_g, v_g = model.apply({"params": params}, grouped)
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_m),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(v_g), np.asarray(v_m),
                               atol=2e-5, rtol=2e-5)


def test_group_mode_batches_carry_csr_metas():
    """Group-mode (production-scale) batches can carry the Pallas-CSR metas
    for non-fusable model variants (attention/tanh/normalize, hidden != 64,
    f32-on-TPU) via ``csr_for_groups=True`` — OPT-IN since round 5: the CSR
    build costs ~6-8 s of host time per production batch and the fused path
    never reads it (the round-4 advisor finding is served by the flag, the
    common path by the default)."""
    import fastegnn_tpu.graph as gmod
    from helpers import random_raw_graph
    from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph
    from fastegnn_tpu.models import FastEGNN

    rng = np.random.default_rng(6)
    raws = [random_raw_graph(rng, 40) for _ in range(4)]
    spec = GraphSpec(max_nodes=40, max_edges=40 * 39, n_graphs=4,
                     edge_attr_dim=2, virtual_channels=3)
    padded = [pad_graph(spec, **r) for r in raws]
    old = gmod.EK5_MAX_NODES
    gmod.EK5_MAX_NODES = 80
    try:
        default = batch_graphs(padded, spec)
        grouped = batch_graphs(padded, spec, csr_for_groups=True)
    finally:
        gmod.EK5_MAX_NODES = old
    assert default.ek5_groups is not None and default.csr_dst is None
    assert grouped.ek5_groups is not None
    assert grouped.csr_dst is not None and grouped.csr_src is not None

    # a model the fused kernel can't cover (hidden != 64) still matches the
    # unfused forward on the group-mode batch
    mono = batch_graphs(padded, spec)
    model = FastEGNN(hidden=32, virtual_channels=3, n_layers=2)
    params = model.init(jax.random.key(1), mono)["params"]
    x_m, _ = model.apply({"params": params}, mono)
    x_g, _ = model.apply({"params": params}, grouped)
    np.testing.assert_allclose(np.asarray(x_g), np.asarray(x_m),
                               atol=2e-5, rtol=2e-5)
