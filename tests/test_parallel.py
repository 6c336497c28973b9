"""Data-parallel correctness: N-shard step == single-device step.

The distributed-correctness test class the reference cannot express
(SURVEY.md §4): same global batch, 1 device vs D devices, allclose.
Runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    stack_shards,
)
from fastegnn_tpu.train import TrainState, torch_adam
from fastegnn_tpu.train.step import make_eval_step, make_train_step

from helpers import make_batch, random_raw_graph
from fastegnn_tpu.graph import GraphSpec, batch_graphs, pad_graph


def _make_shards_and_global(rng, n_shards, per_shard, n_nodes):
    raws = [random_raw_graph(rng, n_nodes) for _ in range(n_shards * per_shard)]
    e = raws[0]["dst"].shape[0]
    spec_s = GraphSpec(max_nodes=n_nodes, max_edges=e, n_graphs=per_shard, edge_attr_dim=2)
    spec_g = GraphSpec(
        max_nodes=n_nodes, max_edges=e, n_graphs=n_shards * per_shard, edge_attr_dim=2
    )
    shards = [
        batch_graphs(
            [pad_graph(spec_s, **r) for r in raws[i * per_shard : (i + 1) * per_shard]],
            spec_s,
        )
        for i in range(n_shards)
    ]
    global_batch = batch_graphs([pad_graph(spec_g, **r) for r in raws], spec_g)
    return stack_shards(shards), global_batch


@pytest.mark.parametrize("n_shards", [2, 4])
def test_dp_train_step_matches_single(n_shards):
    assert len(jax.devices()) >= n_shards
    rng = np.random.default_rng(0)
    stacked, global_batch = _make_shards_and_global(rng, n_shards, 2, 6)

    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=2)
    params = model.init(jax.random.key(0), global_batch)["params"]
    tx = torch_adam(1e-3)

    mesh = make_mesh((n_shards,), ("data",), devices=jax.devices()[:n_shards])
    dp_step = make_dp_train_step(model, tx, mesh, use_mmd=False)
    single_step = make_train_step(model, tx, use_mmd=False, donate=False)

    key = jax.random.key(1)
    # independent param copies: the DP step donates its input state
    params_dp = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    s_dp = TrainState.create(params_dp, tx)
    s_1 = TrainState.create(params, tx)
    s_dp, m_dp = dp_step(s_dp, stacked, key)
    s_1, m_1 = single_step(s_1, global_batch, key)

    np.testing.assert_allclose(float(m_dp["mse"]), float(m_1["mse"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_dp_eval_matches_single():
    rng = np.random.default_rng(1)
    stacked, global_batch = _make_shards_and_global(rng, 2, 3, 5)
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), global_batch)["params"]
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    dp_eval = make_dp_eval_step(model, mesh, use_mmd=False)
    single_eval = make_eval_step(model, use_mmd=False)
    key = jax.random.key(2)
    m_dp = dp_eval(params, stacked, key)
    m_1 = single_eval(params, global_batch, key)
    np.testing.assert_allclose(float(m_dp["mse"]), float(m_1["mse"]), rtol=1e-5)


def test_dp_with_mmd_runs_and_is_finite():
    rng = np.random.default_rng(2)
    stacked, _ = _make_shards_and_global(rng, 2, 2, 6)
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=1)
    g0 = jax.tree.map(lambda x: x[0], stacked)
    params = model.init(jax.random.key(0), g0)["params"]
    tx = torch_adam(1e-3)
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    step = make_dp_train_step(model, tx, mesh, use_mmd=True)
    state = TrainState.create(params, tx)
    state, metrics = step(state, stacked, jax.random.key(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["mmd"]) != 0.0
