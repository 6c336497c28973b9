"""Minimum end-to-end slice: datagen -> dataset -> FastEGNN -> train loop.

The gate from SURVEY.md §7 stage 5: a tiny charged system trains end to end,
loss decreases, logs/checkpoints are written, resume restores state.
"""

import json
import os

import numpy as np
import jax
import pytest

from fastegnn_tpu.data.nbody import NBodyDataset
from fastegnn_tpu.data.nbody_sim import generate_dataset
from fastegnn_tpu.models import FastEGNN
from fastegnn_tpu.train import TrainState, torch_adam, train
from fastegnn_tpu.train.checkpoint import restore_checkpoint
from fastegnn_tpu.train.step import make_train_step


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nbody"))
    name = generate_dataset(
        path, 5, num_train=8, num_valid=4, num_test=4,
        length=4100, sample_freq=100, seed=1,
    )
    return path, name


def _datasets(path, name, cutoff=0.0):
    mk = lambda part: NBodyDataset(
        path, name, partition=part, virtual_channels=3,
        cutoff_rate=cutoff, rotation_seed=7,
    )
    return mk("train"), mk("valid"), mk("test")


def test_train_loss_decreases(tiny_data, tmp_path):
    path, name = tiny_data
    dtr, dva, dte = _datasets(path, name)
    model = FastEGNN(hidden=32, virtual_channels=3, n_layers=2)
    example = dtr.collate([0, 1])
    params = model.init(jax.random.key(0), example)["params"]
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)

    best, log, state = train(
        model, state, tx, dtr, dva, dte,
        batch_size=4, sigma=1.5, weight=0.01,
        test_interval=5, max_epochs=15, seed=43,
        log_directory=str(tmp_path), log_name="log.json",
        ckpt_directory=str(tmp_path / "ckpt"), verbose=False,
    )
    assert log["loss_train"][-1] < log["loss_train"][0]
    assert best["loss_valid"] < 1e8 and best["loss_test"] < 1e8

    # JSON log structure matches the reference's [best, log] layout
    with open(tmp_path / "log.json") as f:
        saved = json.load(f)
    assert saved[0]["epoch_index"] == best["epoch_index"]
    assert saved[1]["loss_train"] == log["loss_train"]

    # checkpoint restores
    ck = restore_checkpoint(
        str(tmp_path / "ckpt" / "best"),
        target={"params": state.params, "opt_state": state.opt_state,
                "step": state.step, "epoch": 0},
    )
    flat_saved = jax.tree.leaves(ck["params"])
    assert all(np.isfinite(np.asarray(x)).all() for x in flat_saved)


def test_early_stop(tiny_data, tmp_path):
    path, name = tiny_data
    dtr, dva, dte = _datasets(path, name)
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), dtr.collate([0, 1]))["params"]
    tx = torch_adam(0.0)  # lr 0 -> no improvement after the first eval
    state = TrainState.create(params, tx)
    best, log, _ = train(
        model, state, tx, dtr, dva, dte,
        batch_size=4, sigma=1.5, weight=0.01,
        test_interval=1, early_stop=3, max_epochs=50, seed=0,
        verbose=False,
    )
    assert "early_stop" in best
    assert best["early_stop"] <= best["epoch_index"] + 3 + 1


def test_train_step_jit_cache(tiny_data):
    """Same-spec batches must not retrigger compilation (static shapes)."""
    path, name = tiny_data
    dtr, _, _ = _datasets(path, name)
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), dtr.collate([0, 1]))["params"]
    tx = torch_adam(1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, 1.5, 0.01, 3)
    batches = list(dtr.iter_batches(2, rng=np.random.default_rng(0)))
    state, _ = step(state, batches[0], jax.random.key(0))
    # trace counter, not jit ``_cache_size()``: the C++ pjit cache is a
    # global shared LRU (capacity 8192) whose entries other tests can
    # evict — only a fresh TRACE proves a batch-spec shape instability
    assert step.n_traces[0] == 1
    for b in batches[1:]:
        state, _ = step(state, b, jax.random.key(1))
    assert step.n_traces[0] == 1, "same-spec batches retriggered tracing"


def test_resume_from_checkpoint(tiny_data, tmp_path):
    """Save at epoch K, resume, epochs continue from K+1 with restored state."""
    path, name = tiny_data
    dtr, dva, dte = _datasets(path, name)
    model = FastEGNN(hidden=16, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), dtr.collate([0, 1]))["params"]
    tx = torch_adam(1e-3)
    state = TrainState.create(params, tx)
    best1, log1, state1 = train(
        model, state, tx, dtr, dva, dte,
        batch_size=4, sigma=1.5, weight=0.01,
        test_interval=2, max_epochs=4, seed=43,
        ckpt_directory=str(tmp_path / "ck"), verbose=False,
    )
    state2 = TrainState.create(params, tx)
    best2, log2, state2 = train(
        model, state2, tx, dtr, dva, dte,
        batch_size=4, sigma=1.5, weight=0.01,
        test_interval=2, max_epochs=6, seed=43,
        resume_from=str(tmp_path / "ck" / "best"), verbose=False,
    )
    # resumed run trains only the remaining epochs
    assert len(log2["loss_train"]) < 6
    assert np.isfinite(best2["loss_valid"])


def test_eghn_trains_on_protein(tmp_path):
    """EGHN e2e: bond-graph local edges flow through collation into the
    training step (reference enables EGHN on protein, main_protein.py:133)."""
    from fastegnn_tpu.data.protein import ProteinDataset, make_synthetic_protein_npz
    from fastegnn_tpu.models import EGHN

    npz = str(tmp_path / "adk.npz")
    make_synthetic_protein_npz(npz, n_atoms=24, n_frames=40, seed=3)
    mk = lambda part: ProteinDataset(
        npz, partition=part, virtual_channels=3, cutoff_rate=0.0,
        delta_frame=2, contact_cutoff=6.0, seed=1, with_local_edges=True,
        max_samples=8,
    )
    dtr, dva, dte = mk("train"), mk("valid"), mk("test")
    model = EGHN(hidden=16, n_cluster=4, layer_per_block=1, layer_pooling=1,
                 layer_decoder=1)
    example = dtr.collate([0, 1])
    assert example.local_dst is not None

    def apply_fn(params, batch):
        g = batch[0] if isinstance(batch, tuple) else batch
        x_out, _h, _cut = model.apply(
            {"params": params}, g, g.local_dst, g.local_src,
            g.local_edge_attr, g.local_edge_mask,
        )
        return x_out

    params = model.init(
        jax.random.key(0), example, example.local_dst, example.local_src,
        example.local_edge_attr, example.local_edge_mask,
    )["params"]
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    best, log, state = train(
        model, state, tx, dtr, dva, dte, batch_size=2, sigma=1.0, weight=0.5,
        use_mmd=False, test_interval=5, max_epochs=10, seed=43,
        verbose=False, apply_fn=apply_fn,
    )
    assert log["loss_train"][-1] < log["loss_train"][0]
    assert np.isfinite(log["loss_train"][-1])


def test_dimenet_trains_on_nbody(tiny_data):
    """DimeNet e2e: triplet tables ride along with batches (reference
    dispatch utils/train.py:97-98, built via main_nbody.py:124)."""
    from fastegnn_tpu.models import DimeNet, TripletDataset

    path, name = tiny_data
    dtr, dva, dte = _datasets(path, name, cutoff=0.0)
    dtr, dva, dte = TripletDataset(dtr), TripletDataset(dva), TripletDataset(dte)
    model = DimeNet(hidden=16, num_blocks=1, num_spherical=3, num_radial=3)
    g0, t0 = dtr.collate([0, 1])
    params = model.init(jax.random.key(0), g0, t0)["params"]
    apply_fn = lambda params, batch: model.apply(
        {"params": params}, batch[0], batch[1]
    )
    tx = torch_adam(5e-4, 1e-12)
    state = TrainState.create(params, tx)
    best, log, state = train(
        model, state, tx, dtr, dva, dte, batch_size=2, sigma=1.5,
        weight=0.01, use_mmd=False, test_interval=5, max_epochs=8,
        seed=43, verbose=False, apply_fn=apply_fn,
    )
    assert np.isfinite(log["loss_train"][-1])
    assert log["loss_train"][-1] < log["loss_train"][0]


def test_rollout_fixed_graph_equivariant():
    """Multi-step jitted rollout: finite, and the WHOLE trajectory is
    equivariant (rotate input -> rotated trajectory)."""
    import jax
    import jax.numpy as jnp

    from fastegnn_tpu.models import FastEGNN
    from fastegnn_tpu.ops.rotation import random_rotation
    from fastegnn_tpu.train.rollout import make_rollout
    from helpers import make_batch

    batch, _, _ = make_batch(np.random.default_rng(4), n_graphs=2,
                             virtual_channels=2)
    model = FastEGNN(hidden=16, virtual_channels=2, n_layers=1)
    params = model.init(jax.random.key(0), batch)["params"]
    roll = make_rollout(model, n_steps=3)
    traj, vfin = roll(params, batch)
    assert traj.shape[0] == 3 and np.isfinite(np.asarray(traj)).all()

    R = jnp.asarray(random_rotation(np.random.default_rng(1)))
    batch_r = batch.replace(
        coord=batch.coord @ R.T, vel=batch.vel @ R.T,
        loc_mean=jnp.einsum("ij,bjc->bic", R, batch.loc_mean))
    traj_r, _ = roll(params, batch_r)
    np.testing.assert_allclose(
        np.asarray(traj_r), np.asarray(traj @ R.T), atol=2e-4)
