"""Water-3D and protein dataset pipelines on synthetic fixtures."""

import numpy as np
import pytest

from fastegnn_tpu.data.protein import (
    ProteinDataset,
    _fibonacci_sphere,
    make_synthetic_protein_npz,
)
from fastegnn_tpu.data.simulation import (
    SimulationDataset,
    make_synthetic_simulation_h5,
)


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim") / "Water-3D"
    make_synthetic_simulation_h5(str(d), n_trajectories=2, n_particles=60,
                                 n_frames=60, seed=0)
    return str(d.parent)


def test_simulation_dataset(sim_dir):
    ds = SimulationDataset(
        sim_dir, partition="train", virtual_channels=3, cutoff_rate=0.25,
        delta_t=5, radius=0.12, frames_per_trajectory=4, frame_range=40,
    )
    assert len(ds) == 8
    batch = ds.collate([0, 1])
    assert batch.coord.shape[0] == 2 * ds.spec.max_nodes
    assert bool(np.asarray(batch.edge_mask).any())
    # velocities are one-step finite differences: |v| small
    assert float(np.abs(np.asarray(batch.vel)).max()) < 1.0


def test_simulation_test_split_rotated_about_y(sim_dir):
    """The y-rotation must preserve the y coordinate distribution exactly."""
    tr = SimulationDataset(sim_dir, partition="train", virtual_channels=3,
                           delta_t=5, radius=0.12, frames_per_trajectory=3,
                           seed=1)
    te = SimulationDataset(sim_dir, partition="test", virtual_channels=3,
                           delta_t=5, radius=0.12, frames_per_trajectory=3,
                           seed=1)
    # y-axis rotations leave the y column invariant: all test-set y values
    # must lie in the range synthetic data produces (box [0, 1])
    ys = np.concatenate([g["coord"][g["node_mask"], 1] for g in te.graphs])
    assert ys.min() > -0.2 and ys.max() < 1.2
    # but x/z are rotated: test coords differ from any train frame's span
    assert len(te) == len(tr)


@pytest.fixture(scope="module")
def protein_npz(tmp_path_factory):
    p = tmp_path_factory.mktemp("prot") / "adk.npz"
    make_synthetic_protein_npz(str(p), n_atoms=50, n_frames=60, seed=0)
    return str(p)


def test_protein_dataset(protein_npz):
    ds = ProteinDataset(
        protein_npz, partition="train", virtual_channels=3,
        cutoff_rate=0.25, delta_frame=5, contact_cutoff=8.0,
    )
    assert len(ds) > 0
    batch = ds.collate([0])
    assert batch.virtual_fibonacci is not None
    assert batch.virtual_fibonacci.shape == (1, 3, 3)
    bonds, lengths = ds.bond_edges()
    assert bonds.shape == (49, 2) and lengths.shape == (49,)


def test_protein_splits_disjoint(protein_npz):
    tr = ProteinDataset(protein_npz, partition="train", delta_frame=5)
    va = ProteinDataset(protein_npz, partition="valid", delta_frame=5)
    te = ProteinDataset(protein_npz, partition="test", delta_frame=5)
    assert len(tr) > len(va) > 0 and len(te) > 0


def test_fibonacci_sphere_unit():
    pts = _fibonacci_sphere(8)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-6)


def test_protein_vnegnn_trains_one_step(protein_npz):
    """VNEGNN end-to-end on protein data (its reference-only habitat)."""
    import jax
    from fastegnn_tpu.models import VNEGNN
    from fastegnn_tpu.train import TrainState, torch_adam
    from fastegnn_tpu.train.step import make_train_step

    ds = ProteinDataset(protein_npz, partition="train", virtual_channels=3,
                        delta_frame=5, contact_cutoff=8.0)
    batch = ds.collate([0, 1])
    model = VNEGNN(hidden=16, virtual_channels=3, n_layers=1)
    params = model.init(jax.random.key(0), batch)["params"]
    tx = torch_adam(1e-3)
    step = make_train_step(model, tx, use_mmd=False)
    state = TrainState.create(params, tx)
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_iter_batches_prefetch_equivalence(sim_dir):
    """Threaded prefetch must yield byte-identical batches in order."""
    ds = SimulationDataset(sim_dir, partition="train", virtual_channels=2)
    a = list(ds.iter_batches(2, rng=np.random.default_rng(3), prefetch=0))
    b = list(ds.iter_batches(2, rng=np.random.default_rng(3), prefetch=2))
    assert len(a) == len(b) and len(a) >= 1
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ba.coord),
                                      np.asarray(bb.coord))
        np.testing.assert_array_equal(np.asarray(ba.dst), np.asarray(bb.dst))
