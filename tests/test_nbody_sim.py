"""Simulator physics invariants (reference check() semantics) + datagen IO."""

import numpy as np
import pytest

from fastegnn_tpu.data.nbody_sim import ChargedSystem, generate_dataset, simulate_trajectory


def test_isolated_energy_sane():
    rng = np.random.default_rng(0)
    sys_ = ChargedSystem(5, rng=rng)
    for _ in range(500):
        sys_.step()
    assert np.isfinite(sys_.x).all() and np.isfinite(sys_.v).all()
    # forces are clamped at 0.1/dt; velocities can't explode in 500 steps
    assert np.abs(sys_.v).max() < 1e3


def test_stick_constraints_hold():
    rng = np.random.default_rng(1)
    sys_ = ChargedSystem(0, n_stick=4, rng=rng)
    for _ in range(1000):
        sys_.step()
    sys_.check(atol=1e-6)  # rigid length + projected velocity equality


def test_hinge_constraints_hold():
    rng = np.random.default_rng(2)
    sys_ = ChargedSystem(0, n_hinge=3, rng=rng)
    for _ in range(1000):
        sys_.step()
    sys_.check(atol=1e-6)


def test_mixed_system():
    rng = np.random.default_rng(3)
    sys_ = ChargedSystem(3, n_stick=2, n_hinge=1, rng=rng)
    for _ in range(300):
        sys_.step()
    sys_.check(atol=1e-6)
    assert sys_.n == 3 + 4 + 3


def test_trajectory_shapes():
    rng = np.random.default_rng(4)
    cfg, loc, vel, qq, q = simulate_trajectory(
        3, 0, 0, rng, length=500, sample_freq=100
    )
    assert loc.shape == (5, 3, 3) and vel.shape == (5, 3, 3)
    assert qq.shape == (3, 3) and q.shape == (3, 1)
    assert set(np.unique(q)) <= {-1.0, 1.0}
    assert cfg == {"Isolated": [[0], [1], [2]]}


def test_generate_dataset_layout(tmp_path):
    name = generate_dataset(
        str(tmp_path), 3, num_train=2, num_valid=1, num_test=1,
        length=200, sample_freq=100, seed=0,
    )
    assert name == "3_0_0"
    loc = np.load(tmp_path / "loc_train_charged3_0_0.npy")
    assert loc.shape == (2, 2, 3, 3)  # [sims, T, n, 3]
    for f in ["vel", "edges", "charges"]:
        assert (tmp_path / f"{f}_train_charged3_0_0.npy").exists()
    assert (tmp_path / "cfg_train_charged3_0_0.pkl").exists()


def test_gaussian_mixture_init_clusters():
    """``gaussians=10`` places particles in tight clusters around the
    reference's hardcoded means (ref ``script/system.py:49-63``)."""
    rng = np.random.default_rng(7)
    sys_ = ChargedSystem(50, rng=rng, gaussians=10)
    means = np.array(
        [[50, 50, 50], [50, 50, -50], [50, -50, 50], [50, -50, -50],
         [-50, 50, 50], [-50, 50, -50], [-50, -50, 50], [-50, -50, -50],
         [25, 25, 25], [-25, -25, -25]], float)
    d = np.linalg.norm(sys_.x[:, None, :] - means[None], axis=-1).min(axis=1)
    assert np.all(d < 6.0)  # loc_std=1 -> every particle near some mean
    # clustered: mean nearest-neighbour distance far below cluster spacing
    assert sys_.x.shape == (50, 3)


def test_gaussian_mixture_generates_and_loads(tmp_path):
    from fastegnn_tpu.data.nbody import NBodyDataset

    name = generate_dataset(
        str(tmp_path), 10, num_train=2, num_valid=1, num_test=1,
        length=250, sample_freq=5, seed=1, gaussians=10,
        suffix_extra="_10g",
    )
    assert name == "10_0_0_10g"
    ds = NBodyDataset(str(tmp_path), name, partition="train", cutoff_rate=0.5)
    assert len(ds) == 2


def test_parallel_datagen_worker_invariant(tmp_path):
    """n_workers > 1 parallelises over trajectories with per-index spawned
    seeds: output must not depend on the worker count."""
    from fastegnn_tpu.data.nbody_sim import generate_dataset

    kw = dict(num_train=4, num_valid=2, num_test=2, seed=11)
    generate_dataset(str(tmp_path / "a"), 3, 1, 0, n_workers=2, **kw)
    generate_dataset(str(tmp_path / "b"), 3, 1, 0, n_workers=3, **kw)
    for f in ("loc_train_charged3_1_0.npy", "vel_test_charged3_1_0.npy"):
        a = np.load(tmp_path / "a" / f)
        b = np.load(tmp_path / "b" / f)
        assert np.array_equal(a, b)
