"""CLI `--mesh` distributed training: exactness vs single-device + ckpt
interchange.

Runs on the 8-virtual-device CPU mesh (conftest).  With --weight 0 the MMD
term contributes no gradient, so data x graph mesh training is numerically
the same optimization as single-device training on the same global batches
(fixed-N graphs: mean-of-shard-means == global mean; graph sharding is
exact by construction) — losses must match to float tolerance.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def nbody_data(tmp_path_factory):
    from fastegnn_tpu.data.nbody_sim import generate_dataset

    path = tmp_path_factory.mktemp("nbody_mesh")
    name = generate_dataset(
        str(path), 3, num_train=8, num_valid=4, num_test=4, seed=0
    )
    return str(path), name


def test_parse_mesh():
    from fastegnn_tpu.cli.common import parse_mesh

    assert parse_mesh(None) == (1, 1)
    assert parse_mesh("data=2") == (2, 1)
    assert parse_mesh("graph=4") == (1, 4)
    assert parse_mesh("data=2,graph=4") == (2, 4)
    with pytest.raises(ValueError):
        parse_mesh("tensor=2")


def test_dp_batch_shapes(nbody_data):
    import jax
    from fastegnn_tpu.data.nbody import NBodyDataset
    from fastegnn_tpu.parallel import make_mesh
    from fastegnn_tpu.parallel.data_parallel import iter_dp_batches

    path, name = nbody_data
    ds = NBodyDataset(path, name, partition="train", virtual_channels=3,
                      cutoff_rate=0.0, max_samples=8)
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    b = next(iter(iter_dp_batches(ds, 4, mesh, data=2)))
    # leaves [D, ...]: independent sub-batches of 2 graphs per data shard
    assert b.dst.shape[0] == 2
    assert b.coord.shape[0] == 2
    # slot metas have data-dependent sizes and cannot stack across shards
    assert b.ek5 is None and b.ek5_groups is None


@pytest.mark.parametrize("mesh_spec", ["data=2", "data=2,graph=2"])
def test_cli_mesh_matches_single_device(nbody_data, tmp_path, mesh_spec):
    from fastegnn_tpu.cli.nbody import main

    path, name = nbody_data
    common = [
        "--data_directory", path, "--dataset_name", name,
        "--virtual_channel", "3", "--cutoff_rate", "0.0",
        "--batch_size", "4", "--max_epochs", "4", "--test_interval", "2",
        "--weight", "0.0",
    ]
    best_single = main(common + ["--log_directory", str(tmp_path / "s")])
    best_mesh = main(common + ["--log_directory", str(tmp_path / "m"),
                               "--mesh", mesh_spec])
    assert np.isfinite(best_mesh["loss_valid"])
    np.testing.assert_allclose(
        best_mesh["loss_valid"], best_single["loss_valid"],
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        best_mesh["loss_train"], best_single["loss_train"],
        rtol=1e-4, atol=1e-6)


def test_cli_mesh_ckpt_resumes_single_device(nbody_data, tmp_path):
    """Checkpoints are interchangeable across mesh shapes."""
    from fastegnn_tpu.cli.nbody import main

    path, name = nbody_data
    common = [
        "--data_directory", path, "--dataset_name", name,
        "--virtual_channel", "3", "--cutoff_rate", "0.0",
        "--batch_size", "4", "--test_interval", "2", "--weight", "0.0",
    ]
    main(common + ["--max_epochs", "2", "--mesh", "data=2,graph=2",
                   "--ckpt_directory", str(tmp_path / "ck"),
                   "--log_directory", str(tmp_path / "l1")])
    best = main(common + ["--max_epochs", "4",
                          "--resume", str(tmp_path / "ck" / "best"),
                          "--log_directory", str(tmp_path / "l2")])
    assert np.isfinite(best["loss_valid"])


def test_cli_mesh_mmd_nonzero_weight(nbody_data, tmp_path):
    """Mesh training with the MMD term ON (reference weight 0.01).

    Distributed MMD semantics (owner_graph.make_owner_gp_train_step
    docstring): each data replica evaluates the reference estimator on its
    sub-batch with a replica-folded sampling key; the global term is the
    replica mean.  That is the same estimator in distribution, not bitwise,
    so this asserts (a) training runs and converges sanely at nonzero
    weight on both mesh shapes, (b) the run is deterministic given the
    seed, (c) the result is in the same ballpark as single-device.
    """
    from fastegnn_tpu.cli.nbody import main

    path, name = nbody_data
    common = [
        "--data_directory", path, "--dataset_name", name,
        "--virtual_channel", "3", "--cutoff_rate", "0.0",
        "--batch_size", "4", "--max_epochs", "4", "--test_interval", "2",
        "--weight", "0.01",
    ]
    best_single = main(common + ["--log_directory", str(tmp_path / "s")])
    best_mesh = main(common + ["--log_directory", str(tmp_path / "m1"),
                               "--mesh", "data=2,graph=2"])
    best_mesh2 = main(common + ["--log_directory", str(tmp_path / "m2"),
                                "--mesh", "data=2,graph=2"])
    assert np.isfinite(best_mesh["loss_valid"])
    # deterministic across identical runs
    np.testing.assert_allclose(
        best_mesh["loss_valid"], best_mesh2["loss_valid"], rtol=1e-6)
    # same optimization in distribution: allow sampling-noise-level gap
    assert best_mesh["loss_valid"] < 10 * best_single["loss_valid"] + 1.0
    # graph-only mesh: MMD exact vs single device (identical gathered
    # coordinate set and ONE unfolded key) -> losses match to tolerance
    best_g = main(common + ["--log_directory", str(tmp_path / "g"),
                            "--mesh", "graph=2"])
    np.testing.assert_allclose(
        best_g["loss_valid"], best_single["loss_valid"], rtol=1e-4,
        atol=1e-6)
