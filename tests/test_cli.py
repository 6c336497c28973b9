"""End-to-end CLI smoke tests: every training entry point runs through its
real argparse wiring for a couple of epochs on tiny synthetic data.

These exist because each CLI duplicates its argument block (reference
parity: ``main_nbody.py`` / ``main_protein.py`` / ``main_simulation.py``
each carry their own argparse), so a flag added in one place can silently
miss another — a unit test on the shared helpers won't catch it.
"""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def nbody_data(tmp_path_factory):
    from fastegnn_tpu.data.nbody_sim import generate_dataset

    path = tmp_path_factory.mktemp("nbody")
    name = generate_dataset(
        str(path), 3, num_train=8, num_valid=4, num_test=4, seed=0
    )
    return str(path), name


def test_cli_nbody(nbody_data, tmp_path):
    from fastegnn_tpu.cli.nbody import main

    path, name = nbody_data
    best = main([
        "--data_directory", path, "--dataset_name", name,
        "--virtual_channel", "3", "--cutoff_rate", "0.0",
        "--batch_size", "4", "--max_epochs", "2", "--test_interval", "2",
        "--log_directory", str(tmp_path),
        "--profile_trace", str(tmp_path / "trace"),
    ])
    assert np.isfinite(best["loss_valid"])
    # the trace flag must produce an xplane artifact
    assert list((tmp_path / "trace").rglob("*.xplane.pb"))
    # reference-format JSON log: [best, log]
    logs = list(tmp_path.glob("*_loss_*.json"))
    assert logs, "JSON log missing"
    payload = json.loads(logs[0].read_text())
    assert isinstance(payload, list) and len(payload) == 2


def test_cli_simulation(tmp_path):
    from fastegnn_tpu.data.simulation import make_synthetic_simulation_h5
    from fastegnn_tpu.cli.simulation import main

    make_synthetic_simulation_h5(
        str(tmp_path / "Water-3D"), n_trajectories=1, n_particles=40,
        n_frames=40,
    )
    best = main([
        "--data_directory", str(tmp_path), "--virtual_channel", "3",
        "--batch_size", "2", "--max_epochs", "2", "--test_interval", "2",
        "--max_train_samples", "4", "--max_test_samples", "2",
        "--log_directory", str(tmp_path / "logs"),
    ])
    assert np.isfinite(best["loss_valid"])


def test_cli_protein(tmp_path):
    from fastegnn_tpu.data.protein import make_synthetic_protein_npz
    from fastegnn_tpu.cli.protein import main

    npz = str(tmp_path / "adk.npz")
    make_synthetic_protein_npz(npz, n_atoms=40, n_frames=60)
    best = main([
        "--npz", npz, "--virtual_channel", "3", "--batch_size", "2",
        "--max_epochs", "2", "--test_interval", "2",
        "--max_train_samples", "4", "--max_test_samples", "2",
        "--delta_frame", "5",
        "--log_directory", str(tmp_path / "logs"),
    ])
    assert np.isfinite(best["loss_valid"])


def test_cli_equivariance():
    from fastegnn_tpu.cli.equivariance import main

    rc = main(["--model", "FastEGNN", "--nodes", "8", "--num_layer", "2",
               "--trials", "1"])
    assert rc in (0, None)
