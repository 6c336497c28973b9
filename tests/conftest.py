"""Test configuration: force CPU with 8 virtual devices for mesh tests.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()
# Hard override: the ambient environment may pin JAX_PLATFORMS to a TPU
# backend (e.g. "axon") whose plugin ignores JAX_PLATFORMS; unit tests always
# run on the virtual-device CPU mesh, so force the default platform here.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon plugin ALSO ignores JAX_PLATFORMS and blocks forever in its
# connect loop when the remote TPU pool session is wedged (observed: pytest
# sat 23 min with 12 s CPU).  Clearing the pool IPs bypasses plugin
# registration entirely — same trick as __graft_entry__.dryrun_multichip's
# re-exec child.  Must happen before the first `import jax`.
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------------------
# slow-test policy: the default run (`pytest -q`) deselects tests marked
# `slow` (pytest.ini addopts) and finishes in ~5 minutes; the full suite is
# `pytest -m "" -q` (~15 min).  Marks are centralised here by node id so
# individual test files stay clean; anything measured >= ~7 s on an idle CPU
# goes on the list, EXCEPT two cheap-enough core guards that must run by
# default: the per-layer torch parity check and one graph-parallel exactness
# check.
# ---------------------------------------------------------------------------
_SLOW = {
    "tests/test_eghn.py::test_training_step",
    "tests/test_torch_parity.py::test_fastegnn_grad_parity",
    "tests/test_torch_parity.py::test_eghn_parity",
    "tests/test_torch_parity.py::test_gvpnet_parity",
    "tests/test_torch_parity.py::test_dimenet_parity",
    "tests/test_cli.py::test_cli_nbody",
    "tests/test_cli.py::test_cli_protein",
    "tests/test_cli.py::test_cli_simulation",
    "tests/test_cli.py::test_cli_equivariance",
    "tests/test_parallel.py::test_dp_train_step_matches_single",
    "tests/test_parallel.py::test_dp_eval_matches_single",
    "tests/test_train_e2e.py::test_eghn_trains_on_protein",
    "tests/test_train_e2e.py::test_dimenet_trains_on_nbody",
    "tests/test_train_e2e.py::test_train_loss_decreases",
    "tests/test_train_e2e.py::test_rollout_fixed_graph_equivariant",
    "tests/test_train_e2e.py::test_resume_from_checkpoint",
    "tests/test_train_e2e.py::test_early_stop",
    "tests/test_nbody_sim.py::test_parallel_datagen_worker_invariant",
    "tests/test_model_zoo.py::test_gvp_rotation_equivariance",
    "tests/test_graph_parallel.py::test_owner_sharded_train_step_matches_unsharded",
    "tests/test_graph_parallel.py::test_owner_step_with_data_axis",
    "tests/test_tfn.py::test_fast_tfn_se3_equivariance",
    "tests/test_tfn.py::test_dynamics_equivariance",
    "tests/test_tfn.py::test_pooled_scalar_heads_invariance",
    "tests/test_tfn_oracle.py::test_gconv_parity",
    "tests/test_dimenet.py::test_dimenet_grad_finite",
    "tests/test_dimenet.py::test_dimenet_invariance",
    "tests/test_datasets.py::test_protein_vnegnn_trains_one_step",
    "tests/test_fast_egnn.py::test_batching_independence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in _SLOW:
            item.add_marker(pytest.mark.slow)
