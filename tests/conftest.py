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

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)
