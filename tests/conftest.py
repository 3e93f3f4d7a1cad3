"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
logic is exercised without TPUs (SURVEY.md §4), and enable x64 so
high-precision parity oracles can run in float64."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel,
# which must not be used for the unit-test mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax is already imported (and the TPU-tunnel backend registered) by the
# environment's sitecustomize, so the env var alone can be too late —
# override the config directly as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
