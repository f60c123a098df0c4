"""Test configuration: run all tests on CPU with 8 virtual devices so
multi-chip sharding logic can be exercised without TPU hardware.

The container's sitecustomize registers the TPU PJRT plugin at interpreter
start and pins JAX_PLATFORMS=axon; backends are not *initialized* until
first use, so overriding jax_platforms here (before any jax call) still
wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
