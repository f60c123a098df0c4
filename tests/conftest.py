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

import functools  # noqa: E402
import subprocess  # noqa: E402
import sys  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


def subprocess_isolated(fn):
    """Run the decorated (argument-less) test in its own pytest child.

    Workaround for a reproducible XLA:CPU in-process compiler segfault:
    compiling the 8-virtual-device coarse-space rebuild program crashes
    inside backend_compile_and_load, but ONLY after ~90 other tests
    have compiled in the same process (the identical test passes alone
    and in any small grouping tried). The crash is below Python, in
    LLVM/XLA state accumulated across compilations, so the honest fix
    is process isolation, not a repro-shaped change to the test.
    """
    if os.environ.get("DOT_ISOLATED_CHILD"):
        return fn

    @functools.wraps(fn)
    def wrapper():
        here = os.path.dirname(os.path.abspath(__file__))
        nodeid = f"{os.path.join(here, fn.__module__ + '.py')}::{fn.__name__}"
        env = dict(os.environ, DOT_ISOLATED_CHILD="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", nodeid],
            cwd=os.path.dirname(here), env=env, timeout=1800,
            capture_output=True, text=True)
        assert r.returncode == 0, (
            f"isolated child failed (rc {r.returncode}):\n"
            f"{r.stdout[-4000:]}\n{r.stderr[-2000:]}")

    return wrapper
