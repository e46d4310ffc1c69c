"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Multi-chip hardware is unavailable in CI; sharding correctness is validated on
host-platform virtual devices (SURVEY.md §4 test strategy item d).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the real TPU tunnel, but the
# test suite needs f32 determinism + 8 virtual devices. Opt back into TPU with
# CYCLEVAE_TEST_TPU=1.
if not os.environ.get("CYCLEVAE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not os.environ.get("CYCLEVAE_TEST_TPU"):
    # A pytest plugin may have imported jax before this conftest ran, in which
    # case jax captured JAX_PLATFORMS=axon at import time — override the config
    # value directly (backends are lazy, so this is safe before first use).
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
