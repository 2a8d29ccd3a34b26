"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run against a virtual CPU mesh
(xla_force_host_platform_device_count=8) so the suite is hardware-independent;
the driver separately dry-run-compiles the multi-chip path and benches on a
real TPU chip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The hosted "axon" TPU plugin ignores the JAX_PLATFORMS env var; force CPU via
# the config API too so the test suite never runs over the device tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
