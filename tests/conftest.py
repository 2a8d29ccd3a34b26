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

# Persistent XLA compilation cache: most of the suite's wall time is compiles,
# which are identical across runs. First run populates, later runs are fast.
_cache_dir = os.environ.get("JAX_TEST_CACHE", "/tmp/orbslam2_tpu_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy end-to-end / fixture tests excluded from -m quick"
    )
    config.addinivalue_line(
        "markers", "quick: fast tier — auto-applied to every test not marked slow"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
