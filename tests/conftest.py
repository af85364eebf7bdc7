"""Test harness config.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 item 4) so
multi-chip sharding paths are validated without hardware; the driver
separately compile-checks on the real chip. The environment pre-registers a
TPU PJRT plugin via sitecustomize before pytest starts, so the platform
must be overridden through jax.config (env vars are read too early).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: repeat suite runs skip the expensive CPU compiles.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (minutes)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
