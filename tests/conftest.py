import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 item 4): multi-chip
# sharding paths are validated without hardware; the driver separately
# compile-checks on the real chip.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
