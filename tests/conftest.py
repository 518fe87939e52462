"""Test harness: 8 virtual CPU devices (the JAX 'multi-node without a
cluster' mechanism — SURVEY §4) so mesh/collective paths run everywhere."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rs():
    return np.random.RandomState(0)
