"""Test harness: 8 virtual CPU devices (the JAX 'multi-node without a
cluster' mechanism — SURVEY §4) so mesh/collective paths run everywhere."""
import os

# The axon TPU plugin (sitecustomize in this image) registers whenever
# PALLAS_AXON_POOL_IPS is set and overrides JAX_PLATFORMS — clear it so the
# suite really runs on 8 virtual CPU devices and never serializes on the
# single real chip.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax and registered the TPU plugin already
# (it runs before pytest); jax.config can still steer platform selection as
# long as no backend has been initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rs():
    return np.random.RandomState(0)
