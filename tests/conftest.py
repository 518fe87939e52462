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

# fast gate: `pytest -m quick` runs these modules (minus the named slow
# tests) in well under 2 minutes on one CPU — see docs/testing.md
QUICK_MODULES = {
    "test_losses", "test_thresholding", "test_metrics", "test_split",
    "test_optim", "test_config", "test_sr_torch_parity", "test_augment",
}
SLOW_IN_QUICK_MODULES = {"test_train_cli_smoke"}  # 2-min full CLI run


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in QUICK_MODULES and item.name.split("[")[0] not in SLOW_IN_QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rs():
    return np.random.RandomState(0)
