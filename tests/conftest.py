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

# heavy tier (round 5, VERDICT ask #10): the slowest e2e/corpus/examples
# tests — excluded from the default run (pyproject addopts) so the
# default tier fits in ~20 min on this 1-CPU host and future rounds
# actually run it end-to-end. Selected from a measured --durations=80
# sweep (docs/testing.md); every entry keeps a cheaper sibling covering
# the same contract in the default tier. Run with `pytest -m heavy
# --override-ini addopts=''` (or `-m 'heavy or golden'` for everything).
HEAVY_TESTS = {
    "test_train_cli_smoke",                 # 381 s full CLI run (eval CLI
    #                                         + trainer e2e stay default)
    "test_examples_run",                    # 249 s runs examples/*.py
    "test_genuine_classic_cv_config_runs_on_fabricated_cifar10",  # 238 s
    "test_sr_wrapper_on_custom_algorithm",  # 94 s (custom-alg API keeps
    "test_custom_algorithm_trains",         # 86 s  notebook + sample cover)
    "test_synthetic_learnable",             # 89 s (golden tier owns
    #                                         learning checks)
    "test_ref_equivalent_reforward_is_loss_equivalent",   # 62 s bench-arm
    "test_ref_equivalent_reforward_nlp_dict_batch",       # 40 s  -only mode
    "test_trainer_mesh_gating",             # 52 s (tp/shard bit-identity
    #                                         tests keep kernel-mesh cover)
    # round-5 second pass (measured --durations=60 at r5 HEAD; target
    # <20 min default on this 1-CPU host). Default-tier siblings noted:
    "test_trainer_fsdp_mesh_e2e",           # 58 s (test_fsdp_sharded_step
    #                                         + state-sharding stay)
    "test_trainer_grafts_checkpoint_and_trains",  # 47 s (graft mechanics
    #                                         + HF parity units stay)
    "test_fast_reverb_bounded_vs_exact",    # 46 s (freeverb-tail property
    "test_reverb_wet_has_no_dry_term",      # 43 s  test stays default)
    "test_vitb_3axis_stretch_dryrun",       # 39 s (driver dryrun_multichip
    #                                         + test_sharding meshes cover)
    "test_tp_sharded_bit_identical",        # 38 s (2d-mesh + single-device
    #                                         flash bit-identity stay)
    "test_hubert_eval_identical_and_train_runs",  # 36 s (bert flash-wiring
    #                                         sibling stays)
    "test_trainer_fsdp_mesh_uses_sharded_kernel",  # 36 s (dp-mesh fused-MLP
    #                                         sibling stays)
}
# parametrized cases: keep one representative param in the default tier
HEAVY_PARAMS = {
    "test_all_sr_variants_match_base_before_start_timing":
        {"pseudolabel", "freematch", "softmatch"},  # fixmatch/flexmatch stay
    # SR-variant one_steps largely duplicate base one_steps + the
    # sr_equivalence sweep; srflexmatch (the headline) stays default
    "test_one_step":
        {"srpseudolabel", "srfixmatch", "srfreematch", "srsoftmatch"},
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if mod in QUICK_MODULES and base not in SLOW_IN_QUICK_MODULES:
            item.add_marker(pytest.mark.quick)
        if base in HEAVY_TESTS:
            item.add_marker(pytest.mark.heavy)
        elif base in HEAVY_PARAMS and "[" in item.name:
            param = item.name.split("[", 1)[1].rstrip("]")
            if param in HEAVY_PARAMS[base]:
                item.add_marker(pytest.mark.heavy)


@pytest.fixture
def rs():
    return np.random.RandomState(0)
