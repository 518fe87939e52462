"""Config-corpus validation.

The reference ships its experiment grid as a YAML corpus under config/
(1,158 files + 284 imbalanced; see scripts emitting them,
reference scripts/config_generator_*.py). Ours is emitted by
scripts/config_generator.py into config/ (checked in). Every file must
load through semireward_tpu.config.from_yaml and resolve its algorithm /
imb wrapper / net in the registries.
"""
import glob
import importlib.util
import os

import pytest

import semireward_tpu as st
from semireward_tpu.config import from_yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "config")


def _load_generator():
    path = os.path.join(REPO, "scripts", "config_generator.py")
    spec = importlib.util.spec_from_file_location("config_generator", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_generator_emits_reference_layout(tmp_path):
    gen = _load_generator()
    # one SR config: SemiReward/<suite>/<base>/<base>_... with sr alg inside
    cfg = gen.create_configuration("usb_cv", "srflexmatch", "cifar100", 200,
                                   0, str(tmp_path))
    assert cfg["algorithm"] == "srflexmatch"
    assert cfg["save_name"] == "srflexmatch_cifar100_200_0"
    p = tmp_path / "SemiReward" / "usb_cv" / "flexmatch" / \
        "flexmatch_cifar100_200_0.yaml"
    assert p.exists()
    loaded = from_yaml(str(p))
    assert loaded.algorithm == "srflexmatch"
    assert loaded.start_timing == 20000

    # one imbalanced config: classic_cv_imb/<base>_<imb>/..._lbN_g_ulbN_g_s
    icfg = gen.create_imb_configuration(
        "fixmatch", "daso", "cifar10", (500, 100, 4000, -100), 1,
        str(tmp_path))
    assert icfg["imb_algorithm"] == "daso"
    assert icfg["ulb_imb_ratio"] == -100
    ip = tmp_path / "classic_cv_imb" / "fixmatch_daso" / \
        "fixmatch_daso_cifar10_lb500_100_ulb4000_-100_1.yaml"
    assert ip.exists()
    iloaded = from_yaml(str(ip))
    assert iloaded.imb_algorithm == "daso"
    assert iloaded.lb_imb_ratio == 100
    # wrapper hyperparameters are emitted explicitly from DEFAULTS
    assert "daso_queue_len" in icfg


@pytest.mark.skipif(not os.path.isdir(CONFIG_DIR),
                    reason="checked-in config/ corpus absent")
def test_full_corpus_loads_and_resolves():
    files = sorted(glob.glob(os.path.join(CONFIG_DIR, "**", "*.yaml"),
                             recursive=True))
    assert len(files) >= 3000, f"corpus unexpectedly small: {len(files)}"
    alg_names = set(st.ALGORITHMS.keys())
    imb_names = set(st.IMB_ALGORITHMS.keys())
    net_names = set(st.NETS.keys())
    for f in files:
        cfg = from_yaml(f)
        assert cfg.algorithm in alg_names, (f, cfg.algorithm)
        if cfg.imb_algorithm:
            assert cfg.imb_algorithm in imb_names, (f, cfg.imb_algorithm)
        assert cfg.net in net_names, (f, cfg.net)
        assert cfg.num_classes > 0 and cfg.batch_size > 0

    # the README quick-start path must exist verbatim
    assert os.path.exists(os.path.join(
        CONFIG_DIR, "SemiReward", "usb_cv", "flexmatch",
        "flexmatch_cifar100_200_0.yaml"))
