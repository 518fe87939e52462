"""Config system: reference-YAML key parity, per-algorithm defaults,
generator round-trip."""
import os

import numpy as np
import pytest

from semireward_tpu import config as config_lib

REF_CFG = ("/root/reference/config/SemiReward/usb_cv/flexmatch/"
           "flexmatch_cifar100_200_0.yaml")


class TestReferenceYAML:
    @pytest.mark.skipif(not os.path.exists(REF_CFG),
                        reason="reference configs not mounted")
    def test_loads_reference_yaml(self):
        cfg = config_lib.from_yaml(REF_CFG)
        assert cfg.algorithm == "srflexmatch"
        assert cfg.net == "vit_small_patch2_32"
        assert cfg.num_train_iter == 204800
        assert cfg.batch_size == 8
        assert cfg.start_timing == 20000
        assert cfg.feature_dim == 384
        assert cfg.sr_lr == 0.0005
        assert cfg.N_k == 10
        assert cfg.sr_ema is False
        assert cfg.layer_decay == 0.5
        assert cfg.lambda_u == 1.0

    @pytest.mark.skipif(not os.path.isdir("/root/reference/config"),
                        reason="reference configs not mounted")
    def test_loads_many_reference_yamls(self):
        """Every sampled reference YAML must parse with zero unknown keys
        silently dropped (unknowns land in cfg.extra)."""
        import glob

        files = sorted(glob.glob("/root/reference/config/*/*/*.yaml"))[::37]
        assert len(files) > 10
        for f in files:
            cfg = config_lib.from_yaml(f)
            assert cfg.num_classes > 0


class TestDefaults:
    def test_algorithm_defaults_injected(self):
        cfg = config_lib.get_config(dict(algorithm="uda"))
        assert cfg.T == 0.4 and cfg.p_cutoff == 0.8  # uda get_argument
        cfg = config_lib.get_config(dict(algorithm="fixmatch"))
        assert cfg.T == 0.5 and cfg.p_cutoff == 0.95

    def test_user_overrides_beat_defaults(self):
        cfg = config_lib.get_config(dict(algorithm="uda", p_cutoff=0.5))
        assert cfg.p_cutoff == 0.5

    def test_bool_string_coercion(self):
        cfg = config_lib.get_config(dict(hard_label="False", amp="True"))
        assert cfg.hard_label is False and cfg.amp is True


class TestGenerator:
    def test_generator_roundtrip(self, tmp_path):
        import sys
        sys.path.insert(0, "scripts")
        from config_generator import create_configuration

        create_configuration("usb_cv", "srflexmatch", "cifar100", 200, 0,
                             str(tmp_path))
        # SR configs land under SemiReward/<suite>/<base>/ with the base
        # algorithm's file name (reference layout)
        path = tmp_path / "SemiReward" / "usb_cv" / "flexmatch" / \
            "flexmatch_cifar100_200_0.yaml"
        assert path.exists()
        cfg = config_lib.from_yaml(str(path))
        assert cfg.algorithm == "srflexmatch"
        assert cfg.start_timing == 20000


class TestCLI:
    def test_train_cli_smoke(self, tmp_path):
        """python train.py end-to-end on synthetic data (4 steps)."""
        import subprocess, sys, os
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, "train.py", "--algorithm", "fixmatch",
             "--net", "wrn_28_2", "--dataset", "synthetic",
             "--num_classes", "4", "--num_labels", "16", "--eval_batch_size", "8",
             "--batch_size", "8", "--uratio", "1",
             "--num_train_iter", "4", "--num_eval_iter", "4",
             "--num_log_iter", "2", "--optim", "SGD", "--lr", "0.01",
             "--img_size", "32", "--compute_dtype", "float32",
             "--save_dir", str(tmp_path), "--save_name", "cli",
             "--mesh_shape", "(-1,)"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert out.returncode == 0, out.stderr[-2000:]
        assert "top-1-acc" in out.stdout + out.stderr
        ckpt = tmp_path / "cli" / "latest_model.ckpt"
        assert ckpt.exists()

        # eval.py on the checkpoint just produced (reference eval.py flow)
        out2 = subprocess.run(
            [sys.executable, "eval.py", "--load_path", str(ckpt),
             "--dataset", "synthetic", "--net", "wrn_28_2",
             "--num_classes", "4", "--img_size", "32", "--batch_size", "8"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert out2.returncode == 0, out2.stderr[-2000:]
        assert "Test Accuracy:" in out2.stdout

        # resume: same run continues from the checkpoint (train.py:58)
        out3 = subprocess.run(
            [sys.executable, "train.py", "--algorithm", "fixmatch",
             "--net", "wrn_28_2", "--dataset", "synthetic",
             "--num_classes", "4", "--num_labels", "16", "--eval_batch_size", "8",
             "--batch_size", "8", "--uratio", "1",
             "--num_train_iter", "6", "--num_eval_iter", "6",
             "--num_log_iter", "2", "--optim", "SGD", "--lr", "0.01",
             "--img_size", "32", "--compute_dtype", "float32",
             "--save_dir", str(tmp_path), "--save_name", "cli",
             "--mesh_shape", "(-1,)", "--resume",
             "--load_path", str(ckpt)],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert out3.returncode == 0, out3.stderr[-2000:]
        assert "resumed from" in out3.stdout + out3.stderr
