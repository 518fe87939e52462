"""End-to-end: Trainer on synthetic data — every layer exercised once
(SURVEY §7 build order step 2)."""
import numpy as np
import pytest

import jax.numpy as jnp

from semireward_tpu.config import get_config
from semireward_tpu.core.trainer import Trainer


def small_cfg(**kw):
    base = dict(
        algorithm="fixmatch", net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=32, batch_size=4, uratio=1,
        eval_batch_size=16, img_size=32, crop_ratio=0.875,
        num_train_iter=6, num_eval_iter=6, num_log_iter=3,
        optim="SGD", lr=0.03, ema_m=0.999, seed=1,
        compute_dtype="float32", save_dir="/tmp/srt_test",
        mesh_shape=(1,))
    base.update(kw)
    cfg = get_config(base)
    cfg.extra.setdefault("synthetic_train", 128)
    cfg.extra.setdefault("synthetic_test", 32)
    return cfg


class TestTrainerE2E:
    def test_fixmatch_runs_and_evaluates(self, tmp_path):
        cfg = small_cfg(save_dir=str(tmp_path))
        tr = Trainer(cfg, use_mesh=False)
        results = tr.train()
        assert "eval/top-1-acc" in results
        assert 0.0 <= results["eval/top-1-acc"] <= 1.0
        assert int(tr.state.step) == 6

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = small_cfg(save_dir=str(tmp_path))
        tr = Trainer(cfg, use_mesh=False)
        tr.train()
        import os
        best = os.path.join(str(tmp_path), cfg.save_name, "latest_model.ckpt")
        assert os.path.exists(best)
        tr2 = Trainer(small_cfg(save_dir=str(tmp_path)), use_mesh=False)
        tr2.load(best)
        assert int(tr2.state.step) == int(tr.state.step)
        np.testing.assert_allclose(
            np.asarray(tr2.predict(tr2.bundle.eval.data[:8])),
            np.asarray(tr.predict(tr.bundle.eval.data[:8])), rtol=1e-5)

    def test_resume_restores_best_tracking(self, tmp_path):
        """After a resume, best_metric/best_it must survive so the first
        post-resume eval cannot clobber model_best.ckpt with a worse model
        (reference persists best_it/best_eval_acc in the save dict)."""
        import os
        cfg = small_cfg(save_dir=str(tmp_path), num_train_iter=6,
                        num_eval_iter=3)
        tr = Trainer(cfg, use_mesh=False)
        tr.train()
        latest = os.path.join(str(tmp_path), cfg.save_name,
                              "latest_model.ckpt")
        tr2 = Trainer(small_cfg(save_dir=str(tmp_path), num_train_iter=6,
                                num_eval_iter=3), use_mesh=False)
        extra = tr2.load(latest)
        assert tr2.best_metric == tr.best_metric
        assert tr2.best_it == tr.best_it
        assert extra["algorithm"] == "fixmatch"

    def test_eval_cli_any_algorithm_and_train_model_flag(self, tmp_path):
        """eval.py end-to-end on a checkpoint written by srflexmatch (carries
        SR + curriculum state) — and --use_train_model evaluates the raw
        params instead of the EMA shadow."""
        import os
        cfg = small_cfg(algorithm="srflexmatch", save_dir=str(tmp_path),
                        num_train_iter=4, num_eval_iter=4, start_timing=2,
                        N_k=2, feature_dim=128)
        tr = Trainer(cfg, use_mesh=False)
        tr.train()
        latest = os.path.join(str(tmp_path), cfg.save_name,
                              "latest_model.ckpt")
        import eval as eval_cli
        argv = ["--load_path", latest, "--dataset", "synthetic",
                "--net", "wrn_28_2", "--num_classes", "4",
                "--img_size", "32", "--batch_size", "16"]
        m_ema = eval_cli.main(argv)
        m_raw = eval_cli.main(argv + ["--use_train_model"])
        assert 0.0 <= m_ema["top-1-acc"] <= 1.0
        assert 0.0 <= m_raw["top-1-acc"] <= 1.0
        # 4 steps in: EMA (m=0.999) is still ~init while params moved, so
        # the two paths must genuinely differ
        assert m_ema["loss"] != m_raw["loss"]

    def test_synthetic_learnable(self, tmp_path):
        """Supervised training on the blob dataset should beat chance.
        ema_m=0 (eval = live params) and a fast BN momentum — the reference
        defaults (ema 0.999, BN torch-momentum 0.001) only calibrate over
        thousands of steps."""
        cfg = small_cfg(algorithm="fullysupervised", num_train_iter=120,
                        num_eval_iter=120, num_log_iter=60, lr=0.05,
                        batch_size=16, ema_m=0.0, save_dir=str(tmp_path))
        cfg.extra["bn_momentum"] = 0.5
        tr = Trainer(cfg, use_mesh=False)
        res = tr.train()
        assert res["eval/top-1-acc"] > 0.5  # 4 classes, chance = 0.25
