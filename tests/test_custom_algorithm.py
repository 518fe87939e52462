"""The docs/tutorial.md §2 'Custom algorithm' sample, executed verbatim:
a user-registered Algorithm must train through the stock Trainer/jit
machinery (the analogue of the reference's Custom_Algorithm notebook)."""
import jax.numpy as jnp

import semireward_tpu as st
from semireward_tpu.algorithms import common as C  # noqa: F401 (as in docs)
from semireward_tpu.algorithms.base import Algorithm
from semireward_tpu.registry import ALGORITHMS


@ALGORITHMS.register("mymatch")
class MyMatch(Algorithm):
    NAME = "mymatch"
    DEFAULTS = {"p_cutoff": 0.9}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        return jnp.zeros(())

    def loss(self, ctx):
        fwd = self.forward(ctx)
        sup = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], "mean")
        probs = self.compute_prob(fwd.logits_x_ulb_w)
        mask = self.fixed_mask(probs)
        pl = self.gen_ulb_targets(probs, softmax=False)
        unsup = self.consistency_loss(fwd.logits_x_ulb_s, pl, "ce", mask=mask)
        return self.pack(sup_loss=sup, unsup_loss=unsup, fwd=fwd,
                         new_algo_state=ctx.algo_state, mask=mask,
                         pseudo_label=pl)


def test_custom_algorithm_trains(tmp_path):
    cfg = st.get_config(dict(
        algorithm="mymatch", net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        num_train_iter=2, num_eval_iter=2, num_log_iter=1,
        eval_batch_size=8, img_size=32, compute_dtype="float32",
        mesh_shape=(-1,), save_dir=str(tmp_path), save_name="mymatch"))
    assert cfg.p_cutoff == 0.9 or cfg.extra.get("p_cutoff") == 0.9
    tr = st.Trainer(cfg)
    res = tr.fit()
    assert "eval/top-1-acc" in res
    assert jnp.isfinite(res["eval/loss"])


def test_sr_wrapper_on_custom_algorithm(tmp_path):
    """docs/tutorial.md §2: one-line SemiReward composition on a
    user-registered algorithm."""
    from semireward_tpu.algorithms.semireward import _make_sr_variant

    _make_sr_variant("srmymatch", "mymatch")
    cfg = st.get_config(dict(
        algorithm="srmymatch", net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        num_train_iter=2, num_eval_iter=4, num_log_iter=1,
        eval_batch_size=8, img_size=32, compute_dtype="float32",
        mesh_shape=(-1,), save_dir=str(tmp_path), save_name="srmymatch",
        start_timing=1, N_k=1, feature_dim=128, sr_lr=1e-3))
    tr = st.Trainer(cfg)
    res = tr.fit()
    assert "eval/top-1-acc" in res
    assert tr.state.sr is not None  # rewarder/generator state threaded
