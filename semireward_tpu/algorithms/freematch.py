"""FreeMatch (https://arxiv.org/abs/2205.07246).

TPU rebuild of reference semilearn/algorithms/freematch/{freematch.py,utils.py}:
Self-Adaptive Thresholding (global time_p + per-class p_model EMAs) plus the
self-adaptive fairness (entropy-meaning) loss. Cross-replica statistics come
for free from global-batch means under pjit (reference uses
concat_all_gather, freematch/utils.py:25-26).
"""
from __future__ import annotations

import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@ALGORITHMS.register("freematch")
class FreeMatch(Algorithm):
    NAME = "freematch"
    DEFAULTS = {"hard_label": True, "T": 0.5, "ema_p": 0.999,
                "ent_loss_ratio": 0.01, "use_quantile": False,
                "clip_thresh": False}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        return C.free_init(self.cfg.num_classes)

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        fwd = self.forward(ctx)
        sup_loss = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], reduction="mean")
        probs_w = self.compute_prob(fwd.logits_x_ulb_w)
        new_state, mask = C.free_mask(
            ctx.algo_state, probs_w, momentum=cfg.ema_p,
            use_quantile=cfg.use_quantile, clip_thresh=cfg.clip_thresh)
        # reference passes raw logits to gen_ulb_targets (softmax inside)
        pseudo_label = self.gen_ulb_targets(
            fwd.logits_x_ulb_w, use_hard_label=cfg.hard_label, T=cfg.T,
            softmax=True)
        unsup_loss = self.consistency_loss(fwd.logits_x_ulb_s, pseudo_label, "ce", mask=mask)
        ent_loss = C.free_entropy_loss(mask, fwd.logits_x_ulb_s,
                                       new_state.p_model, new_state.label_hist)
        extra = cfg.ent_loss_ratio * ent_loss
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=new_state, extra_loss=extra, mask=mask,
                         pseudo_label=pseudo_label,
                         metrics={"ent_loss": ent_loss,
                                  # SAT observability (audit: a collapse is
                                  # time_p falling below the confidence
                                  # distribution -> util_ratio -> 1.0)
                                  "time_p": new_state.time_p,
                                  "max_prob_mean": probs_w.max(-1).mean()})
