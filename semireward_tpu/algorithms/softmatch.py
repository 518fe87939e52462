"""SoftMatch (https://arxiv.org/abs/2301.10921).

TPU rebuild of reference semilearn/algorithms/softmatch/{softmatch.py,utils.py}:
truncated-Gaussian confidence weighting with EMA (mu, sigma^2) plus uniform
distribution alignment.
"""
from __future__ import annotations

from typing import Any, NamedTuple

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


class SoftMatchAlgoState(NamedTuple):
    gaussian: Any
    dist_align: Any


@ALGORITHMS.register("softmatch")
class SoftMatch(Algorithm):
    NAME = "softmatch"
    DEFAULTS = {"hard_label": True, "T": 0.5, "dist_align": True,
                "dist_uniform": True, "ema_p": 0.999, "n_sigma": 2,
                "per_class": False}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        cfg = self.cfg
        da, _ = C.dist_align_ema_init(
            cfg.num_classes,
            p_target=None if cfg.dist_uniform else None,
            update_target=not cfg.dist_uniform,
        )
        return SoftMatchAlgoState(
            gaussian=C.softmatch_init(cfg.num_classes, cfg.per_class),
            dist_align=da,
        )

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        fwd = self.forward(ctx)
        sup_loss = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], reduction="mean")
        probs_w = self.compute_prob(fwd.logits_x_ulb_w)
        da_state = ctx.algo_state.dist_align
        if cfg.dist_align:
            probs_lb = self.compute_prob(fwd.logits_x_lb)
            da_state, probs_w = C.dist_align_ema(
                da_state, probs_w,
                probs_x_lb=probs_lb if not cfg.dist_uniform else None,
                momentum=cfg.ema_p, update_target=not cfg.dist_uniform)
        g_state, mask = C.softmatch_mask(
            ctx.algo_state.gaussian, probs_w, n_sigma=cfg.n_sigma,
            momentum=cfg.ema_p, per_class=cfg.per_class)
        # pseudo-labels come from the RAW weak logits, not the aligned probs
        # (reference softmatch.py:93-99)
        pseudo_label = self.gen_ulb_targets(
            fwd.logits_x_ulb_w, use_hard_label=cfg.hard_label, T=cfg.T,
            softmax=True)
        unsup_loss = self.consistency_loss(fwd.logits_x_ulb_s, pseudo_label, "ce", mask=mask)
        new_state = SoftMatchAlgoState(gaussian=g_state, dist_align=da_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=new_state, mask=mask,
                         pseudo_label=pseudo_label)
