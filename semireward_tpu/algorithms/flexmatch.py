"""FlexMatch (https://arxiv.org/abs/2110.08263).

TPU rebuild of reference semilearn/algorithms/flexmatch/{flexmatch.py,utils.py}:
FixMatch + Curriculum Pseudo Labeling. The full-ulb-set ``selected_label``
vector lives on device and updates by scatter + bincount inside the jitted
step (the reference round-trips it through a host Counter every iteration,
flexmatch/utils.py:23-35).
"""
from __future__ import annotations

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@ALGORITHMS.register("flexmatch")
class FlexMatch(Algorithm):
    NAME = "flexmatch"
    DEFAULTS = {"hard_label": True, "T": 0.5, "p_cutoff": 0.95,
                "thresh_warmup": True}
    BATCH_KEYS = ("x_lb", "y_lb", "idx_ulb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        return C.flex_init(self.data_info["ulb_dest_len"], self.cfg.num_classes)

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        fwd = self.forward(ctx)
        sup_loss = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], reduction="mean")
        probs_w = self.compute_prob(fwd.logits_x_ulb_w)
        probs_w = self.maybe_dist_align(probs_w)
        new_state, mask = C.flex_mask(
            ctx.algo_state, probs_w, ctx.batch["idx_ulb"],
            cfg.p_cutoff, cfg.thresh_warmup)
        pseudo_label = self.gen_ulb_targets(
            probs_w, use_hard_label=cfg.hard_label, T=cfg.T, softmax=False)
        unsup_loss = self.consistency_loss(fwd.logits_x_ulb_s, pseudo_label, "ce", mask=mask)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=new_state, mask=mask,
                         pseudo_label=pseudo_label)
