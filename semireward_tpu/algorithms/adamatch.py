"""AdaMatch (https://arxiv.org/abs/2106.04732).

TPU rebuild of reference semilearn/algorithms/adamatch/{adamatch.py,utils.py}:
distribution alignment with a 'model' p_target (EMA of labeled probs) and
relative confidence thresholding (cutoff = mean labeled max-prob * p_cutoff).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@ALGORITHMS.register("adamatch")
class AdaMatch(Algorithm):
    NAME = "adamatch"
    DEFAULTS = {"hard_label": True, "T": 0.5, "ema_p": 0.999, "p_cutoff": 0.95}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        state, _ = C.dist_align_ema_init(self.cfg.num_classes,
                                         update_target=True)
        return state

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        fwd = self.forward(ctx)
        sup_loss = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], reduction="mean")
        probs_lb = self.compute_prob(jax.lax.stop_gradient(fwd.logits_x_lb))
        probs_w = self.compute_prob(fwd.logits_x_ulb_w)
        new_state, probs_w = C.dist_align_ema(
            ctx.algo_state, probs_w, probs_x_lb=probs_lb,
            momentum=cfg.ema_p, update_target=True)
        # relative threshold (adamatch/utils.py:30-33)
        cutoff = probs_lb.max(axis=-1).mean() * cfg.p_cutoff
        mask = (probs_w.max(axis=-1) >= cutoff).astype(jnp.float32)
        pseudo_label = self.gen_ulb_targets(probs_w, use_hard_label=cfg.hard_label,
                                       T=cfg.T, softmax=False)
        unsup_loss = self.consistency_loss(fwd.logits_x_ulb_s, pseudo_label, "ce",
                                      mask=mask)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=new_state, mask=mask,
                         pseudo_label=pseudo_label)
