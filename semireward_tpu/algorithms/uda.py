"""UDA (https://arxiv.org/abs/1904.12848).

TPU rebuild of reference semilearn/algorithms/uda/uda.py:12-134: fixed
threshold on the weak-view probs, soft (unsharpened) pseudo-labels, and TSA
(Training Signal Annealing) masking of the supervised CE.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


def tsa_threshold(schedule: str, step, total_iter: int, num_classes: int):
    """reference uda.py:112-126."""
    if schedule == "none":
        return jnp.asarray(1.0, jnp.float32)
    progress = step.astype(jnp.float32) / total_iter
    if schedule == "linear":
        thr = progress
    elif schedule == "exp":
        thr = jnp.exp((progress - 1.0) * 5.0)
    elif schedule == "log":
        thr = 1.0 - jnp.exp(-progress * 5.0)
    else:
        raise ValueError(f"unknown tsa schedule {schedule}")
    return thr * (1.0 - 1.0 / num_classes) + 1.0 / num_classes


@ALGORITHMS.register("uda")
class UDA(Algorithm):
    NAME = "uda"
    DEFAULTS = {"tsa_schedule": "none", "T": 0.4, "p_cutoff": 0.8}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        fwd = self.forward(ctx)
        tsa = tsa_threshold(cfg.tsa_schedule, ctx.step, cfg.num_train_iter,
                            cfg.num_classes)
        probs_lb = self.compute_prob(jax.lax.stop_gradient(fwd.logits_x_lb))
        sup_mask = (jnp.max(probs_lb, axis=-1) <= tsa).astype(jnp.float32)
        sup_loss = (self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"],
                            reduction="none") * sup_mask).mean()
        probs_w = self.compute_prob(fwd.logits_x_ulb_w)
        probs_w = self.maybe_dist_align(probs_w)
        mask = self.fixed_mask(probs_w)
        # soft pseudo-labels: the probs pass through unsharpened
        # (reference uda.py:93-99 with use_hard_label=False, softmax=False)
        pseudo_label = self.gen_ulb_targets(probs_w, use_hard_label=False, T=cfg.T,
                                       softmax=False)
        unsup_loss = self.consistency_loss(fwd.logits_x_ulb_s, pseudo_label, "ce", mask=mask)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=ctx.algo_state, mask=mask,
                         pseudo_label=pseudo_label)
