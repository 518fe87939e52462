"""Pseudo-Label (https://arxiv.org/abs/1908.02983) and FullySupervised.

TPU rebuild of reference semilearn/algorithms/pseudolabel/pseudolabel.py:13-101
and fullysupervised/fullysupervised.py:9-68.

PseudoLabel forwards the unlabeled weak view through the model *with BN
frozen* (reference Bn_Controller, core/utils/misc.py:105-129) — here that is
simply "don't thread the new batch_stats from that sub-forward". The unsup
CE back-propagates through the same ulb logits that produced the (detached)
pseudo-label, ramped by ``unsup_warm_up``. The regression task branch
perturbs the ulb input with gaussian noise and uses an L1 consistency
(reference pseudolabel.py:60-66,84-86 + semireward.py add_gaussian_noise).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets, reg_loss
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@ALGORITHMS.register("fullysupervised")
@ALGORITHMS.register("supervised")
class FullySupervised(Algorithm):
    NAME = "fullysupervised"
    BATCH_KEYS = ("x_lb", "y_lb")

    def loss(self, ctx: StepCtx) -> LossOut:
        variables = {"params": ctx.params}
        if ctx.batch_stats:
            variables["batch_stats"] = ctx.batch_stats
        mutable = ["batch_stats"] if ctx.batch_stats else False
        out = ctx.apply_fn(variables, ctx.batch["x_lb"], train=True,
                           mutable=mutable, rngs={"dropout": ctx.rng})
        outs, new_state = (out if mutable else (out, {}))
        if self.cfg.is_regression:
            sup_loss = reg_loss(outs["logits"], ctx.batch["y_lb"],
                                mode=self.cfg.reg_loss if self.cfg.reg_loss.endswith("_loss")
                                else self.cfg.reg_loss)
        else:
            sup_loss = self.ce_loss(outs["logits"], ctx.batch["y_lb"], reduction="mean")
        fwd = C.ForwardOut(outs["logits"], outs["logits"], outs["logits"],
                           outs["feat"], outs["feat"], outs["feat"], new_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=jnp.asarray(0.0), fwd=fwd,
                         new_algo_state=ctx.algo_state, lambda_u=0.0)


@ALGORITHMS.register("pseudolabel")
class PseudoLabel(Algorithm):
    NAME = "pseudolabel"
    DEFAULTS = {"p_cutoff": 0.95, "unsup_warm_up": 0.4}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w")

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        b = ctx.batch
        variables = {"params": ctx.params}
        if ctx.batch_stats:
            variables["batch_stats"] = ctx.batch_stats
        mutable = ["batch_stats"] if ctx.batch_stats else False
        k_lb, k_ulb, k_noise = jax.random.split(ctx.rng, 3)

        out = ctx.apply_fn(variables, b["x_lb"], train=True, mutable=mutable,
                           rngs={"dropout": k_lb})
        outs_lb, new_state = (out if mutable else (out, {}))

        # ulb forward with BN frozen: batch stats used in-normalization but
        # the updated running stats are DISCARDED (Bn_Controller semantics)
        def frozen_fwd(x, key):
            o = ctx.apply_fn(variables, x, train=True, mutable=mutable,
                             rngs={"dropout": key})
            return o[0] if mutable else o

        if cfg.is_regression:
            noise = jax.random.normal(k_noise, b["x_ulb_w"].shape,
                                      b["x_ulb_w"].dtype) * 0.05
            outs_ulb = frozen_fwd(b["x_ulb_w"] + noise, k_ulb)
            outs_ulb_pseudo = frozen_fwd(b["x_ulb_w"], k_ulb)
            logits_ulb = outs_ulb["logits"]
            pseudo_src = jax.lax.stop_gradient(outs_ulb_pseudo["logits"])
            sup_loss = reg_loss(outs_lb["logits"], b["y_lb"])
            mask = jnp.ones((logits_ulb.shape[0],), jnp.float32)
            pseudo_label = pseudo_src
            unsup_loss = self.consistency_loss(logits_ulb, pseudo_label, "l1", mask=mask)
        else:
            outs_ulb = frozen_fwd(b["x_ulb_w"], k_ulb)
            logits_ulb = outs_ulb["logits"]
            probs = self.compute_prob(jax.lax.stop_gradient(logits_ulb))
            probs = self.maybe_dist_align(probs)
            sup_loss = self.ce_loss(outs_lb["logits"], b["y_lb"], reduction="mean")
            mask = self.fixed_mask(probs)
            pseudo_label = self.gen_ulb_targets(jax.lax.stop_gradient(logits_ulb),
                                           use_hard_label=True)
            unsup_loss = self.consistency_loss(logits_ulb, pseudo_label, "ce", mask=mask)

        warm = self.unsup_warmup_factor(ctx.step)
        fwd = C.ForwardOut(outs_lb["logits"], logits_ulb, logits_ulb,
                           outs_lb["feat"], outs_ulb["feat"], outs_ulb["feat"],
                           new_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=ctx.algo_state, mask=mask,
                         pseudo_label=pseudo_label, warmup=warm)
