"""CRMatch (https://arxiv.org/abs/2112.05825).

TPU rebuild of reference semilearn/algorithms/crmatch/crmatch.py:120-300:
FixMatch-style masked CE + feature-level consistency (cosine embedding loss
pushing the ds-head outputs of weak/strong views apart ... the reference
passes target=-1, i.e. Ld = max(0, cos(ds_s, ds_w)) per sample) + 4-way
rotation self-supervision on a separate rotated unlabeled stream (all four
rotations of each image per step, rot_v = [0...,1...,2...,3...]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss
from semireward_tpu.models.wrappers import CRMatchNet
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


def cosine_embedding_loss_neg(a, b):
    """F.cosine_embedding_loss(a, b, target=-1, reduction='none'):
    per-sample max(0, cos_sim) (default margin 0)."""
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    cos = jnp.sum(an * bn, axis=1)
    return jnp.maximum(cos, 0.0)


@ALGORITHMS.register("crmatch")
class CRMatch(Algorithm):
    NAME = "crmatch"
    DEFAULTS = {"hard_label": True, "rot_loss_ratio": 1.0, "p_cutoff": 0.95}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s", "x_ulb_rot", "rot_v")

    @property
    def use_rot(self) -> bool:
        return self.cfg.rot_loss_ratio > 0

    def wrap_model(self, model):
        return CRMatchNet(backbone=model, num_classes=self.cfg.num_classes)

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        b = ctx.batch
        num_lb = b["y_lb"].shape[0]
        num_ulb = b["x_ulb_w"].shape[0]
        variables = {"params": ctx.params}
        has_bn = bool(ctx.batch_stats)
        if has_bn:
            variables["batch_stats"] = ctx.batch_stats

        parts = [b["x_lb"], b["x_ulb_w"], b["x_ulb_s"]]
        use_rot = self.use_rot and ("x_ulb_rot" in b)
        if use_rot:
            parts.append(b["x_ulb_rot"])
        inputs = jnp.concatenate(parts, 0)
        kw = dict(train=True, rngs={"dropout": ctx.rng}, use_rot=use_rot)
        if has_bn:
            outs, new_state = ctx.apply_fn(variables, inputs,
                                           mutable=["batch_stats"], **kw)
        else:
            outs, new_state = ctx.apply_fn(variables, inputs, **kw), {}

        logits, feats, logits_ds = outs["logits"], outs["feat"], outs["logits_ds"]
        logits_x_lb, feats_x_lb = logits[:num_lb], feats[:num_lb]
        logits_w = jax.lax.stop_gradient(logits[num_lb:num_lb + num_ulb])
        logits_s = logits[num_lb + num_ulb:num_lb + 2 * num_ulb]
        feats_w = jax.lax.stop_gradient(feats[num_lb:num_lb + num_ulb])
        feats_s = feats[num_lb + num_ulb:num_lb + 2 * num_ulb]
        ds_w = jax.lax.stop_gradient(
            logits_ds[num_lb:num_lb + num_ulb])
        ds_s = logits_ds[num_lb + num_ulb:num_lb + 2 * num_ulb]

        y_ulb = jnp.argmax(logits_w, axis=-1)
        mask = self.fixed_mask(self.compute_prob(logits_w))

        Lx = self.ce_loss(logits_x_lb, b["y_lb"], reduction="mean")
        Lu = (self.ce_loss(logits_s, y_ulb, reduction="none") * mask).mean()
        Ld = (cosine_embedding_loss_neg(ds_s, ds_w) * mask).mean()

        extra = Ld
        rot_loss = jnp.asarray(0.0)
        if use_rot:
            logits_rot = outs["logits_rot"][num_lb + 2 * num_ulb:]
            rot_loss = self.ce_loss(logits_rot, b["rot_v"], reduction="mean")
            extra = extra + rot_loss

        fwd_out = C.ForwardOut(logits_x_lb, logits_w, logits_s, feats_x_lb,
                               feats_w, feats_s, new_state)
        # reference total = Lx + Lu + Ld (+ Lrot), i.e. lambda_u = 1 on Lu
        return self.pack(sup_loss=Lx, unsup_loss=Lu, fwd=fwd_out,
                         new_algo_state=ctx.algo_state, mask=mask,
                         pseudo_label=y_ulb, lambda_u=1.0, extra_loss=extra,
                         metrics={"Ld": Ld, "rot_loss": rot_loss})
