"""ABC (https://arxiv.org/abs/2110.10368) — Auxiliary Balanced Classifier.

TPU rebuild of reference semilearn/imb_algorithms/abc/abc.py: an auxiliary
classifier head trained with bernoulli class-balancing masks (labeled: from
min/count ratios; unlabeled: annealed toward those ratios over epochs), its
loss added to the base total; evaluation uses the auxiliary head's logits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import ce_loss as _ce
from semireward_tpu.algorithms import common as C
from semireward_tpu.imb.base import ImbAlgorithm
from semireward_tpu.models.initializers import torch_kernel_init, torch_bias_init


class AuxHeadNet(nn.Module):
    """ABCNet / TRASNet: backbone + auxiliary linear head over 'feat'
    (abc.py:15-27, tras.py:15-33)."""

    backbone: nn.Module
    num_classes: int

    def setup(self):
        self.aux_classifier = nn.Dense(
            self.num_classes, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init, dtype=jnp.float32,
            param_dtype=jnp.float32)

    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False, **kw):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat, **kw)
        res = self.backbone(x, train=train, **kw)
        res["logits_aux"] = self.aux_classifier(res["feat"])
        return res

    def aux(self, feat):
        return self.aux_classifier(feat)


@IMB_ALGORITHMS.register("abc")
class ABC(ImbAlgorithm):
    NAME = "abc"
    DEFAULTS = {"abc_p_cutoff": 0.95, "abc_loss_ratio": 1.0}
    EVAL_OUT_KEY = "logits_aux"

    @property
    def abc_p_cutoff(self):
        return float(self.cfg.extra.get("abc_p_cutoff", 0.95))

    @property
    def abc_loss_ratio(self):
        return float(self.cfg.extra.get("abc_loss_ratio", 1.0))

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info, base_cls)
        cnt = self.lb_class_counts()
        self.lb_class_dist = jnp.asarray(cnt.min() / cnt, jnp.float32)

    def wrap_model(self, model):
        return AuxHeadNet(backbone=self.base.wrap_model(model),
                          num_classes=self.cfg.num_classes)

    def post_loss(self, out, imb_state, ctx):
        """abc.py:86-150: aux-head loss on (lb, ulb_w no-grad, ulb_s)."""
        cfg = self.cfg
        fwd = out.fwd
        variables = {"params": ctx.params}
        if ctx.batch_stats:
            variables["batch_stats"] = ctx.batch_stats

        def aux_logits(feat):
            return ctx.apply_fn(variables, feat, method="aux")

        logits_lb = aux_logits(fwd.feats_x_lb)
        logits_s = aux_logits(fwd.feats_x_ulb_s)
        logits_w = jax.lax.stop_gradient(
            aux_logits(jax.lax.stop_gradient(fwd.feats_x_ulb_w)))

        k1, k2 = jax.random.split(jax.random.fold_in(ctx.rng, 31), 2)
        y_lb = ctx.batch["y_lb"]
        mask_lb = jax.random.bernoulli(
            k1, self.lb_class_dist[y_lb]).astype(jnp.float32)
        abc_lb_loss = (_ce(logits_lb, y_lb, reduction="none") * mask_lb).mean()

        probs_w = C.compute_prob(logits_w)
        max_probs = probs_w.max(axis=-1)
        y_ulb = probs_w.argmax(axis=-1)
        mask1 = (max_probs >= self.abc_p_cutoff).astype(jnp.float32)
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        epoch_frac = (ctx.step // num_iter_per_epoch).astype(jnp.float32) / max(cfg.epoch, 1)
        ulb_dist = 1.0 - epoch_frac * (1.0 - self.lb_class_dist)
        mask2 = jax.random.bernoulli(
            k2, jnp.clip(ulb_dist[y_ulb], 0.0, 1.0)).astype(jnp.float32)
        mask_ulb = mask1 * mask2
        abc_ulb_loss = (_ce(logits_s, y_ulb, reduction="none") * mask_ulb).mean()

        abc_loss = abc_lb_loss + abc_ulb_loss
        return self._add_loss(out, self.abc_loss_ratio * abc_loss,
                              "abc_loss", abc_loss)
