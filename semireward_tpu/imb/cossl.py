"""CoSSL (https://arxiv.org/abs/2112.04564) — co-learning with a
Tail-Feature-Enhanced (TFE) teacher classifier.

TPU rebuild of reference semilearn/imb_algorithms/cossl/{cossl.py,utils.py}:
a second classifier head trained on mixup'd features from a class-balanced
labeled stream and an unlabeled stream (tail classes mix more:
p_c = (max_cnt - cnt_c)/max_cnt, lam ~ U(max_lam, 1)); evaluation switches
to the teacher head after ``cossl_warm_epoch``.

Deviations (documented):
- the reference steps the teacher head with BOTH the main optimizer and a
  dedicated SGD (cossl.py:50-75 CoSSLParamUpdateHook) — an effective-LR
  quirk; here the teacher head trains with the main optimizer only.
- the teacher's warm-start (``classifier_warmup``, cossl/utils.py — a
  separate balanced-classifier fit from EMA features at the warm boundary)
  is not yet ported; the head trains online from scratch instead.

The class-balanced TFE labeled stream comes from the loader's weighted
extra-stream support (reference get_weighted_sampler, cossl.py:150-160).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import ce_loss as _ce
from semireward_tpu.imb.base import ImbAlgorithm
from semireward_tpu.models.initializers import torch_kernel_init, torch_bias_init


class CoSSLNet(nn.Module):
    """backbone + TFE teacher classifier (cossl.py:20-48)."""

    backbone: nn.Module
    num_classes: int

    def setup(self):
        self.teacher_classifier = nn.Dense(
            self.num_classes, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init, dtype=jnp.float32,
            param_dtype=jnp.float32)

    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False, **kw):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat, **kw)
        res = self.backbone(x, train=train, **kw)
        res["logits_tfe"] = self.teacher_classifier(res["feat"])
        return res

    def teacher(self, feat):
        return self.teacher_classifier(feat)


@IMB_ALGORITHMS.register("cossl")
class CoSSL(ImbAlgorithm):
    NAME = "cossl"
    DEFAULTS = {"cossl_max_lam": 0.6, "cossl_tfe_augment": "strong",
                "cossl_tfe_u_ratio": 1, "cossl_warm_epoch": 0,
                "cossl_tfe_warm_epoch": 1, "cossl_tfe_warm_lr": 0.02,
                "cossl_tfe_warm_ema_decay": 0.999, "cossl_tfe_warm_wd": 5e-4,
                "cossl_tfe_warm_bs": 64}
    # extra raw streams the loader must provide: (balanced labeled, ulb)
    EXTRA_STREAMS = ("tfe_lb", "tfe_ulb")

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info, base_cls)
        x = cfg.extra
        self.max_lam = float(x.get("cossl_max_lam", 0.6))
        self.tfe_augment = str(x.get("cossl_tfe_augment", "strong"))
        self.tfe_u_ratio = int(x.get("cossl_tfe_u_ratio", 1))
        self.warm_epoch = int(x.get("cossl_warm_epoch", 0))
        cnt = self.lb_class_counts()
        # mixup_prob[c] = (max - cnt_c)/max (cossl.py:95-97)
        self.mixup_prob = jnp.asarray((cnt.max() - cnt) / cnt.max(),
                                      jnp.float32)
        self.BATCH_KEYS = tuple(dict.fromkeys(
            self.BATCH_KEYS + ("x_tfe_lb", "y_tfe_lb", "x_tfe_ulb")))

    def wrap_model(self, model):
        return CoSSLNet(backbone=self.base.wrap_model(model),
                        num_classes=self.cfg.num_classes)

    def eval_out_key(self, step: int) -> str:
        num_iter_per_epoch = max(self.cfg.num_train_iter
                                 // max(self.cfg.epoch, 1), 1)
        epoch = step // num_iter_per_epoch
        return "logits_tfe" if epoch >= self.warm_epoch else "logits"

    def post_loss(self, out, imb_state, ctx):
        cfg = self.cfg
        b = ctx.batch
        if "x_tfe_lb" not in b:
            return out
        variables = {"params": ctx.params}
        if ctx.batch_stats:
            variables["batch_stats"] = ctx.batch_stats

        # EMA-model features for the TFE streams (cossl.py:219-226)
        teacher_params = (ctx.ema_params if ctx.ema_params is not None
                          else ctx.params)
        tvars = {"params": teacher_params}
        if ctx.batch_stats:
            tvars["batch_stats"] = ctx.batch_stats
        feat_x = jax.lax.stop_gradient(ctx.apply_fn(
            tvars, b["x_tfe_lb"], train=False, only_feat=True))
        feat_u = jax.lax.stop_gradient(ctx.apply_fn(
            tvars, b["x_tfe_ulb"], train=False, only_feat=True))
        y_x = b["y_tfe_lb"].astype(jnp.int32)
        n = y_x.shape[0]
        feat_u = feat_u[:n]

        k1, k2 = jax.random.split(jax.random.fold_in(ctx.rng, 77))
        do_mix = jax.random.uniform(k1, (n,)) < self.mixup_prob[y_x]
        lam = jax.random.uniform(k2, (n, 1), minval=self.max_lam, maxval=1.0)
        mixed = jnp.where(do_mix[:, None], lam * feat_x + (1 - lam) * feat_u,
                          feat_x)

        teacher_logits = ctx.apply_fn(variables, mixed, method="teacher")
        teacher_loss = _ce(teacher_logits, y_x, reduction="mean")

        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        active = (ctx.step // num_iter_per_epoch) >= self.warm_epoch
        term = jnp.where(active, teacher_loss, 0.0)
        return self._add_loss(out, term, "tea_loss", teacher_loss)
