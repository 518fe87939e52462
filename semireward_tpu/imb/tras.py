"""TRAS (TRAnsfer and Share, https://arxiv.org/abs/2205.13358).

TPU rebuild of reference semilearn/imb_algorithms/tras/{tras.py,utils.py}:
auxiliary head trained with logit-adjusted CE (la = log(dist^tro)) plus a
temperature-KL transfer from the main head's (adjusted) weak logits; after
the warm-up epochs evaluation switches to the auxiliary head. compute_prob
is logit-adjusted everywhere. Only supports FixMatch (tras.py:89).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import ce_loss as _ce, gen_ulb_targets
from semireward_tpu.algorithms import common as C
from semireward_tpu.imb.base import ImbAlgorithm
from semireward_tpu.imb.abc import AuxHeadNet


def tras_kl_loss(outputs, targets, T, mask):
    """reference tras/utils.py:19-25."""
    _p = jax.nn.log_softmax(outputs.astype(jnp.float32) / T, axis=1)
    _q = jax.nn.softmax(targets.astype(jnp.float32) / (T * 2), axis=1)
    return -jnp.mean(jnp.sum(_q * _p, axis=1) * mask) * T * T


@IMB_ALGORITHMS.register("tras")
class TRAS(ImbAlgorithm):
    NAME = "tras"
    DEFAULTS = {"tras_warmup_epochs": 10, "tras_A": 2, "tras_B": 2,
                "tras_tro": 1.0}
    SUPPORTED_BASES = ("fixmatch",)

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info, base_cls)
        x = cfg.extra
        self.A = float(x.get("tras_A", 2))
        self.B = float(x.get("tras_B", 2))
        self.tro = float(x.get("tras_tro", 1.0))
        self.warmup_epochs = int(x.get("tras_warmup_epochs", 10))
        cnt = self.lb_class_counts()
        dist = jnp.asarray(cnt.min() / cnt, jnp.float32)
        self.la = jnp.log(dist ** self.tro + 1e-12)
        # T_logit = A * softmax(-la) + B (tras.py:106-108)
        self.T_logit = self.A * jax.nn.softmax(-self.la) + self.B

    def eval_out_key(self, step: int) -> str:
        num_iter_per_epoch = max(self.cfg.num_train_iter
                                 // max(self.cfg.epoch, 1), 1)
        epoch = step // num_iter_per_epoch
        return "logits" if epoch < self.warmup_epochs else "logits_aux"

    def wrap_model(self, model):
        return AuxHeadNet(backbone=self.base.wrap_model(model),
                          num_classes=self.cfg.num_classes)

    def override_names(self):
        return ("compute_prob",)

    def imb_compute_prob(self, logits):
        # tras.py:169-170: logit-adjusted probs everywhere
        return C.compute_prob(logits - self.la)

    def post_loss(self, out, imb_state, ctx):
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

        # tras_ce_loss: CE on (logits + la) (tras/utils.py:10-16)
        tras_sup = _ce(logits_lb + self.la, ctx.batch["y_lb"],
                       reduction="mean")

        probs_w = jax.nn.softmax(logits_w.astype(jnp.float32), axis=-1)
        mask = C.fixed_threshold_mask(probs_w, cfg.p_cutoff)
        pseudo_label = gen_ulb_targets(probs_w, use_hard_label=cfg.hard_label,
                                       T=cfg.T, softmax=False)
        pl_int = (pseudo_label if pseudo_label.ndim == 1
                  else jnp.argmax(pseudo_label, axis=-1)).astype(jnp.int32)
        la_u = self.la[None, :] * self.T_logit[pl_int][:, None]
        tras_unsup = tras_kl_loss(logits_s, logits_w - la_u, 1.0, mask)
        tras_loss = tras_sup + tras_unsup

        # tras.py:141-143: skipped during warm-up epochs
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        active = (ctx.step // num_iter_per_epoch) >= self.warmup_epochs
        tras_loss = jnp.where(active, tras_loss, 0.0)
        return self._add_loss(out, tras_loss, "tras_loss", tras_loss)
