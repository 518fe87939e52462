"""SimMatch (https://arxiv.org/abs/2203.06915).

TPU rebuild of reference semilearn/algorithms/simmatch/simmatch.py:40-242:
semantic + instance consistency with a labeled memory bank indexed by
idx_lb. The bank [proj_size, K=lb_dest_len] lives on device; scatter updates
replace the in-place cuda writes (simmatch.py:118-127). For the small-bank
datasets the reference switches to EMA bank updates (ema_bank=0.7) and uses
the student features for the labeled bank entries — same here.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss
from semireward_tpu.models.wrappers import SimMatchNet
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx

_EMA_BANK_DATASETS = ("cifar10", "cifar100", "svhn", "superks", "tissuemnist",
                      "eurosat", "superbks", "esc50", "gtzan", "urbansound8k",
                      "aclImdb", "ag_news", "dbpedia", "synthetic")


@struct.dataclass
class SimMatchState:
    mem_bank: jnp.ndarray     # [proj_size, K]
    labels_bank: jnp.ndarray  # [K] int32
    dist_align: Any


@ALGORITHMS.register("simmatch")
class SimMatch(Algorithm):
    NAME = "simmatch"
    DEFAULTS = {"T": 0.5, "p_cutoff": 0.95, "proj_size": 128,
                "in_loss_ratio": 1.0, "smoothing_alpha": 0.9, "da_len": 256}
    BATCH_KEYS = ("idx_lb", "x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def __init__(self, cfg, data_info=None):
        super().__init__(cfg, data_info)
        self.use_ema_teacher = cfg.dataset not in _EMA_BANK_DATASETS
        self.ema_bank = 0.7
        self.K = int(self.data_info.get("lb_dest_len", 128))

    def wrap_model(self, model):
        return SimMatchNet(backbone=model, proj_size=self.cfg.proj_size)

    def init_state(self):
        cfg = self.cfg
        bank = jax.random.normal(jax.random.PRNGKey(cfg.seed + 11),
                                 (cfg.proj_size, self.K), jnp.float32)
        bank = bank / jnp.linalg.norm(bank, axis=0, keepdims=True)
        return SimMatchState(
            mem_bank=bank,
            labels_bank=jnp.zeros((self.K,), jnp.int32),
            dist_align=C.dist_align_queue_init(cfg.num_classes,
                                               queue_length=cfg.da_len))

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        st: SimMatchState = ctx.algo_state
        b = ctx.batch
        num_lb = b["y_lb"].shape[0]
        num_ulb = b["x_ulb_w"].shape[0]
        variables = {"params": ctx.params}
        has_bn = bool(ctx.batch_stats)
        if has_bn:
            variables["batch_stats"] = ctx.batch_stats

        bank = jax.lax.stop_gradient(st.mem_bank)

        inputs = jnp.concatenate([b["x_lb"], b["x_ulb_w"], b["x_ulb_s"]], 0)
        if has_bn:
            outs, new_state = ctx.apply_fn(variables, inputs, train=True,
                                           rngs={"dropout": ctx.rng},
                                           mutable=["batch_stats"])
        else:
            outs = ctx.apply_fn(variables, inputs, train=True,
                                rngs={"dropout": ctx.rng})
            new_state = {}
        logits, feats = outs["logits"], outs["feat"]
        logits_x_lb, ema_feats_x_lb = logits[:num_lb], feats[:num_lb]
        ema_logits_w = jax.lax.stop_gradient(logits[num_lb:num_lb + num_ulb])
        logits_s = logits[num_lb + num_ulb:]
        ema_feats_w = jax.lax.stop_gradient(feats[num_lb:num_lb + num_ulb])
        feats_s = feats[num_lb + num_ulb:]

        sup_loss = self.ce_loss(logits_x_lb, b["y_lb"], reduction="mean")

        if self.use_ema_teacher and ctx.ema_params is not None:
            # EMA-teacher labeled features for the bank (simmatch.py:169-172)
            tvars = {"params": ctx.ema_params}
            if has_bn:
                tvars["batch_stats"] = ctx.batch_stats
            ema_feats_x_lb = jax.lax.stop_gradient(
                ctx.apply_fn(tvars, b["x_lb"], train=False)["feat"])

        ema_probs_w = jax.nn.softmax(ema_logits_w.astype(jnp.float32), axis=-1)
        da_state, ema_probs_w = C.dist_align_queue(st.dist_align, ema_probs_w)

        # instance similarity teacher/student (simmatch.py:177-195)
        teacher_logits = ema_feats_w @ bank
        teacher_prob_orig = jax.nn.softmax(teacher_logits / cfg.T, axis=1)
        factor = ema_probs_w[:, st.labels_bank]               # gather [B,K]
        teacher_prob = teacher_prob_orig * factor
        teacher_prob = teacher_prob / teacher_prob.sum(axis=1, keepdims=True)

        if cfg.smoothing_alpha < 1:
            agg = jnp.zeros((num_ulb, cfg.num_classes), jnp.float32)
            agg = agg.at[:, st.labels_bank].add(teacher_prob_orig)
            probs_w = (ema_probs_w * cfg.smoothing_alpha
                       + agg * (1 - cfg.smoothing_alpha))
        else:
            probs_w = ema_probs_w

        student_logits = feats_s @ bank
        student_prob = jax.nn.softmax(student_logits / cfg.T, axis=1)
        in_loss = jnp.sum(-jax.lax.stop_gradient(teacher_prob)
                          * jnp.log(student_prob), axis=1).mean()
        # first epoch: no instance loss, plain probs (simmatch.py:197-199)
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        epoch0 = ctx.step // num_iter_per_epoch == 0
        in_loss = jnp.where(epoch0, 0.0, in_loss)
        probs_w = jnp.where(epoch0, ema_probs_w, probs_w)

        mask = self.fixed_mask(probs_w)
        unsup_loss = self.consistency_loss(logits_s, probs_w, "ce", mask=mask)

        # bank update (simmatch.py:118-127)
        k = jax.lax.stop_gradient(ema_feats_x_lb)
        idx = b["idx_lb"].astype(jnp.int32)
        if self.use_ema_teacher:
            new_cols = k.T
        else:
            cols = st.mem_bank[:, idx]
            mixed = self.ema_bank * cols + (1 - self.ema_bank) * k.T
            new_cols = mixed / jnp.linalg.norm(mixed, axis=0, keepdims=True)
        mem_bank = st.mem_bank.at[:, idx].set(new_cols)
        labels_bank = st.labels_bank.at[idx].set(b["y_lb"].astype(jnp.int32))

        new_algo = SimMatchState(mem_bank=mem_bank, labels_bank=labels_bank,
                                 dist_align=da_state)
        extra = cfg.in_loss_ratio * in_loss
        fwd_out = C.ForwardOut(logits_x_lb, ema_logits_w, logits_s,
                               ema_feats_x_lb, ema_feats_w, feats_s, new_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd_out,
                         new_algo_state=new_algo, mask=mask,
                         pseudo_label=probs_w, extra_loss=extra,
                         metrics={"in_loss": in_loss})
