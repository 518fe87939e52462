"""CoMatch (https://arxiv.org/abs/2011.11183).

TPU rebuild of reference semilearn/algorithms/comatch/comatch.py:
projection-head net, queue dist-align, memory-smoothed pseudo-probs over a
fixed-size embedding bank, pseudo-label graph contrastive loss. The memory
bank is a device-resident ring buffer updated by dynamic_update_slice (the
reference mutates cuda tensors in-place, comatch.py:127-137).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss
from semireward_tpu.models.wrappers import ProjectionNet
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@struct.dataclass
class CoMatchState:
    queue_feats: jnp.ndarray  # [queue_size, proj]
    queue_probs: jnp.ndarray  # [queue_size, C]
    queue_ptr: jnp.ndarray    # int32
    dist_align: Any


def comatch_contrastive_loss(f0, f1, Q, T=0.2):
    """reference comatch.py:42-50."""
    sim = jnp.exp(jnp.matmul(f0, f1.T) / T)
    sim_probs = sim / sim.sum(axis=1, keepdims=True)
    return (-(jnp.log(sim_probs + 1e-7) * Q).sum(axis=1)).mean()


@ALGORITHMS.register("comatch")
class CoMatch(Algorithm):
    NAME = "comatch"
    DEFAULTS = {"hard_label": True, "T": 0.5, "p_cutoff": 0.95,
                "contrast_p_cutoff": 0.8, "contrast_loss_ratio": 1.0,
                "proj_size": 128, "queue_batch": 128,
                "smoothing_alpha": 0.9, "da_len": 256}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s_0", "x_ulb_s_1")

    def wrap_model(self, model):
        return ProjectionNet(backbone=model, proj_size=self.cfg.proj_size)

    @property
    def queue_size(self) -> int:
        cfg = self.cfg
        return int(cfg.queue_batch * (cfg.uratio + 1) * cfg.batch_size)

    def init_state(self):
        cfg = self.cfg
        return CoMatchState(
            queue_feats=jnp.zeros((self.queue_size, cfg.proj_size), jnp.float32),
            queue_probs=jnp.zeros((self.queue_size, cfg.num_classes), jnp.float32),
            queue_ptr=jnp.asarray(0, jnp.int32),
            dist_align=C.dist_align_queue_init(cfg.num_classes,
                                               queue_length=cfg.da_len))

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        st: CoMatchState = ctx.algo_state
        b = ctx.batch
        num_lb = b["y_lb"].shape[0]
        num_ulb = b["x_ulb_w"].shape[0]
        variables = {"params": ctx.params}
        has_bn = bool(ctx.batch_stats)
        if has_bn:
            variables["batch_stats"] = ctx.batch_stats

        inputs = jnp.concatenate([b["x_lb"], b["x_ulb_w"], b["x_ulb_s_0"],
                                  b["x_ulb_s_1"]], 0)
        if has_bn:
            outs, new_state = ctx.apply_fn(variables, inputs, train=True,
                                           rngs={"dropout": ctx.rng},
                                           mutable=["batch_stats"])
        else:
            outs = ctx.apply_fn(variables, inputs, train=True,
                                rngs={"dropout": ctx.rng})
            new_state = {}
        logits, feats = outs["logits"], outs["feat"]
        logits_x_lb, feats_x_lb = logits[:num_lb], feats[:num_lb]
        sp = [num_lb, num_lb + num_ulb, num_lb + 2 * num_ulb]
        logits_w = jax.lax.stop_gradient(logits[sp[0]:sp[1]])
        logits_s0 = logits[sp[1]:sp[2]]
        feats_w = jax.lax.stop_gradient(feats[sp[0]:sp[1]])
        feats_s0, feats_s1 = feats[sp[1]:sp[2]], feats[sp[2]:]

        sup_loss = self.ce_loss(logits_x_lb, b["y_lb"], reduction="mean")

        feats_lb_sg = jax.lax.stop_gradient(feats_x_lb)
        probs = self.compute_prob(logits_w)
        da_state, probs = C.dist_align_queue(st.dist_align, probs)
        probs_orig = probs

        # memory smoothing once the bank warmed up (comatch.py:180-184)
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        warmed = jnp.logical_and(ctx.step // num_iter_per_epoch > 0,
                                 ctx.step > cfg.queue_batch)
        A = jnp.exp(jnp.matmul(feats_w, st.queue_feats.T) / cfg.T)
        A = A / A.sum(axis=1, keepdims=True)
        probs_smoothed = (cfg.smoothing_alpha * probs
                          + (1 - cfg.smoothing_alpha)
                          * jnp.matmul(A, st.queue_probs))
        probs = jnp.where(warmed, probs_smoothed, probs)

        mask = self.fixed_mask(probs)

        # bank update (comatch.py:190-193): [ulb_w feats+orig probs, lb feats+onehot]
        ins_feats = jnp.concatenate([feats_w, feats_lb_sg], 0)
        ins_probs = jnp.concatenate(
            [probs_orig, jax.nn.one_hot(b["y_lb"], cfg.num_classes)], 0)
        qf = jax.lax.dynamic_update_slice(st.queue_feats, ins_feats,
                                          (st.queue_ptr, 0))
        qp = jax.lax.dynamic_update_slice(st.queue_probs, ins_probs,
                                          (st.queue_ptr, 0))
        ptr = (st.queue_ptr + ins_feats.shape[0]) % self.queue_size

        unsup_loss = self.consistency_loss(logits_s0, probs, "ce", mask=mask)

        # pseudo-label graph with self-loop (comatch.py:201-206)
        Q = jnp.matmul(probs, probs.T)
        Q = jnp.fill_diagonal(Q, 1.0, inplace=False)
        pos_mask = (Q >= cfg.contrast_p_cutoff).astype(jnp.float32)
        Q = Q * pos_mask
        Q = Q / Q.sum(axis=1, keepdims=True)
        contrast_loss = comatch_contrastive_loss(feats_s0, feats_s1, Q, T=cfg.T)

        new_algo = CoMatchState(queue_feats=qf, queue_probs=qp, queue_ptr=ptr,
                                dist_align=da_state)
        extra = cfg.contrast_loss_ratio * contrast_loss
        fwd_out = C.ForwardOut(logits_x_lb, logits_w, logits_s0, feats_x_lb,
                               feats_w, feats_s0, new_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd_out,
                         new_algo_state=new_algo, mask=mask,
                         pseudo_label=probs, extra_loss=extra,
                         metrics={"contrast_loss": contrast_loss})
