"""ReMixMatch (https://arxiv.org/abs/1911.09785).

TPU rebuild of reference semilearn/algorithms/remixmatch/remixmatch.py:
dist-align to the labeled ('gt') class distribution, sharpened targets,
mixup over [lb, s0, s1, w] (is_bias=True), per-chunk forwards (only first
chunk updates BN), premix (u1/KL) loss on the raw s0 view, and the 4-way
rotation self-supervision head on rotated s0 images.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss
from semireward_tpu.models.wrappers import RotNet
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@ALGORITHMS.register("remixmatch")
class ReMixMatch(Algorithm):
    NAME = "remixmatch"
    DEFAULTS = {"T": 0.5, "kl_loss_ratio": 0.5, "rot_loss_ratio": 0.5,
                "unsup_warm_up": 1 / 64, "mixup_alpha": 0.75,
                "mixup_manifold": False}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s_0", "x_ulb_s_1",
                  "x_ulb_s_0_rot", "rot_v")

    @property
    def use_rot(self) -> bool:
        return self.cfg.rot_loss_ratio > 0

    def wrap_model(self, model):
        return RotNet(backbone=model) if self.use_rot else model

    def init_state(self):
        dist = self.data_info.get("lb_class_dist")
        p_target = (jnp.asarray(dist, jnp.float32) if dist is not None
                    else jnp.ones((self.cfg.num_classes,), jnp.float32)
                    / self.cfg.num_classes)
        state, _ = C.dist_align_ema_init(self.cfg.num_classes, p_target=p_target)
        return state

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        b = ctx.batch
        num_lb = b["y_lb"].shape[0]
        variables = {"params": ctx.params}
        has_bn = bool(ctx.batch_stats)
        if has_bn:
            variables["batch_stats"] = ctx.batch_stats
        keys = jax.random.split(ctx.rng, 12)

        def fwd(x, key, update_bn, **kw):
            if has_bn:
                out, st = ctx.apply_fn(variables, x, train=True,
                                       rngs={"dropout": key},
                                       mutable=["batch_stats"], **kw)
                return out, (st["batch_stats"] if update_bn else None)
            return ctx.apply_fn(variables, x, train=True,
                                rngs={"dropout": key}, **kw), None

        sg = lambda t: jax.tree_util.tree_map(jax.lax.stop_gradient, t)

        # no-grad weak forward, BN frozen (remixmatch.py:120-131)
        outs_w, _ = fwd(b["x_ulb_w"], keys[0], False)
        outs_w = sg(outs_w)
        da_state, prob = C.dist_align_ema(
            ctx.algo_state, self.compute_prob(outs_w["logits"]), momentum=0.999)
        sharpen = prob ** (1 / cfg.T)
        sharpen = jax.lax.stop_gradient(
            sharpen / sharpen.sum(axis=-1, keepdims=True))

        # grad forwards, BN frozen (remixmatch.py:137-141)
        outs_lb, _ = fwd(b["x_lb"], keys[1], False)
        outs_s0, _ = fwd(b["x_ulb_s_0"], keys[2], False)
        outs_s1, _ = fwd(b["x_ulb_s_1"], keys[3], False)

        input_labels = jnp.concatenate(
            [jax.nn.one_hot(b["y_lb"], cfg.num_classes), sharpen, sharpen,
             sharpen], 0)
        if cfg.mixup_manifold:
            inputs = jnp.concatenate([outs_lb["feat"], outs_s0["feat"],
                                      outs_s1["feat"], outs_w["feat"]], 0)
        else:
            inputs = jnp.concatenate([b["x_lb"], b["x_ulb_s_0"],
                                      b["x_ulb_s_1"], b["x_ulb_w"]], 0)
        mixed_x, mixed_y, _ = C.mixup_one_target(keys[4], inputs, input_labels,
                                                 cfg.mixup_alpha, is_bias=True)
        n_chunks = inputs.shape[0] // num_lb
        logits_list, new_bs = [], None
        for i in range(n_chunks):
            chunk = mixed_x[i * num_lb:(i + 1) * num_lb]
            if cfg.mixup_manifold:
                logits_list.append(ctx.apply_fn(variables, chunk, only_fc=True))
            else:
                out, st = fwd(chunk, keys[5 + min(i, 5)], update_bn=(i == 0))
                if i == 0:
                    new_bs = st
                logits_list.append(out["logits"])

        logits_x = logits_list[0]
        logits_u = jnp.concatenate(logits_list[1:], axis=0)
        sup_loss = self.ce_loss(logits_x, mixed_y[:num_lb], reduction="mean")
        unsup_loss = self.consistency_loss(logits_u, mixed_y[num_lb:], "ce")
        u1_loss = self.consistency_loss(outs_s0["logits"], sharpen, "ce")
        warm = self.unsup_warmup_factor(ctx.step)

        extra = cfg.kl_loss_ratio * warm * u1_loss
        rot_loss = jnp.asarray(0.0)
        if self.use_rot and "x_ulb_s_0_rot" in b:
            out_rot, _ = fwd(b["x_ulb_s_0_rot"], keys[11], False, use_rot=True)
            rot_loss = self.ce_loss(out_rot["logits_rot"], b["rot_v"],
                               reduction="mean")
            extra = extra + cfg.rot_loss_ratio * rot_loss

        model_state = {"batch_stats": new_bs} if new_bs is not None else {}
        fwd_out = C.ForwardOut(outs_lb["logits"], outs_w["logits"],
                               outs_s0["logits"], outs_lb["feat"],
                               outs_w["feat"], outs_s0["feat"], model_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd_out,
                         new_algo_state=da_state, warmup=warm, extra_loss=extra,
                         metrics={"u1_loss": u1_loss, "rot_loss": rot_loss})
