"""MixMatch (https://arxiv.org/abs/1905.02249).

TPU rebuild of reference semilearn/algorithms/mixmatch/mixmatch.py:35-140:
two weak-view forwards (no grad, BN frozen) -> averaged + sharpened target,
mixup over the concat batch (is_bias=True), per-chunk forwards where ONLY
the first mixed chunk updates BN running stats (all other forwards run under
Bn_Controller freeze = batch-normalized but stats discarded), CE on mixed
labeled + MSE on mixed unlabeled, ramped lambda_u. ``mixup_manifold`` mixes
features and classifies with only_fc (the NLP path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@ALGORITHMS.register("mixmatch")
class MixMatch(Algorithm):
    NAME = "mixmatch"
    DEFAULTS = {"T": 0.5, "unsup_warm_up": 1 / 64, "mixup_alpha": 0.5,
                "mixup_manifold": False}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")
    WEAK_ULB_S = True

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        b = ctx.batch
        num_lb = b["y_lb"].shape[0]
        variables = {"params": ctx.params}
        has_bn = bool(ctx.batch_stats)
        if has_bn:
            variables["batch_stats"] = ctx.batch_stats
        keys = jax.random.split(ctx.rng, 8)

        def fwd(x, key, update_bn):
            """update_bn=False == Bn_Controller freeze: batch statistics are
            used for normalization but the running-stat update is discarded."""
            if has_bn:
                out, st = ctx.apply_fn(variables, x, train=True,
                                       rngs={"dropout": key},
                                       mutable=["batch_stats"])
                return out, (st["batch_stats"] if update_bn else None)
            out = ctx.apply_fn(variables, x, train=True, rngs={"dropout": key})
            return out, None

        sg = lambda tree: jax.tree_util.tree_map(jax.lax.stop_gradient, tree)

        outs_w1, _ = fwd(b["x_ulb_w"], keys[0], False)
        outs_w2, _ = fwd(b["x_ulb_s"], keys[1], False)
        outs_w1, outs_w2 = sg(outs_w1), sg(outs_w2)

        avg_prob = (self.compute_prob(outs_w1["logits"])
                    + self.compute_prob(outs_w2["logits"])) / 2
        sharpen = avg_prob ** (1 / cfg.T)
        sharpen = jax.lax.stop_gradient(
            sharpen / sharpen.sum(axis=-1, keepdims=True))

        outs_x_lb, _ = fwd(b["x_lb"], keys[2], False)

        input_labels = jnp.concatenate([
            jax.nn.one_hot(b["y_lb"], cfg.num_classes), sharpen, sharpen], 0)
        if cfg.mixup_manifold:
            inputs = jnp.concatenate([outs_x_lb["feat"], outs_w1["feat"],
                                      outs_w2["feat"]], 0)
        else:
            inputs = jnp.concatenate([b["x_lb"], b["x_ulb_w"], b["x_ulb_s"]], 0)
        mixed_x, mixed_y, _ = C.mixup_one_target(keys[3], inputs, input_labels,
                                                 cfg.mixup_alpha, is_bias=True)
        n_chunks = inputs.shape[0] // num_lb
        chunks = [mixed_x[i * num_lb:(i + 1) * num_lb] for i in range(n_chunks)]

        logits_list = []
        new_bs = None
        for i, chunk in enumerate(chunks):
            if cfg.mixup_manifold:
                logits_list.append(ctx.apply_fn(variables, chunk, only_fc=True))
            else:
                out, st = fwd(chunk, keys[4 + min(i, 3)], update_bn=(i == 0))
                if i == 0:
                    new_bs = st
                logits_list.append(out["logits"])

        logits_x = logits_list[0]
        logits_u = jnp.concatenate(logits_list[1:], axis=0)
        sup_loss = self.ce_loss(logits_x, mixed_y[:num_lb], reduction="mean")
        unsup_loss = self.consistency_loss(logits_u, mixed_y[num_lb:], "mse")
        warm = self.unsup_warmup_factor(ctx.step)
        model_state = {"batch_stats": new_bs} if new_bs is not None else {}
        fwd_out = C.ForwardOut(outs_x_lb["logits"], outs_w1["logits"],
                               outs_w2["logits"], outs_x_lb["feat"],
                               outs_w1["feat"], outs_w2["feat"], model_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd_out,
                         new_algo_state=ctx.algo_state, warmup=warm)
