"""Pi-Model and Mean Teacher.

TPU rebuild of reference semilearn/algorithms/pimodel/pimodel.py:12-74 and
meanteacher/meanteacher.py:12-82: MSE consistency between the strong(second
weak) view and (Pi) the model's own weak-view probs / (MT) the EMA teacher's
weak-view probs; both ramped by ``unsup_warm_up`` and run with BN frozen on
the unlabeled forwards (Bn_Controller semantics — batch-normalized but
running stats discarded).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


class _UnlabeledConsistency(Algorithm):
    DEFAULTS = {"unsup_warm_up": 0.4}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")
    WEAK_ULB_S = True
    TEACHER_EMA = False

    def loss(self, ctx: StepCtx) -> LossOut:
        b = ctx.batch
        variables = {"params": ctx.params}
        if ctx.batch_stats:
            variables["batch_stats"] = ctx.batch_stats
        mutable = ["batch_stats"] if ctx.batch_stats else False
        k_lb, k_w, k_s = jax.random.split(ctx.rng, 3)

        out = ctx.apply_fn(variables, b["x_lb"], train=True, mutable=mutable,
                           rngs={"dropout": k_lb})
        outs_lb, new_state = (out if mutable else (out, {}))

        def frozen(x, key, params=None):
            v = dict(variables)
            if params is not None:
                v["params"] = params
            o = ctx.apply_fn(v, x, train=True, mutable=mutable,
                             rngs={"dropout": key})
            return o[0] if mutable else o

        if self.TEACHER_EMA:
            teacher = ctx.ema_params if ctx.ema_params is not None else ctx.params
            outs_w = jax.tree_util.tree_map(
                jax.lax.stop_gradient, frozen(b["x_ulb_w"], k_w, teacher))
        else:
            outs_w = frozen(b["x_ulb_w"], k_w)
        outs_s = frozen(b["x_ulb_s"], k_s)

        sup_loss = self.ce_loss(outs_lb["logits"], b["y_lb"], reduction="mean")
        probs_w = self.compute_prob(jax.lax.stop_gradient(outs_w["logits"]))
        unsup_loss = self.consistency_loss(outs_s["logits"], probs_w, "mse")
        warm = self.unsup_warmup_factor(ctx.step)
        fwd = C.ForwardOut(outs_lb["logits"], outs_w["logits"], outs_s["logits"],
                           outs_lb["feat"], outs_w["feat"], outs_s["feat"],
                           new_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=ctx.algo_state, warmup=warm)


@ALGORITHMS.register("pimodel")
class PiModel(_UnlabeledConsistency):
    NAME = "pimodel"
    TEACHER_EMA = False


@ALGORITHMS.register("meanteacher")
class MeanTeacher(_UnlabeledConsistency):
    NAME = "meanteacher"
    TEACHER_EMA = True
