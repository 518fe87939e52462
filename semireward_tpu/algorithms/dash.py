"""Dash (https://arxiv.org/abs/2109.00650).

TPU rebuild of reference semilearn/algorithms/dash/{dash.py,utils.py}:
loss-based dynamic threshold rho with geometric decay every 10 epochs, plus
a supervised warm-up pre-stage that sets rho_init from the eval CE loss
(dash.py:60-155 ``warmup()``). The warm-up runs host-side via
``Trainer``'s warmup hook; inside the jitted step the rho schedule and the
dynamic hard/soft pseudo-label switch are pure state arithmetic.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss, consistency_loss
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


@struct.dataclass
class DashState:
    rho_init: jnp.ndarray       # set by warmup (eval CE loss)
    rho: jnp.ndarray
    rho_update_cnt: jnp.ndarray  # int32
    use_hard_label: jnp.ndarray  # bool


@ALGORITHMS.register("dash")
class Dash(Algorithm):
    NAME = "dash"
    DEFAULTS = {"T": 0.5, "gamma": 1.27, "C": 1.0001, "rho_min": 0.05,
                "num_wu_iter": 2048, "num_wu_eval_iter": 100}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")
    NEEDS_WARMUP = True

    def init_state(self):
        rho0 = float(self.cfg.extra.get("rho_init", 1.0))
        return DashState(
            rho_init=jnp.asarray(rho0, jnp.float32),
            rho=jnp.asarray(rho0, jnp.float32),
            rho_update_cnt=jnp.asarray(0, jnp.int32),
            use_hard_label=jnp.asarray(False),
        )

    def set_rho_init(self, algo_state: DashState, rho_init: float) -> DashState:
        """Called by the trainer after the supervised warm-up stage
        (reference dash.py:150-154: rho_init = eval CE loss)."""
        v = jnp.asarray(rho_init, jnp.float32)
        # distinct buffer for rho: the state is donated every step and two
        # leaves aliasing one array is a double-donation (TPU runtime error)
        return algo_state.replace(rho_init=v, rho=jnp.array(v, copy=True),
                                  rho_update_cnt=jnp.asarray(0, jnp.int32))

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        st: DashState = ctx.algo_state
        fwd = self.forward(ctx)
        sup_loss = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], reduction="mean")

        # rho schedule: every 10 epochs (dash/utils.py:27-37)
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        do_update = (ctx.step % (10 * num_iter_per_epoch)) == 0
        new_rho = jnp.maximum(
            cfg.C * (cfg.gamma ** (-st.rho_update_cnt.astype(jnp.float32)))
            * st.rho_init, cfg.rho_min)
        rho = jnp.where(do_update, new_rho, st.rho)
        cnt = jnp.where(do_update, st.rho_update_cnt + 1, st.rho_update_cnt)
        use_hard = rho == cfg.rho_min

        logits_w = fwd.logits_x_ulb_w.astype(jnp.float32)
        hard_pl = jnp.argmax(logits_w, axis=-1)
        soft_pl = jax.nn.softmax(logits_w / cfg.T, axis=-1)

        # masking loss: ce(logits_w, pseudo) <= rho (dash/utils.py:42-50)
        loss_w_hard = self.ce_loss(logits_w, hard_pl, reduction="none")
        loss_w_soft = self.ce_loss(logits_w, soft_pl, reduction="none")
        loss_w = jnp.where(use_hard, loss_w_hard, loss_w_soft)
        mask = (loss_w <= rho).astype(jnp.float32)

        unsup_hard = self.consistency_loss(fwd.logits_x_ulb_s, hard_pl, "ce", mask=mask)
        unsup_soft = self.consistency_loss(fwd.logits_x_ulb_s, soft_pl, "ce", mask=mask)
        unsup_loss = jnp.where(use_hard, unsup_hard, unsup_soft)

        new_state = DashState(rho_init=st.rho_init, rho=rho,
                              rho_update_cnt=cnt, use_hard_label=use_hard)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd,
                         new_algo_state=new_state, mask=mask,
                         pseudo_label=hard_pl,
                         metrics={"rho": rho})
