"""DARP (https://arxiv.org/abs/2007.08844) — Distribution-Aligned Refinement
of Pseudo-labels.

TPU rebuild of reference semilearn/imb_algorithms/darp/{darp.py,utils.py}.
The reference keeps a [ulb_len, C] prob matrix on host and every
``num_refine_iter`` steps solves an entropy-regularized transport problem
with scipy secant Newton (utils.py:75-104). Here the whole thing lives on
device inside the jitted step: scatter-update of pseudo_orig, and the solver
as vectorized Newton-with-derivative over all classes simultaneously
(lax.fori_loop over iter_T x num_newton) — same fixed point the reference's
per-class secant iteration approximates at tol=0.1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import smooth_targets
from semireward_tpu.imb.base import ImbAlgorithm


@struct.dataclass
class DARPState:
    pseudo_orig: jnp.ndarray    # [N, C]
    pseudo_refine: jnp.ndarray  # [N, C]


def estimate_pseudo(q_y, saved_q, alpha: float, num_classes: int):
    """reference darp/utils.py:57-68: per class (descending), mark the top
    alpha*q_y[i] entries and sum their probs."""
    N = saved_q.shape[0]
    k_probs = jnp.zeros((num_classes,), jnp.float32)
    for i in range(num_classes):
        num_i = jnp.asarray(alpha * q_y[i], jnp.int32)
        sorted_probs = jnp.sort(saved_q[:, i])[::-1]
        take = jnp.arange(N) < num_i
        k_probs = k_probs.at[i].set(jnp.sum(sorted_probs * take))
    return (q_y + 1e-6) / (k_probs + 1e-6)


def opt_solver(probs, target_distb, num_iter: int = 10, num_newton: int = 30):
    """reference darp/utils.py:75-104, Newton with analytic derivative."""
    probs = probs.astype(jnp.float32)
    entropy = (-probs * jnp.log(probs + 1e-6)).sum(1)
    w = 1.0 / entropy                       # [N]
    N, K = probs.shape
    A_e = probs / jnp.e
    c = target_distb.astype(jnp.float32)    # [K]
    r = jnp.ones((N,), jnp.float32)

    def outer(_, carry):
        X_t, prev_Y = carry

        def newton(_, y):
            # f_i(y) = sum_n A_e[n,i] * X_t[n] * exp(-y_i / w[n]) - c[i]
            E = jnp.exp(-y[None, :] / w[:, None])        # [N,K]
            B = A_e * X_t[:, None]
            f = (B * E).sum(0) - c
            fp = (B * E * (-1.0 / w)[:, None]).sum(0)
            return y - f / jnp.where(jnp.abs(fp) > 1e-12, fp, 1e-12)

        Y_scalar = jax.lax.fori_loop(0, 30, newton, prev_Y)
        Y_t = jnp.exp(-Y_scalar[None, :] / w[:, None])
        X_t = r / (A_e * Y_t).sum(1)
        return X_t, Y_scalar

    X0 = r / (A_e * jnp.exp(-jnp.zeros((1, K)) / w[:, None])).sum(1)
    X_t, Y_scalar = jax.lax.fori_loop(0, num_iter, outer,
                                      (X0, jnp.zeros((K,), jnp.float32)))
    Y_t = jnp.exp(-Y_scalar[None, :] / w[:, None])
    return A_e * X_t[:, None] * Y_t


@IMB_ALGORITHMS.register("darp")
class DARP(ImbAlgorithm):
    NAME = "darp"
    DEFAULTS = {"darp_warmup_epochs": 200, "darp_alpha": 2.0,
                "darp_iter_T": 10, "darp_num_refine_iter": 10}

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info, base_cls)
        x = cfg.extra
        self.warmup_epochs = int(x.get("darp_warmup_epochs", 200))
        self.alpha = float(x.get("darp_alpha", 2.0))
        self.iter_T = int(x.get("darp_iter_T", 10))
        self.num_refine_iter = int(x.get("darp_num_refine_iter", 10))
        dist = np.asarray(self.data_info.get(
            "lb_class_dist", np.full(cfg.num_classes, 1 / cfg.num_classes)))
        self.target_disb = jnp.asarray(
            dist * self.data_info.get("ulb_dest_len", 1) / dist.sum(),
            jnp.float32)
        self.BATCH_KEYS = tuple(dict.fromkeys(self.BATCH_KEYS + ("idx_ulb",)))

    def init_imb_state(self):
        N = self.data_info.get("ulb_dest_len", 1)
        C_ = self.cfg.num_classes
        u = jnp.ones((N, C_), jnp.float32) / C_
        # distinct buffers: the donated TrainState must not carry two leaves
        # aliasing one array (TPU runtime rejects double-donation)
        return DARPState(pseudo_orig=u, pseudo_refine=jnp.array(u, copy=True))

    # DARP intercepts pseudo-label generation. Our bases call the module-level
    # gen_ulb_targets; intercepting generically would touch every algorithm,
    # so DARP refines in post_loss by RE-weighting the unsup loss with
    # refined targets — equivalent because the bases' consistency target is
    # exactly gen_ulb_targets(probs_w) (fixmatch/flexmatch/... train_steps).
    def loss(self, ctx):
        base_state, imb_state = ctx.algo_state
        self._imb_state = imb_state
        self._trace_cell = {}
        out = self.base.loss(ctx._replace(algo_state=base_state))

        st: DARPState = imb_state
        cfg = self.cfg
        idx = ctx.batch["idx_ulb"].astype(jnp.int32)
        probs_w = self.base.compute_prob(
            jax.lax.stop_gradient(out.fwd.logits_x_ulb_w))

        pseudo_orig = st.pseudo_orig.at[idx].set(probs_w)
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        epoch = ctx.step // num_iter_per_epoch
        past_warmup = epoch > self.warmup_epochs

        def refine(_):
            weights_u = estimate_pseudo(self.target_disb, pseudo_orig,
                                        self.alpha, cfg.num_classes)
            scale = pseudo_orig * weights_u[None, :]  # targets_u*w folded
            scaled = (pseudo_orig * scale + 1e-6)
            scaled = scaled / scaled.sum(1, keepdims=True)
            return opt_solver(scaled, self.target_disb, self.iter_T)

        do_refine = jnp.logical_and(past_warmup,
                                    ctx.step % self.num_refine_iter == 0)
        pseudo_refine = jax.lax.cond(do_refine, refine,
                                     lambda _: st.pseudo_refine, None)
        refined_batch = pseudo_refine[idx]
        refined_batch = refined_batch / jnp.maximum(
            refined_batch.sum(1, keepdims=True), 1e-12)

        # recompute the unsup loss with refined targets past warmup
        pl = out.pseudo_label
        if pl is not None and out.mask is not None:
            if pl.ndim == 1:
                new_pl = jnp.argmax(refined_batch, axis=-1)
            else:
                new_pl = refined_batch
            use = past_warmup
            target = jax.lax.cond(
                use, lambda _: new_pl, lambda _: pl, None) if pl.ndim > 1 else \
                jnp.where(use, new_pl, pl)
            new_unsup = self.base.consistency_loss(
                out.fwd.logits_x_ulb_s, target, "ce", mask=out.mask)
            total = out.total_loss + out.unsup_weight * (new_unsup - out.unsup_loss)
            metrics = dict(out.metrics)
            metrics.update(total_loss=total, unsup_loss=new_unsup)
            out = out._replace(total_loss=total, unsup_loss=new_unsup,
                               metrics=metrics)

        new_imb = DARPState(pseudo_orig=pseudo_orig,
                            pseudo_refine=pseudo_refine)
        return out._replace(new_algo_state=(out.new_algo_state, new_imb))
