"""DASO (https://arxiv.org/abs/2106.05682).

TPU rebuild of reference semilearn/imb_algorithms/daso/{daso.py,utils.py}:
class prototypes from an EMA-model labeled-feature queue; pseudo-labels are
blended with prototype-similarity probs, weighted by the (temperature-
scaled) running pseudo-label distribution; plus a semantic alignment loss
between strong-view/prototype similarities and the weak-view assignment.

The per-class python-list banks become fixed [C, L, D] ring buffers with
per-class pointers/counts, updated by scatter inside the jitted step; the
`probs_sim` used in PL mixing is the previous step's (exactly the reference's
stale-by-one attribute, daso.py:96-99 vs utils.py:118).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import ce_loss as _ce, gen_ulb_targets as _gen
from semireward_tpu.imb.base import ImbAlgorithm


@struct.dataclass
class DASOState:
    bank: jnp.ndarray        # [C, L, D]
    bank_ptr: jnp.ndarray    # [C] int32
    bank_cnt: jnp.ndarray    # [C] int32 (saturates at L)
    prototypes: jnp.ndarray  # [C, D]
    pl_counts_acc: jnp.ndarray  # [C] counts since last dist update
    pl_dist: jnp.ndarray        # [C] last snapshot
    probs_sim: jnp.ndarray      # [uB, C] previous step's prototype probs


@IMB_ALGORITHMS.register("daso")
class DASO(ImbAlgorithm):
    NAME = "daso"
    DEFAULTS = {"daso_queue_len": 256, "daso_T_proto": 0.05,
                "daso_T_dist": 1.5, "daso_interp_alpha": 0.5,
                "daso_with_dist_aware": True, "daso_assign_loss_ratio": 1.0,
                "daso_num_pl_dist_iter": 100, "daso_num_pretrain_iter": 5120}

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info, base_cls)
        x = cfg.extra
        self.T_proto = float(x.get("daso_T_proto", 0.05))
        self.T_dist = float(x.get("daso_T_dist", 1.5))
        self.queue_len = int(x.get("daso_queue_len", 256))
        self.interp_alpha = float(x.get("daso_interp_alpha", 0.5))
        self.with_dist_aware = bool(x.get("daso_with_dist_aware", True))
        self.lambda_f = float(x.get("daso_assign_loss_ratio", 1.0))
        self.num_pl_dist_iter = int(x.get("daso_num_pl_dist_iter", 100))
        self.num_pretrain_iter = int(x.get("daso_num_pretrain_iter", 5120))

    def init_imb_state(self):
        cfg = self.cfg
        D = int(self.data_info.get("num_features", cfg.feature_dim))
        C_ = cfg.num_classes
        uB = cfg.ulb_batch_size
        return DASOState(
            bank=jnp.zeros((C_, self.queue_len, D), jnp.float32),
            bank_ptr=jnp.zeros((C_,), jnp.int32),
            bank_cnt=jnp.zeros((C_,), jnp.int32),
            prototypes=jnp.zeros((C_, D), jnp.float32),
            pl_counts_acc=jnp.zeros((C_,), jnp.float32),
            pl_dist=jnp.zeros((C_,), jnp.float32),
            probs_sim=jnp.ones((uB, C_), jnp.float32) / C_,
        )

    def override_names(self):
        return ("gen_ulb_targets",)

    # ---- prototype similarity helpers --------------------------------------
    def _sim_probs(self, feats, prototypes):
        f = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
        p = prototypes / jnp.maximum(
            jnp.linalg.norm(prototypes, axis=-1, keepdims=True), 1e-8)
        sim = (f @ p.T) / self.T_proto
        return sim, jax.nn.softmax(sim, axis=1)

    # ---- pseudo-labeling override (daso/utils.py:86-131) --------------------
    def imb_gen_ulb_targets(self, logits, use_hard_label=True, T=1.0,
                            softmax=True, label_smoothing=0.0):
        st: DASOState = self._imb_state
        step = self._trace_cell["step"]
        logits = jax.lax.stop_gradient(logits.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=1) if softmax else logits
        base_pl = jnp.argmax(probs, axis=-1)

        pl_dist = st.pl_dist / jnp.maximum(st.pl_dist.sum(), 1e-12)
        pl_dist = pl_dist ** (1.0 / self.T_dist)
        pl_dist = pl_dist / jnp.maximum(pl_dist.sum(), 1e-12)
        pl_dist = pl_dist / jnp.maximum(pl_dist.max(), 1e-12)
        pred_to_dist = (pl_dist[base_pl][:, None] if self.with_dist_aware
                        else jnp.asarray(self.interp_alpha))
        probs_mixup = (1.0 - pred_to_dist) * probs + pred_to_dist * st.probs_sim
        mixed_pl = jnp.argmax(probs_mixup, axis=-1)

        pretrain = step < self.num_pretrain_iter
        pl_for_count = jnp.where(pretrain, base_pl, mixed_pl)
        self._trace_cell["pl_for_count"] = pl_for_count

        if use_hard_label:
            return jnp.where(pretrain, base_pl, mixed_pl)
        soft_base = _gen(logits, use_hard_label, T, softmax, label_smoothing)
        return jnp.where(pretrain, soft_base, probs_mixup)

    # ---- composition --------------------------------------------------------
    def loss(self, ctx):
        base_state, imb_state = ctx.algo_state
        st: DASOState = imb_state
        cfg = self.cfg

        # enqueue EMA-model labeled feats BEFORE the step (daso.py:72-79)
        teacher = ctx.ema_params if ctx.ema_params is not None else ctx.params
        tvars = {"params": teacher}
        if ctx.batch_stats:
            tvars["batch_stats"] = ctx.batch_stats
        feats_lb = jax.lax.stop_gradient(
            ctx.apply_fn(tvars, ctx.batch["x_lb"], train=False,
                         only_feat=True)).astype(jnp.float32)
        y_lb = ctx.batch["y_lb"].astype(jnp.int32)
        C_, L = st.bank.shape[0], st.bank.shape[1]
        bank, ptr, cnt, protos = st.bank, st.bank_ptr, st.bank_cnt, st.prototypes
        B = y_lb.shape[0]
        onehot = jax.nn.one_hot(y_lb, C_, dtype=jnp.int32)     # [B, C]
        order = jnp.cumsum(onehot, axis=0) - onehot            # rank within class
        pos = (ptr[None, :] + order) % L                       # [B, C]
        sel_pos = jnp.take_along_axis(pos, y_lb[:, None], axis=1)[:, 0]
        bank = bank.at[y_lb, sel_pos].set(feats_lb)
        added = onehot.sum(axis=0)
        ptr = (ptr + added) % L
        cnt = jnp.minimum(cnt + added, L)
        valid = (jnp.arange(L)[None, :] < cnt[:, None]).astype(jnp.float32)
        protos = (bank * valid[..., None]).sum(1) / jnp.maximum(
            cnt[:, None].astype(jnp.float32), 1.0)

        st = st.replace(bank=bank, bank_ptr=ptr, bank_cnt=cnt,
                        prototypes=protos)
        self._imb_state = st
        self._trace_cell = {"step": ctx.step}
        with self.installed(st, ctx):
            out = self.base.loss(ctx._replace(algo_state=base_state))

        # pl distribution accumulation (utils.py:63-75 + after_train_step)
        pl = self._trace_cell.get("pl_for_count")
        pl_acc = st.pl_counts_acc
        if pl is not None:
            pl_acc = pl_acc + jnp.bincount(pl, length=C_).astype(jnp.float32)
        do_snap = (ctx.step + 1) % self.num_pl_dist_iter == 0
        pl_dist = jnp.where(do_snap, pl_acc, st.pl_dist)
        pl_acc = jnp.where(do_snap, jnp.zeros_like(pl_acc), pl_acc)

        # assign loss + probs_sim refresh (daso.py:85-110)
        feats_w = jax.lax.stop_gradient(out.fwd.feats_x_ulb_w).astype(jnp.float32)
        feats_s = out.fwd.feats_x_ulb_s.astype(jnp.float32)
        _, prob_sim_w = self._sim_probs(feats_w, protos)
        sim_s, _ = self._sim_probs(feats_s, protos)
        assign_loss = _ce(sim_s, jax.lax.stop_gradient(prob_sim_w),
                          reduction="mean")
        active = (ctx.step + 1) >= self.num_pretrain_iter
        term = jnp.where(active, self.lambda_f * assign_loss, 0.0)
        out = self._add_loss(out, term, "assign_loss", assign_loss)

        new_imb = st.replace(pl_counts_acc=pl_acc, pl_dist=pl_dist,
                             probs_sim=jax.lax.stop_gradient(prob_sim_w))
        return out._replace(new_algo_state=(out.new_algo_state, new_imb))
