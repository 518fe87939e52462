"""Algorithm protocol: SSL algorithms as pure loss functions.

The reference models an algorithm as a class with a mutable hook pipeline
(core/algorithmbase.py:49-599). Here an algorithm is a *pure function* from
(params, batch, algo_state, rng, step) to (total_loss, aux): the jitted train
step differentiates it, applies the optimizer, and threads the returned
algorithm state. Host-side concerns (eval cadence, checkpointing, logging)
live in core/trainer.py.

Every algorithm subclasses :class:`Algorithm`, carries only static python
config, and is registered under its reference name in ``ALGORITHMS``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from semireward_tpu.core.losses import ce_loss, consistency_loss, gen_ulb_targets
from semireward_tpu.algorithms import common as C


class StepCtx(NamedTuple):
    apply_fn: Callable
    params: Any
    batch_stats: Any
    batch: Dict[str, jnp.ndarray]
    algo_state: Any
    rng: jax.Array
    step: jnp.ndarray  # int32 scalar, == reference `self.it`
    ema_params: Any = None  # EMA shadow (teacher) — used by meanteacher
    sr_state: Any = None    # SemiReward state (SR variants only)


class LossOut(NamedTuple):
    total_loss: jnp.ndarray
    sup_loss: jnp.ndarray
    unsup_loss: jnp.ndarray
    extra_loss: jnp.ndarray          # e.g. FreeMatch entropy term
    unsup_weight: jnp.ndarray        # effective lambda_u * warmup multiplier
    mask: Optional[jnp.ndarray]      # confidence mask over ulb batch
    pseudo_label: Optional[jnp.ndarray]
    fwd: Optional[C.ForwardOut]
    new_algo_state: Any
    new_batch_stats: Any
    metrics: Dict[str, jnp.ndarray]


class Algorithm:
    """Base. Subclasses override ``init_state`` and ``loss``."""

    NAME = "base"
    DEFAULTS: Dict[str, Any] = {}
    # batch keys this algorithm consumes (reference: process_batch filters by
    # train_step signature, algorithmbase.py:282-306)
    BATCH_KEYS: Tuple[str, ...] = ("x_lb", "y_lb", "idx_ulb", "x_ulb_w", "x_ulb_s")
    # x_ulb_s is a SECOND WEAK view for pimodel/meanteacher/mixmatch
    # (reference datasetbase.py:99-101)
    WEAK_ULB_S: bool = False

    def __init__(self, cfg, data_info: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        self.data_info = data_info or {}

    # ---- overridable criterions (the reference's self.ce_loss /
    # self.consistency_loss, which imbalanced algorithms replace —
    # e.g. SAW saw/utils.py:60-90, ABC, DebiasPL) ----------------------------
    def ce_loss(self, logits, targets, reduction="none"):
        return ce_loss(logits, targets, reduction)

    def consistency_loss(self, logits, targets, name="ce", mask=None,
                         mask2=None):
        return consistency_loss(logits, targets, name, mask, mask2)

    def compute_prob(self, logits):
        """softmax by default; DebiasPL overrides with logit debiasing
        (reference algorithmbase compute_prob / debiaspl.py:49-54)."""
        return C.compute_prob(logits)

    def gen_ulb_targets(self, logits, use_hard_label=True, T=1.0,
                        softmax=True, label_smoothing=0.0):
        """PseudoLabelingHook equivalent; DASO swaps in dist-aware PL mixing
        (reference daso/utils.py:86-131)."""
        return gen_ulb_targets(logits, use_hard_label, T, softmax,
                               label_smoothing)

    def fixed_mask(self, probs):
        """FixedThresholdingHook equivalent; ADSH swaps in its adaptive
        per-class threshold (reference adsh/utils.py:12-21)."""
        return C.fixed_threshold_mask(probs, self.cfg.p_cutoff)

    def maybe_dist_align(self, probs_x_ulb, probs_x_lb=None):
        """The conditional "DistAlignHook" call the fixmatch-family steps
        make (reference fixmatch.py:139-141) — identity unless an imbalanced
        wrapper (CReST) installs one."""
        return probs_x_ulb

    # ---- model ------------------------------------------------------------
    def wrap_model(self, model):
        """Hook for algorithms that add heads (reference set_model overrides,
        e.g. remixmatch.py:102-106). Default: identity."""
        return model

    # ---- state -----------------------------------------------------------
    def init_state(self):
        return ()

    # ---- loss ------------------------------------------------------------
    def loss(self, ctx: StepCtx) -> LossOut:
        raise NotImplementedError

    # ---- shared plumbing ---------------------------------------------------
    def forward(self, ctx: StepCtx, stop_grad_w: bool = True) -> C.ForwardOut:
        b = ctx.batch
        use_cat = self.cfg.use_cat
        if (use_cat and stop_grad_w and not ctx.batch_stats
                and self.cfg.extra.get("auto_split_forward", False)):
            # loss-equivalent split (opt-in, extra['auto_split_forward']):
            # under use_cat the weak view's cotangents are zero (its
            # logits/feats are stop-graded) yet the concat BACKWARD still
            # processes all rows — the reference pays the same waste
            # (fixmatch.py:52-71 + loss.backward()). For stat-free nets
            # (no BN moments to keep concat semantics for) the separate-
            # forwards path runs the weak view forward-ONLY, saving its
            # entire backward (~(u/(1+2u))*2/3 of backbone FLOPs).
            # Deviation: dropout draws follow the split RNG stream
            # (ssl_forward fold_in), same marginals — see DEVIATIONS.md.
            use_cat = False
        return C.ssl_forward(
            ctx.apply_fn, ctx.params, ctx.batch_stats,
            b["x_lb"], b["x_ulb_w"], b["x_ulb_s"], ctx.rng,
            train=True, use_cat=use_cat, stop_grad_w=stop_grad_w,
        )

    def unsup_warmup_factor(self, step, warm=None):
        """np.clip(it / (unsup_warm_up * num_train_iter), 0, 1)
        (reference pseudolabel.py:87, pimodel.py, meanteacher.py)."""
        warm = self.cfg.unsup_warm_up if warm is None else warm
        denom = max(warm * self.cfg.num_train_iter, 1e-9)
        return jnp.clip(step.astype(jnp.float32) / denom, 0.0, 1.0)

    def pack(self, *, sup_loss, unsup_loss, fwd, new_algo_state,
             extra_loss=None, mask=None, pseudo_label=None,
             lambda_u=None, warmup=None, metrics=None) -> LossOut:
        lam = self.cfg.ulb_loss_ratio if lambda_u is None else lambda_u
        w = 1.0 if warmup is None else warmup
        extra = jnp.asarray(0.0) if extra_loss is None else extra_loss
        total = sup_loss + lam * unsup_loss * w + extra
        m = {
            "sup_loss": sup_loss,
            "unsup_loss": unsup_loss,
            "total_loss": total,
        }
        if mask is not None:
            m["util_ratio"] = mask.astype(jnp.float32).mean()
        if metrics:
            m.update(metrics)
        return LossOut(
            total_loss=total, sup_loss=sup_loss, unsup_loss=unsup_loss,
            extra_loss=extra, unsup_weight=jnp.asarray(lam * 1.0) * w,
            mask=mask, pseudo_label=pseudo_label, fwd=fwd,
            new_algo_state=new_algo_state,
            new_batch_stats=(fwd.model_state.get("batch_stats") if fwd and fwd.model_state else None),
            metrics=m,
        )
