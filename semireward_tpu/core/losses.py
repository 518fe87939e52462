"""Pure-function losses.

TPU-native rebuild of the reference criterions
(semilearn/core/criterions/{cross_entropy,consistency,regression}.py). All
functions are jit-safe, shape-static, and operate in float32 accumulation
regardless of input compute dtype (bfloat16 activations upcast before the
log-softmax / reductions so masking thresholds stay exact).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ce_loss(logits: jnp.ndarray, targets: jnp.ndarray, reduction: str = "none"):
    """Cross-entropy with hard (int, shape [B]) or soft (shape [B, C])
    targets. Mirrors reference cross_entropy.py:11-31 (shape-match dispatch)."""
    logits = logits.astype(jnp.float32)
    log_pred = jax.nn.log_softmax(logits, axis=-1)
    if logits.shape == targets.shape:
        nll = -jnp.sum(targets.astype(jnp.float32) * log_pred, axis=-1)
    else:
        nll = -jnp.take_along_axis(
            log_pred, targets.astype(jnp.int32)[..., None], axis=-1
        )[..., 0]
    if reduction == "mean":
        return nll.mean()
    if reduction == "sum":
        return nll.sum()
    return nll


def consistency_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    name: str = "ce",
    mask: Optional[jnp.ndarray] = None,
    mask2: Optional[jnp.ndarray] = None,
):
    """Consistency regularization loss (reference consistency.py:13-45).

    ``mask`` is the confidence mask; ``mask2`` is the extra SemiReward
    reward-filter mask (the hook point the whole framework exists for). The
    final reduction is a mean over the batch *including* masked-out entries,
    exactly as the reference.
    """
    assert name in ("ce", "mse", "l1")
    if name == "mse":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        loss = jnp.mean(
            (probs - targets.astype(jnp.float32)) ** 2, axis=-1
        )
    elif name == "l1":
        loss = jnp.mean(
            jnp.abs(logits.astype(jnp.float32) - targets.astype(jnp.float32)),
            axis=-1,
        )
    else:
        loss = ce_loss(logits, targets, reduction="none")
    if mask is not None:
        loss = loss * mask.astype(loss.dtype)
    if mask2 is not None:
        loss = loss * mask2.astype(loss.dtype)
    return loss.mean()


# ---------------------------------------------------------------------------
# Regression losses (reference criterions/regression.py:11-85)
# ---------------------------------------------------------------------------

def _reduce(loss, reduction):
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def l1_loss(logits, target, reduction="mean", **kw):
    return _reduce(jnp.abs(logits - target), reduction)


def l2_loss(logits, target, reduction="mean", **kw):
    return _reduce((logits - target) ** 2, reduction)


def _focal_weight(logits, target, activate, beta, gamma):
    d = jnp.abs(logits - target)
    if activate == "tanh":
        return jnp.tanh(beta * d) ** gamma
    return (2.0 * jax.nn.sigmoid(beta * d) - 1.0) ** gamma


def focal_l1_loss(logits, target, reduction="mean", activate="sigmoid",
                  beta=0.2, gamma=1.0, **kw):
    loss = jnp.abs(logits - target) * _focal_weight(logits, target, activate, beta, gamma)
    return _reduce(loss, reduction)


def focal_l2_loss(logits, target, reduction="mean", activate="sigmoid",
                  beta=0.2, gamma=1.0, **kw):
    loss = (logits - target) ** 2 * _focal_weight(logits, target, activate, beta, gamma)
    return _reduce(loss, reduction)


def huber_loss(logits, target, reduction="mean", beta=1.0, **kw):
    l1 = jnp.abs(logits - target)
    loss = jnp.where(l1 < beta, 0.5 * l1**2 / beta, l1 - 0.5 * beta)
    return _reduce(loss, reduction)


_REG_LOSSES = {
    "l1_loss": l1_loss,
    "l2_loss": l2_loss,
    "focal_l1_loss": focal_l1_loss,
    "focal_l2_loss": focal_l2_loss,
    "huber_loss": huber_loss,
    # short aliases used by configs
    "l1": l1_loss,
    "l2": l2_loss,
    "mse": l2_loss,
    "huber": huber_loss,
}


def reg_loss(logits, targets, mode: str = "l1_loss", reduction: str = "mean", **kw):
    """Regression loss dispatcher (reference RegLoss, regression.py:70-90)."""
    fn = _REG_LOSSES[mode]
    # f32 accumulation regardless of compute dtype (module contract; a
    # bf16 model would otherwise quantize the regression labels to ~3
    # significant digits)
    logits = logits.astype(jnp.float32)
    targets = jnp.reshape(targets, logits.shape).astype(jnp.float32)
    return fn(logits, targets, reduction=reduction, **kw)


# ---------------------------------------------------------------------------
# Shared target helpers (reference algorithms/utils/ops.py:66-74,
# algorithms/hooks/pseudo_label.py:16-52)
# ---------------------------------------------------------------------------

def smooth_targets(logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float = 0.1):
    n_cls = logits.shape[-1]
    off = smoothing / (n_cls - 1)
    return jax.nn.one_hot(targets, n_cls, dtype=jnp.float32) * (1.0 - smoothing - off) + off


def gen_ulb_targets(
    logits: jnp.ndarray,
    use_hard_label: bool = True,
    T: float = 1.0,
    softmax: bool = True,
    label_smoothing: float = 0.0,
):
    """Pseudo-label generation. `logits` may already be probs (softmax=False).
    Returns int labels (hard) or prob vectors (soft / smoothed)."""
    logits = jax.lax.stop_gradient(logits.astype(jnp.float32))
    if use_hard_label:
        pseudo = jnp.argmax(logits, axis=-1)
        if label_smoothing > 0:
            return smooth_targets(logits, pseudo, label_smoothing)
        return pseudo
    if softmax:
        return jax.nn.softmax(logits / T, axis=-1)
    return logits
