"""Shared SSL building blocks as pure functions.

The reference implements these as stateful hook objects mutating tensors on
`self` (semilearn/algorithms/hooks/*, flexmatch/utils.py, freematch/utils.py,
softmatch/utils.py). Here each is a pure ``(state, inputs) -> (state, out)``
function over fixed-shape device arrays, so the whole algorithm compiles into
the jitted train step — the host never sees a scalar.

Cross-replica notes: the reference all_gathers probabilities before updating
distribution statistics (concat_all_gather, algorithms/utils/ops.py:34-45).
Under pjit with a batch sharded on the 'data' mesh axis, every ``jnp.mean``
over the batch axis below IS the global mean — XLA inserts the collective.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from semireward_tpu.core.losses import gen_ulb_targets  # re-export  # noqa: F401


# ---------------------------------------------------------------------------
# Canonical SSL forward: one concatenated pass (reference fixmatch.py:52-71)
# ---------------------------------------------------------------------------

class ForwardOut(NamedTuple):
    logits_x_lb: jnp.ndarray
    logits_x_ulb_w: jnp.ndarray
    logits_x_ulb_s: jnp.ndarray
    feats_x_lb: jnp.ndarray
    feats_x_ulb_w: jnp.ndarray
    feats_x_ulb_s: jnp.ndarray
    model_state: Any  # new batch_stats collection ({} if none)


def ssl_forward(
    apply_fn,
    params,
    batch_stats,
    x_lb,
    x_ulb_w,
    x_ulb_s,
    rng,
    train: bool = True,
    use_cat: bool = True,
    stop_grad_w: bool = True,
) -> ForwardOut:
    """Concat [x_lb, x_ulb_w, x_ulb_s] -> one model pass -> split.

    One big batched matmul-heavy pass keeps the MXU fed; ``use_cat=False``
    reproduces the reference's separate-passes path (BN stats then come from
    each sub-batch alone, and the weak branch runs without gradient).
    """
    def batch_dim(x):
        return jax.tree_util.tree_leaves(x)[0].shape[0]

    num_lb = batch_dim(x_lb)
    num_ulb = batch_dim(x_ulb_w)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    mutable = ["batch_stats"] if (train and batch_stats) else False
    rngs = {"dropout": rng} if rng is not None else None

    def fwd(v, x, m):
        out = apply_fn(v, x, train=train, mutable=m, rngs=rngs)
        if m:
            return out[0], out[1]
        return out, {}

    if use_cat:
        # pytree-aware concat: image tensors AND token dicts
        # ({input_ids, attention_mask}) ride the same path
        inputs = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), x_lb, x_ulb_w, x_ulb_s)
        outs, new_state = fwd(variables, inputs, mutable)
        logits, feats = outs["logits"], outs["feat"]
        l_lb, l_w, l_s = jnp.split(logits, [num_lb, num_lb + num_ulb], axis=0)
        f_lb, f_w, f_s = jnp.split(feats, [num_lb, num_lb + num_ulb], axis=0)
    else:
        # three SEPARATE forwards need independent dropout draws — the
        # reference consumes the torch global RNG sequentially; reusing one
        # key would give the weak teacher and strong student pass
        # bit-identical masks (same shapes), biasing their disagreement.
        # The LB pass keeps the UNFOLDED key: threefry bits are
        # counter-prefix-stable, so its masks coincide with the cat path's
        # leading rows (what keeps cat/separate losses comparable when only
        # the supervised term is active).
        def fold(i):
            return ({"dropout": (rng if i == 0
                                 else jax.random.fold_in(rng, i))}
                    if rng is not None else None)

        def fwd_i(v, x, m, i):
            out = apply_fn(v, x, train=train, mutable=m, rngs=fold(i))
            return (out[0], out[1]) if m else (out, {})

        outs_lb, st1 = fwd_i(variables, x_lb, mutable, 0)
        if st1:
            variables = {"params": params, "batch_stats": st1["batch_stats"]}
        outs_s, st2 = fwd_i(variables, x_ulb_s, mutable, 2)
        # weak branch: no grad, and BN running stats frozen — the reference
        # wraps it in torch.no_grad() + Bn_Controller (misc.py:105-129),
        # which still NORMALIZES by the weak batch's own moments (train-mode
        # BN) but restores the running stats afterwards. Equivalent here:
        # train-mode forward whose returned batch_stats are discarded.
        # (note: in this separate path the weak branch is no-grad
        # UNCONDITIONALLY, mirroring the reference's torch.no_grad() +
        # Bn_Controller wrapper — stop_grad_w only has extra effect in the
        # use_cat path, same as the reference)
        outs_w, _ = fwd_i(
            {k: jax.lax.stop_gradient(v) for k, v in variables.items()},
            x_ulb_w, mutable, 3)
        l_lb, f_lb = outs_lb["logits"], outs_lb["feat"]
        l_s, f_s = outs_s["logits"], outs_s["feat"]
        l_w = jax.lax.stop_gradient(outs_w["logits"])
        f_w = jax.lax.stop_gradient(outs_w["feat"])
        new_state = st2 or st1
    if stop_grad_w:
        l_w = jax.lax.stop_gradient(l_w)
        f_w = jax.lax.stop_gradient(f_w)
    return ForwardOut(l_lb, l_w, l_s, f_lb, f_w, f_s, new_state)


def compute_prob(logits: jnp.ndarray) -> jnp.ndarray:
    """reference AlgorithmBase.compute_prob = softmax (algorithmbase.py)."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


# ---------------------------------------------------------------------------
# Fixed threshold (reference algorithms/hooks/masking.py:42-57)
# ---------------------------------------------------------------------------

def fixed_threshold_mask(probs: jnp.ndarray, p_cutoff: float) -> jnp.ndarray:
    max_probs = jnp.max(probs, axis=-1)
    return (max_probs >= p_cutoff).astype(probs.dtype)


# ---------------------------------------------------------------------------
# FlexMatch Curriculum Pseudo Labeling (reference flexmatch/utils.py:11-63)
# ---------------------------------------------------------------------------

@struct.dataclass
class FlexState:
    selected_label: jnp.ndarray  # int32 [ulb_dest_len], init -1
    classwise_acc: jnp.ndarray   # f32 [num_classes], init 0


def flex_init(ulb_dest_len: int, num_classes: int) -> FlexState:
    return FlexState(
        selected_label=jnp.full((ulb_dest_len,), -1, jnp.int32),
        classwise_acc=jnp.zeros((num_classes,), jnp.float32),
    )


def flex_mask(
    state: FlexState,
    probs: jnp.ndarray,
    idx_ulb: jnp.ndarray,
    p_cutoff: float,
    thresh_warmup: bool = True,
) -> Tuple[FlexState, jnp.ndarray]:
    """Mask with the convex curriculum threshold, then scatter-update the
    full-ulb-set ``selected_label`` vector and recompute ``classwise_acc`` —
    on-device bincount instead of the reference's host Counter
    (flexmatch/utils.py:23-35,58-61). Order matches the reference: mask uses
    the PREVIOUS classwise_acc.
    """
    num_classes = state.classwise_acc.shape[0]
    max_probs = jnp.max(probs, axis=-1)
    max_idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    acc = state.classwise_acc[max_idx]
    mask = (max_probs >= p_cutoff * (acc / (2.0 - acc))).astype(probs.dtype)
    select = max_probs >= p_cutoff

    # scatter: selected_label[idx_ulb[select]] = max_idx[select]
    upd_idx = jnp.where(select, idx_ulb.astype(jnp.int32),
                        state.selected_label.shape[0])  # OOB -> dropped
    selected = state.selected_label.at[upd_idx].set(max_idx, mode="drop")

    # classwise_acc from bincount over {-1, 0..C-1}
    counts = jnp.bincount(selected + 1, length=num_classes + 1)
    count_all_max = jnp.max(counts)
    denom_warm = count_all_max
    denom_nowarm = jnp.max(counts[1:])
    denom = denom_warm if thresh_warmup else denom_nowarm
    new_acc = counts[1:].astype(jnp.float32) / jnp.maximum(denom, 1).astype(jnp.float32)
    # reference guard: no update while every entry still holds the same value
    do_update = count_all_max < selected.shape[0]
    new_acc = jnp.where(do_update, new_acc, state.classwise_acc)
    return FlexState(selected_label=selected, classwise_acc=new_acc), mask


# ---------------------------------------------------------------------------
# FreeMatch Self-Adaptive Thresholding (reference freematch/utils.py:10-66)
# ---------------------------------------------------------------------------

@struct.dataclass
class FreeState:
    p_model: jnp.ndarray    # f32 [C]
    label_hist: jnp.ndarray  # f32 [C]
    time_p: jnp.ndarray     # f32 scalar


def free_init(num_classes: int) -> FreeState:
    u = jnp.ones((num_classes,), jnp.float32) / num_classes
    # label_hist must be a DISTINCT buffer: the TrainState is donated by the
    # jitted step, and two leaves aliasing one array is a double-donation
    # (rejected by the TPU runtime with INVALID_ARGUMENT)
    return FreeState(p_model=u, label_hist=jnp.array(u, copy=True),
                     time_p=u.mean())


def free_mask(
    state: FreeState,
    probs: jnp.ndarray,
    momentum: float = 0.999,
    use_quantile: bool = False,
    clip_thresh: bool = False,
) -> Tuple[FreeState, jnp.ndarray]:
    m = momentum
    max_probs = jnp.max(probs, axis=-1)
    max_idx = jnp.argmax(probs, axis=-1)
    if use_quantile:
        stat = jnp.quantile(max_probs, 0.8)
    else:
        stat = max_probs.mean()
    time_p = state.time_p * m + (1 - m) * stat
    if clip_thresh:
        time_p = jnp.clip(time_p, 0.0, 0.95)
    p_model = state.p_model * m + (1 - m) * probs.mean(axis=0)
    hist = jnp.bincount(max_idx, length=state.p_model.shape[0]).astype(jnp.float32)
    label_hist = state.label_hist * m + (1 - m) * (hist / hist.sum())
    new = FreeState(p_model=p_model, label_hist=label_hist, time_p=time_p)
    # mask computed from the UPDATED stats (reference masking calls update first)
    mod = p_model / jnp.max(p_model)
    mask = (max_probs >= time_p * mod[max_idx]).astype(probs.dtype)
    return new, mask


def free_entropy_loss(mask, logits_s, p_model, label_hist):
    """FreeMatch self-adaptive fairness loss (freematch/freematch.py:16-44).
    The reference boolean-indexes logits_s[mask]; here the select is a weighted
    reduction (mask is {0,1}) so shapes stay static."""
    logits_s = logits_s.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    n_sel = maskf.sum()
    prob_s = jax.nn.softmax(logits_s, axis=-1)
    pred_s = jnp.argmax(prob_s, axis=-1)
    C = logits_s.shape[-1]
    hist_s = jnp.zeros((C,), jnp.float32).at[pred_s].add(maskf)
    hist_sum = jnp.maximum(hist_s.sum(), 1e-12)
    hist_s_n = hist_s / hist_sum

    def inv0(x):
        return jnp.where(x == 0, 0.0, 1.0 / jnp.maximum(x, 1e-30))

    mod_pm = p_model.reshape(1, -1) * inv0(label_hist.reshape(1, -1))
    mod_pm = mod_pm / mod_pm.sum(axis=-1, keepdims=True)
    mean_prob_s = (prob_s * maskf[:, None]).sum(axis=0) / jnp.maximum(n_sel, 1e-12)
    mod_mp = mean_prob_s.reshape(1, -1) * inv0(hist_s_n.reshape(1, -1))
    mod_mp = mod_mp / jnp.maximum(mod_mp.sum(axis=-1, keepdims=True), 1e-12)
    loss = (mod_pm * jnp.log(mod_mp + 1e-12)).sum(axis=1).mean()
    # reference: ent_loss only when mask.sum() > 0
    return jnp.where(n_sel > 0, loss, 0.0)


# ---------------------------------------------------------------------------
# SoftMatch truncated-Gaussian weighting (reference softmatch/utils.py:12-77)
# ---------------------------------------------------------------------------

@struct.dataclass
class SoftMatchState:
    prob_max_mu_t: jnp.ndarray
    prob_max_var_t: jnp.ndarray


def softmatch_init(num_classes: int, per_class: bool = False) -> SoftMatchState:
    if per_class:
        return SoftMatchState(
            prob_max_mu_t=jnp.ones((num_classes,), jnp.float32) / num_classes,
            prob_max_var_t=jnp.ones((num_classes,), jnp.float32),
        )
    return SoftMatchState(
        prob_max_mu_t=jnp.asarray(1.0 / num_classes, jnp.float32),
        prob_max_var_t=jnp.asarray(1.0, jnp.float32),
    )


def softmatch_mask(
    state: SoftMatchState,
    probs: jnp.ndarray,
    n_sigma: float = 2.0,
    momentum: float = 0.999,
    per_class: bool = False,
) -> Tuple[SoftMatchState, jnp.ndarray]:
    m = momentum
    max_probs = jnp.max(probs, axis=-1)
    max_idx = jnp.argmax(probs, axis=-1)
    if not per_class:
        mu_t = max_probs.mean()
        var_t = jnp.var(max_probs, ddof=1)
        mu = state.prob_max_mu_t * m + (1 - m) * mu_t
        var = state.prob_max_var_t * m + (1 - m) * var_t
        new = SoftMatchState(mu, var)
        mu_b, var_b = mu, var
    else:
        C = state.prob_max_mu_t.shape[0]
        onehot = jax.nn.one_hot(max_idx, C, dtype=jnp.float32)
        cnt = onehot.sum(axis=0)
        s1 = (onehot * max_probs[:, None]).sum(axis=0)
        s2 = (onehot * (max_probs**2)[:, None]).sum(axis=0)
        mean_c = s1 / jnp.maximum(cnt, 1.0)
        var_c = (s2 - cnt * mean_c**2) / jnp.maximum(cnt - 1.0, 1.0)
        # reference only updates classes with >1 sample; others keep (0, 1)
        mu_t = jnp.where(cnt > 1, mean_c, 0.0)
        var_t = jnp.where(cnt > 1, var_c, 1.0)
        mu = state.prob_max_mu_t * m + (1 - m) * mu_t
        var = state.prob_max_var_t * m + (1 - m) * var_t
        new = SoftMatchState(mu, var)
        mu_b, var_b = mu[max_idx], var[max_idx]
    diff = jnp.minimum(max_probs - mu_b, 0.0)
    mask = jnp.exp(-(diff**2) / (2 * var_b / (n_sigma**2)))
    return new, mask.astype(probs.dtype)


# ---------------------------------------------------------------------------
# Distribution alignment (reference algorithms/hooks/dist_align.py:10-155)
# ---------------------------------------------------------------------------

@struct.dataclass
class DistAlignEMAState:
    p_target: jnp.ndarray
    p_model: jnp.ndarray
    initialized: jnp.ndarray  # bool scalar: p_model starts as plain mean


def dist_align_ema_init(num_classes: int, p_target: Optional[jnp.ndarray] = None,
                        update_target: bool = False) -> Tuple[DistAlignEMAState, bool]:
    if p_target is None:
        p_target = jnp.ones((num_classes,), jnp.float32) / num_classes
    state = DistAlignEMAState(
        p_target=p_target.astype(jnp.float32),
        p_model=jnp.zeros((num_classes,), jnp.float32),
        initialized=jnp.asarray(False),
    )
    return state, update_target


def dist_align_ema(
    state: DistAlignEMAState,
    probs_x_ulb: jnp.ndarray,
    probs_x_lb: Optional[jnp.ndarray] = None,
    momentum: float = 0.999,
    update_target: bool = False,
) -> Tuple[DistAlignEMAState, jnp.ndarray]:
    m = momentum
    mean_ulb = probs_x_ulb.mean(axis=0)
    p_model = jnp.where(state.initialized,
                        state.p_model * m + mean_ulb * (1 - m), mean_ulb)
    p_target = state.p_target
    if update_target:
        assert probs_x_lb is not None
        p_target = p_target * m + probs_x_lb.mean(axis=0) * (1 - m)
    new = DistAlignEMAState(p_target=p_target, p_model=p_model,
                            initialized=jnp.asarray(True))
    aligned = probs_x_ulb * (p_target + 1e-6) / (p_model + 1e-6)
    aligned = aligned / aligned.sum(axis=-1, keepdims=True)
    return new, aligned


@struct.dataclass
class DistAlignQueueState:
    p_target: jnp.ndarray      # [L, C]
    p_model: jnp.ndarray       # [L, C]
    p_model_ptr: jnp.ndarray   # int32
    p_target_ptr: jnp.ndarray  # int32 (-1 = fixed target)


def dist_align_queue_init(num_classes: int, queue_length: int = 128,
                          p_target_type: str = "uniform",
                          p_target: Optional[jnp.ndarray] = None) -> DistAlignQueueState:
    if p_target_type == "uniform":
        tgt = jnp.ones((queue_length, num_classes), jnp.float32) / num_classes
        tptr = jnp.asarray(-1, jnp.int32)
    elif p_target_type == "model":
        tgt = jnp.zeros((queue_length, num_classes), jnp.float32)
        tptr = jnp.asarray(0, jnp.int32)
    else:
        assert p_target is not None
        tgt = jnp.tile(p_target.reshape(1, -1), (queue_length, 1)).astype(jnp.float32)
        tptr = jnp.asarray(-1, jnp.int32)
    return DistAlignQueueState(
        p_target=tgt,
        p_model=jnp.zeros((queue_length, num_classes), jnp.float32),
        p_model_ptr=jnp.asarray(0, jnp.int32),
        p_target_ptr=tptr,
    )


def dist_align_queue(
    state: DistAlignQueueState,
    probs_x_ulb: jnp.ndarray,
    probs_x_lb: Optional[jnp.ndarray] = None,
) -> Tuple[DistAlignQueueState, jnp.ndarray]:
    L = state.p_model.shape[0]
    p_model = state.p_model.at[state.p_model_ptr].set(probs_x_ulb.mean(axis=0))
    p_model_ptr = (state.p_model_ptr + 1) % L
    p_target, p_target_ptr = state.p_target, state.p_target_ptr
    if probs_x_lb is not None:
        upd = p_target.at[jnp.maximum(p_target_ptr, 0)].set(probs_x_lb.mean(axis=0))
        track = p_target_ptr >= 0
        p_target = jnp.where(track, upd, p_target)
        p_target_ptr = jnp.where(track, (p_target_ptr + 1) % L, p_target_ptr)
    new = DistAlignQueueState(p_target, p_model, p_model_ptr, p_target_ptr)
    aligned = probs_x_ulb * (p_target.mean(axis=0) + 1e-6) / (p_model.mean(axis=0) + 1e-6)
    aligned = aligned / aligned.sum(axis=-1, keepdims=True)
    return new, aligned


# ---------------------------------------------------------------------------
# Misc shared ops (reference algorithms/utils/ops.py:49-74)
# ---------------------------------------------------------------------------

def concat_all_gather(x, axis_name: str = "data"):
    """Cross-replica gather (reference algorithms/utils/ops.py:34-45).
    Only needed under shard_map/pmap with a named axis — under plain pjit
    every batch-mean below is already global. No gradient, like the
    reference's torch.distributed.all_gather."""
    g = jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name)
    return g.reshape((-1,) + x.shape[1:])


def interleave(xy, batch):
    """Kept for API parity; the reference marks it 'not used'
    (algorithms/utils/ops.py:8-31)."""
    nu = len(xy) - 1
    groups = [batch // (nu + 1)] * (nu + 1)
    for x in range(batch - sum(groups)):
        groups[-x - 1] += 1
    offsets = [0]
    for g in groups:
        offsets.append(offsets[-1] + g)
    xy = [[v[offsets[p]:offsets[p + 1]] for p in range(nu + 1)] for v in xy]
    for i in range(1, nu + 1):
        xy[0][i], xy[i][i] = xy[i][i], xy[0][i]
    return [jnp.concatenate(v, axis=0) for v in xy]


def mixup_one_target(rng, x, y, alpha: float = 1.0, is_bias: bool = False):
    k1, k2 = jax.random.split(rng)
    if alpha > 0:
        lam = jax.random.beta(k1, alpha, alpha)
    else:
        lam = jnp.asarray(1.0)
    if is_bias:
        lam = jnp.maximum(lam, 1 - lam)
    index = jax.random.permutation(k2, x.shape[0])
    mixed_x = lam * x + (1 - lam) * x[index]
    mixed_y = lam * y + (1 - lam) * y[index]
    return mixed_x, mixed_y, lam
