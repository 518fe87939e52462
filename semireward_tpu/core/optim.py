"""Optimizers and LR schedules (optax).

TPU-native rebuild of the reference optimizer builder
(semilearn/core/utils/build.py:193-251):

- SGD (nesterov) / AdamW
- weight decay skipped on norm/bias params (``bn_wd_skip``)
- cosine schedule with warmup and 7/16 cycles
- BEiT-style layer-wise LR decay (reference nets/utils.py param_groups_layer_decay)

Everything is a single optax GradientTransformation applied to one params
pytree inside the jitted train step — there are no python-side param groups.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_schedule_with_warmup(
    lr: float,
    num_training_steps: int,
    num_warmup_steps: int = 0,
    num_cycles: float = 7.0 / 16.0,
) -> optax.Schedule:
    """LR multiplier schedule exactly matching reference build.py:227-251."""

    def sched(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(1.0, float(num_warmup_steps))
        denom = float(max(1, num_training_steps - num_warmup_steps))
        frac = (count - num_warmup_steps) / denom
        cos = jnp.maximum(0.0, jnp.cos(math.pi * num_cycles * frac))
        mult = jnp.where(count < num_warmup_steps, warm, cos)
        return lr * mult

    return sched


def _path_names(path) -> list:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return out


def default_wd_mask(params) -> "jax.tree_util.PyTreeDef":
    """True = apply weight decay. Skips biases, norm scales, embeddings,
    cls/pos tokens — the union of the reference models' no_weight_decay lists
    (nets/wrn/wrn.py:152-157, nets/vit/vit.py:285-320)."""

    def keep(path, leaf):
        names = [n.lower() for n in _path_names(path)]
        leafname = names[-1] if names else ""
        if leafname in ("bias", "scale"):
            return False
        if leafname in ("embedding", "cls_token", "pos_embed", "cls", "mask_token"):
            return False
        if any(("norm" in n) or n.startswith("bn") or n.endswith("_bn") for n in names[:-1]):
            return False
        return jnp.ndim(leaf) > 1 if hasattr(leaf, "ndim") else True

    return jax.tree_util.tree_map_with_path(keep, params)


def layer_decay_scales(params, layer_decay: float,
                       layer_id_fn: Callable[[list, int], int],
                       num_layers: int):
    """Per-leaf LR scale tree: scale = layer_decay ** (num_layers - layer_id),
    the exponent convention of the reference param_groups_layer_decay
    (nets/utils.py:166-168, timm/BEiT: scale = ld ** (layer_max - id)):
    the head (layer_id = num_layers = layer_max) gets scale 1.0 exactly,
    embeddings (id 0) the deepest decay. Rounds 1-3 shipped an off-by-one
    (ld ** (num_layers + 1 - id)) that uniformly deflated every group's LR
    by one extra factor of layer_decay — found in the round-3 review."""

    def scale(path, leaf):
        names = _path_names(path)
        lid = layer_id_fn(names, num_layers)
        return layer_decay ** (num_layers - lid)

    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_tree(scales) -> optax.GradientTransformation:
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _elementwise_vec(params, per_leaf) -> jnp.ndarray:
    """Broadcast a per-leaf scalar/bool tree to one elementwise f32 vector in
    ravel_pytree order."""
    from jax.flatten_util import ravel_pytree

    expanded = jax.tree_util.tree_map(
        lambda p, v: jnp.full(p.shape, jnp.float32(v)), params, per_leaf)
    return ravel_pytree(expanded)[0]


def build_flat_optimizer(
    params,
    optim_name: str,
    schedule: optax.Schedule,
    momentum: float,
    weight_decay: float,
    nesterov: bool,
    clip_grad: float,
    wd_mask,
    scales,
) -> optax.GradientTransformation:
    """Optimizer over ONE raveled parameter vector.

    The per-leaf optax chain emits ~5 ops per parameter leaf (150+ leaves on
    ViT-S -> ~750 small kernels + per-leaf copies every step: measured
    1.7 ms/step on TPU v5e vs 0.05 ms for the same math on one fused
    vector). Weight-decay masking and BEiT layer-decay become elementwise
    constant vectors baked at build time; the math below reproduces
    torch.optim.SGD/AdamW exactly as the tree path does (tested equivalent
    in tests/test_optim.py)."""
    from jax.flatten_util import ravel_pytree

    if optim_name.lower() not in ("adamw", "adam", "sgd"):
        # match the tree path's validation — silently running SGD for an
        # unknown name would let a typo'd config train with the wrong
        # optimizer
        raise ValueError(f"unknown optimizer '{optim_name}'")
    flat0, unravel = ravel_pytree(params)
    wd_vec = _elementwise_vec(params, wd_mask) if weight_decay else None
    scale_vec = _elementwise_vec(params, scales) if scales is not None else None
    is_adam = optim_name.lower() in ("adamw", "adam")
    use_wd = bool(weight_decay) and optim_name.lower() != "adam"

    def init_fn(params):
        p, _ = ravel_pytree(params)
        state = {"count": jnp.zeros((), jnp.int32)}
        if is_adam:
            state["mu"] = jnp.zeros_like(p)
            state["nu"] = jnp.zeros_like(p)
        else:
            state["trace"] = jnp.zeros_like(p)
        return state

    def update_fn(grads, state, params=None):
        g, _ = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        p, _ = ravel_pytree(params)
        count = state["count"] + 1
        if clip_grad and clip_grad > 0:
            gnorm = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, clip_grad / jnp.maximum(gnorm, 1e-12))
        new_state = {"count": count}
        if is_adam:
            # optax.scale_by_adam / torch.optim.AdamW (decoupled wd AFTER)
            mu = 0.9 * state["mu"] + 0.1 * g
            nu = 0.999 * state["nu"] + 0.001 * (g * g)
            c = count.astype(jnp.float32)
            mhat = mu / (1.0 - 0.9 ** c)
            nuhat = nu / (1.0 - 0.999 ** c)
            upd = mhat / (jnp.sqrt(nuhat) + 1e-8)
            if use_wd:
                upd = upd + weight_decay * wd_vec * p
            new_state["mu"] = mu
            new_state["nu"] = nu
        else:
            # torch.optim.SGD: wd folded into the grad BEFORE momentum
            if use_wd:
                g = g + weight_decay * wd_vec * p
            tr = g + momentum * state["trace"]
            upd = g + momentum * tr if nesterov else tr
            new_state["trace"] = tr
        if scale_vec is not None:
            upd = upd * scale_vec
        upd = -schedule(state["count"]) * upd
        return unravel(upd), new_state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    params,
    optim_name: str = "SGD",
    lr: float = 0.03,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    layer_decay: float = 1.0,
    nesterov: bool = True,
    num_training_steps: int = 1,
    num_warmup_steps: int = 0,
    clip_grad: float = 0.0,
    layer_id_fn: Optional[Callable] = None,
    num_layers: int = 0,
    schedule: Optional[optax.Schedule] = None,
    flat: bool = False,
) -> optax.GradientTransformation:
    """One transformation fusing {grad clip, weight decay, momentum/adam,
    layer-decay scaling, cosine schedule}. The reference splits these across
    GradScaler/optimizer/scheduler objects stepped by ParamUpdateHook
    (core/hooks/param_update.py:15-45); here they run inside the jitted step.

    ``flat=True`` runs the same math on one raveled vector. Measured on TPU
    v5e: standalone the flat update is 30x faster (0.05 vs 1.7 ms), but
    inside the full train step it LOSES ~11% end-to-end (49.7 vs 56.0
    steps/s) — XLA interleaves the per-leaf updates into the backward pass
    fusions, and flattening both breaks that overlap and adds ravel/unravel
    copies of the whole gradient/param vectors. Default stays per-leaf;
    the flat path is kept (tested bit-equivalent) for optimizers/backends
    where that fusion does not happen.
    """
    if schedule is None:
        schedule = cosine_schedule_with_warmup(
            lr, num_training_steps, num_warmup_steps
        )
    wd_mask = default_wd_mask(params)

    if flat:
        scales = None
        if layer_decay != 1.0 and layer_id_fn is not None:
            scales = layer_decay_scales(params, layer_decay, layer_id_fn,
                                        num_layers)
        return build_flat_optimizer(
            params, optim_name, schedule, momentum, weight_decay, nesterov,
            clip_grad, wd_mask, scales)

    chain = []
    if clip_grad and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))

    if optim_name.lower() == "sgd":
        # torch.optim.SGD applies wd to the grad before the momentum buffer.
        if weight_decay:
            chain.append(optax.masked(optax.add_decayed_weights(weight_decay), wd_mask))
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    elif optim_name.lower() == "adamw":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if weight_decay:
            chain.append(optax.masked(optax.add_decayed_weights(weight_decay), wd_mask))
    elif optim_name.lower() == "adam":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    else:
        raise ValueError(f"unknown optimizer {optim_name}")

    if layer_decay != 1.0 and layer_id_fn is not None:
        scales = layer_decay_scales(params, layer_decay, layer_id_fn, num_layers)
        chain.append(scale_by_tree(scales))

    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def build_adam(lr: float) -> optax.GradientTransformation:
    """Plain Adam for SemiReward's rewarder/generator
    (reference srflexmatch.py:54-55: torch.optim.Adam(lr=sr_lr))."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
