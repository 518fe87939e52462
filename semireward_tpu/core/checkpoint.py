"""Checkpoint / resume.

Rebuild of reference core/algorithmbase.py:459-527 + hooks/checkpoint.py:
the save dict {model, ema_model, optimizer, it, best_it, best_eval_acc,
algorithm extra state} becomes ONE TrainState pytree saved with orbax
(async-capable) under the same latest/best file policy. Unlike the
reference (flagged gap in SURVEY §5.4), SemiReward's rewarder/generator/
max_reward ARE checkpointed — they live in the state pytree.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # multi-host fsdp/tp shardings: np.asarray raises on arrays
            # spanning non-addressable devices — gather the full value
            # (checkpoint-time only; all hosts participate, rank 0 writes)
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x,
                                                                tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None,
                    write: bool = True):
    """Atomic pickle of the numpy-ified state pytree.

    orbax is available in-image but its directory-per-step layout is
    overkill for the reference's two-file policy; a single atomic file
    matches latest_model.pth/model_best.pth semantics exactly.

    Multi-host: call on ALL ranks with ``write=(rank == 0)`` — the
    numpy-ification gathers non-addressable (fsdp/tp-sharded) leaves via a
    collective every rank must join; only the designated rank touches disk.
    """
    payload = {"state": _to_numpy(state), "extra": extra or {}}
    if not write:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def _path_str(path) -> str:
    return "/".join(getattr(k, "key", getattr(k, "name", str(k)))
                    for k in path)


def _graft_tree(dst, src, what: str):
    """Graft src leaves onto dst by matching tree paths. A dst path missing
    in src also matches ``backbone/<path>`` (algorithm net wrappers keep the
    plain net under the ``backbone`` scope — models/wrappers.py), mirroring
    the reference eval.py's ``module.`` prefix strip (eval.py:44-48)."""
    import jax.numpy as jnp

    src_leaves = {_path_str(p): leaf for p, leaf in
                  jax.tree_util.tree_flatten_with_path(src)[0]}
    dst_paths, treedef = jax.tree_util.tree_flatten_with_path(dst)
    out = []
    for p, d in dst_paths:
        key = _path_str(p)
        leaf = src_leaves.get(key)
        if leaf is None:
            leaf = src_leaves.get("backbone/" + key)
        if leaf is None:
            raise ValueError(f"checkpoint {what} is missing leaf '{key}' "
                             f"(has {sorted(src_leaves)[:8]}...)")
        if hasattr(d, "shape") and tuple(leaf.shape) != tuple(d.shape):
            raise ValueError(f"{what} leaf '{key}' shape {leaf.shape} != "
                             f"expected {d.shape}")
        out.append(jnp.asarray(leaf, dtype=d.dtype)
                   if hasattr(d, "dtype") else leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_eval_weights(path: str, state_template) -> Tuple[Any, Dict]:
    """Algorithm-agnostic checkpoint load for evaluation: graft only
    params / ema_params / batch_stats onto the template state, ignoring the
    optimizer / algorithm / SemiReward state carried by whichever algorithm
    wrote the checkpoint. This is how the reference eval.py stays
    algorithm-agnostic — it loads only the 'ema_model' weights
    (eval.py:39-48)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    src = payload["state"]
    state = state_template.replace(
        params=_graft_tree(state_template.params, src.params, "params"),
        ema_params=_graft_tree(state_template.ema_params, src.ema_params,
                               "ema_params"),
        batch_stats=_graft_tree(state_template.batch_stats, src.batch_stats,
                                "batch_stats"),
    )
    return state, payload.get("extra", {})


def peek_extra(path: str) -> Dict:
    """Read only the extra metadata dict (it/eval/algorithm/best_*)."""
    with open(path, "rb") as f:
        return pickle.load(f).get("extra", {})


def load_checkpoint(path: str, state_template=None) -> Tuple[Any, Dict]:
    """Returns (state, extra). If a template pytree is given, loaded leaves
    are grafted onto it (keeps shardings/dtypes)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = payload["state"]
    if state_template is not None:
        leaves, treedef = jax.tree_util.tree_flatten(state)
        t_leaves, t_treedef = jax.tree_util.tree_flatten(state_template)
        if treedef != t_treedef:
            raise ValueError(
                "checkpoint pytree structure does not match current config "
                f"(ckpt {treedef} vs template {t_treedef})")
        state = jax.tree_util.tree_unflatten(
            t_treedef,
            [jax.numpy.asarray(l, dtype=t.dtype) if hasattr(t, "dtype") else l
             for l, t in zip(leaves, t_leaves)])
    return state, payload.get("extra", {})
