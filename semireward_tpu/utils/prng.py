"""Deterministic PRNG plumbing.

The reference seeds python/numpy/torch/cudnn per process (train.py:358-363).
Here determinism falls out of JAX's splittable keys: one root key per run,
folded with the step counter inside the jitted train step, so resume at step
k reproduces the same stream without replaying k steps.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(key: jax.Array, step) -> jax.Array:
    """Key for a given global step — stable under resume."""
    return jax.random.fold_in(key, step)


def named_keys(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    ks = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, ks)}
