"""The single training-state pytree.

The reference scatters mutable training state across the AlgorithmBase
object, hook attributes, two optimizers, a GradScaler and an EMA helper
(core/algorithmbase.py:64-138, core/hooks/*.py). Here it is ONE pytree that
a single jitted ``train_step`` consumes and returns (donated), so the whole
update — forward, backward, optimizer, EMA, algorithm statistics, SemiReward
online training — compiles to one XLA program with zero host sync.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SRState:
    """SemiReward online-training state (reference srflexmatch.py:44-59).

    ``gen_params`` is carried and "optimized" faithfully even though the
    reference's generator never receives gradients (its output passes through
    ``.long()`` before entering the rewarder — see semireward.py:21-24,
    srflexmatch.py:158-162), so its Adam update is exactly zero.
    """

    rewarder_params: Any
    rewarder_opt: Any
    rewarder_ema_params: Any  # EMARewarder shadow (semireward.py:89-101); None if sr_ema off
    gen_params: Any
    gen_opt: Any
    max_reward: jnp.ndarray  # scalar f32, init -inf (srflexmatch.py:59)


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar == reference `self.it`
    params: Any
    batch_stats: Any          # BN running stats ({} for stat-free nets)
    ema_params: Any           # EMA shadow for eval (core/utils/misc.py:132-165)
    opt_state: Any
    algo: Any                 # per-algorithm statistics pytree
    sr: Optional[SRState]
    rng: jax.Array            # root PRNG key; per-step keys fold in `step`

    @property
    def it(self):
        return self.step


def tree_ema(shadow, new, decay: float):
    """shadow <- decay*shadow + (1-decay)*new, fused tree-map (the reference
    loops a python dict of named params every step, misc.py:152-155)."""
    if decay == 0.0:
        return new
    return jax.tree_util.tree_map(
        lambda s, p: s * decay + p.astype(s.dtype) * (1.0 - decay), shadow, new
    )
