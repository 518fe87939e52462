#!/usr/bin/env python
# (script preamble — not part of the notebook: make the repo importable
# when the example runs from any directory)
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# %% [markdown]
# # Writing a custom SSL algorithm
#
# This walkthrough mirrors the reference's `Custom_Algorithm.ipynb`: build
# a new algorithm, register it, train it through the stock machinery —
# then compose SemiReward over it in ONE line.
#
# The TPU-native design changes the contract: the reference's algorithm is
# a class with mutable members and a hook pipeline; here an algorithm is a
# **pure function from step context to losses**. Everything it does
# compiles into the single jitted train step, and any persistent
# statistics live in an explicit `init_state` pytree threaded through the
# step (that's also what makes checkpointing total — the whole algorithm
# state rides in one pytree).

# %%
import jax.numpy as jnp

import semireward_tpu as st
from semireward_tpu.algorithms.base import Algorithm
from semireward_tpu.registry import ALGORITHMS

# %% [markdown]
# ## Step 1: define and register the algorithm
#
# `ctx` carries the batch, params, PRNG key, step counter, and the
# algorithm's own state. The base class provides the reference's shared
# plumbing as pure helpers: `forward` (the canonical concat forward with
# the `{'logits','feat'}` contract), `ce_loss`, `compute_prob`,
# `fixed_mask` (confidence thresholding), `gen_ulb_targets`
# (pseudo-labeling), `consistency_loss` (with the `mask2` SemiReward hook
# point). Returning `pack(...)` hands mask/pseudo-label to the trainer's
# metrics (`util_ratio`) and to any SemiReward wrapper.

# %%
@ALGORITHMS.register("mymatch")
class MyMatch(Algorithm):
    """FixMatch-flavored: hard pseudo-labels over a fixed threshold."""

    NAME = "mymatch"
    DEFAULTS = {"p_cutoff": 0.9}           # per-algorithm flags w/ defaults
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w", "x_ulb_s")

    def init_state(self):
        return jnp.zeros(())               # no persistent statistics

    def loss(self, ctx):
        fwd = self.forward(ctx)
        sup = self.ce_loss(fwd.logits_x_lb, ctx.batch["y_lb"], "mean")
        probs = self.compute_prob(fwd.logits_x_ulb_w)
        mask = self.fixed_mask(probs)
        pl = self.gen_ulb_targets(probs, softmax=False)
        unsup = self.consistency_loss(fwd.logits_x_ulb_s, pl, "ce",
                                      mask=mask)
        return self.pack(sup_loss=sup, unsup_loss=unsup, fwd=fwd,
                         new_algo_state=ctx.algo_state, mask=mask,
                         pseudo_label=pl)


print("registered:", "mymatch" in ALGORITHMS)

# %% [markdown]
# ## Step 2: train it through the stock Trainer
#
# Nothing else to wire — the registry name is the only coupling, exactly
# like the reference's `@ALGORITHMS.register`.

# %%
cfg = st.get_config(dict(
    algorithm="mymatch", net="wrn_28_2", dataset="synthetic",
    num_classes=4, num_labels=16, batch_size=8, uratio=1,
    num_train_iter=8, num_eval_iter=8, num_log_iter=2,
    eval_batch_size=16, img_size=32, optim="SGD", lr=0.03, ema_m=0.0,
    save_dir="./saved_models/examples", save_name="mymatch"))
res = st.Trainer(cfg).fit()
print("mymatch:", {k: round(float(v), 4) for k, v in res.items()
                   if k.startswith("eval/")})

# %% [markdown]
# ## Step 3: compose SemiReward over it — one line
#
# The reference hand-copies the SemiReward protocol into five `sr*`
# classes (srfixmatch/srflexmatch/...). Here the two-stage reward
# training + filtering is a combinator over ANY registered algorithm:
# `_make_sr_variant` wraps `mymatch`'s loss with the reward filter
# (`mask2`) and threads the rewarder/generator state + their Adam
# optimizers through the same jitted step.

# %%
from semireward_tpu.algorithms.semireward import _make_sr_variant

_make_sr_variant("srmymatch", "mymatch")
cfg2 = st.get_config(dict(
    algorithm="srmymatch", net="wrn_28_2", dataset="synthetic",
    num_classes=4, num_labels=16, batch_size=8, uratio=1,
    num_train_iter=8, num_eval_iter=8, num_log_iter=2,
    eval_batch_size=16, img_size=32, optim="SGD", lr=0.03, ema_m=0.0,
    start_timing=4, N_k=2, feature_dim=128, sr_lr=1e-3,
    save_dir="./saved_models/examples", save_name="srmymatch"))
res2 = st.Trainer(cfg2).fit()
print("srmymatch:", {k: round(float(v), 4) for k, v in res2.items()
                     if k.startswith("eval/")})

# %% [markdown]
# ## Notes for real algorithms
#
# - **Persistent statistics** (FlexMatch's per-class thresholds,
#   FreeMatch's `p_model`, queues): return them from `init_state()` as a
#   pytree and thread the updated copy out through
#   `pack(new_algo_state=...)` — see
#   `semireward_tpu/algorithms/flexmatch.py` for the scatter/bincount
#   curriculum state.
# - **Extra nets** (rotation heads, projection heads): override
#   `wrap_model` — see `comatch.py` / `crmatch.py`.
# - **Different batch views** (two strong views, rotation targets):
#   declare them in `BATCH_KEYS`; the on-device augment pipeline produces
#   exactly those views.
