#!/usr/bin/env python
# (script preamble — not part of the notebook: make the repo importable
# when the example runs from any directory)
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# %% [markdown]
# # Getting started: train FixMatch with `semireward_tpu`
#
# This walkthrough mirrors the reference's `Beginner_Example.ipynb`
# (config -> dataset -> loaders -> algorithm -> train -> evaluate ->
# predict) in the TPU-native API. It runs anywhere in under a minute on
# synthetic data; every step notes the one-line change for a real corpus.

# %%
import numpy as np

import semireward_tpu as st
from semireward_tpu import get_config

# %% [markdown]
# ## Step 1: define configs and create config
#
# `get_config` accepts a plain dict using the REFERENCE's YAML key names —
# any `config/**.yaml` from the corpus loads unchanged via
# `st.from_yaml(path)`. Here: FixMatch on a synthetic 4-class task with 16
# labels. For CIFAR-10 with 40 labels, set `dataset='cifar10'`,
# `num_classes=10`, `num_labels=40`, `data_dir='./data'`.

# %%
cfg = get_config(dict(
    algorithm="fixmatch",          # any of the 21 SSL algorithms
    net="wrn_28_2",                # model zoo name (see st.NETS)
    dataset="synthetic",           # 'cifar10', 'cifar100', 'stl10', ...
    num_classes=4, num_labels=16,
    batch_size=8, uratio=1,        # ulb batch = uratio * batch_size
    num_train_iter=8, num_eval_iter=8, num_log_iter=2,
    eval_batch_size=16, img_size=32,
    optim="SGD", lr=0.03, ema_m=0.0,
    save_dir="./saved_models/examples", save_name="beginner"))
print(cfg.algorithm, cfg.net, "->", cfg.num_train_iter, "iters")

# %% [markdown]
# ## Step 2: datasets and loaders (optional — the Trainer wires these
# itself)
#
# The pieces compose standalone exactly like the reference's
# `get_dataset` / `get_data_loader`: a labeled/unlabeled split plus an
# infinite seeded sampler. You only need them directly for custom loops.

# %%
bundle = st.get_dataset(cfg, cfg.algorithm)
loader = st.get_data_loader(bundle, cfg)
batch = next(loader)
print("lb:", batch["x_lb"].shape, "ulb:", batch["x_ulb"].shape,
      "(raw uint8 — augmentation runs ON DEVICE inside the jitted step)")

# %% [markdown]
# ## Step 3: create the trainer
#
# `st.Trainer(cfg)` builds the net (`st.NETS`), the algorithm
# (`st.ALGORITHMS`), EMA, optimizer + cosine schedule, and ONE jitted
# train step — the whole per-step pipeline (augment -> forward ->
# pseudo-label -> mask -> loss -> grad -> EMA) compiles into a single
# XLA program; there is no Python hook loop on the hot path.

# %%
trainer = st.Trainer(cfg)
print("model:", type(trainer.model).__name__,
      "| params:", sum(x.size for x in
                       __import__("jax").tree_util.tree_leaves(
                           trainer.state.params)))

# %% [markdown]
# ## Step 4: train
#
# `fit()` runs the step loop with periodic eval, best/latest checkpoints
# (`latest_model.ckpt` / `model_best.ckpt`), and a `metrics.jsonl` stream.

# %%
results = trainer.fit()
print({k: round(float(v), 4) for k, v in results.items()
       if k.startswith("eval/")})

# %% [markdown]
# ## Step 5: evaluate
#
# Reference-parity metrics (sklearn semantics): top-1/top-5, balanced
# accuracy, macro precision/recall/F1 — computed under the EMA shadow
# weights like the reference's `evaluate()`.

# %%
metrics = trainer.evaluate()
print({k: round(float(v), 4) for k, v in metrics.items()})

# %% [markdown]
# ## Step 6: predict
#
# `predict` takes raw uint8 images (normalization applied internally).

# %%
x = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), np.uint8)
logits = trainer.predict(x)
print("logits:", np.asarray(logits).shape,
      "argmax:", np.asarray(logits).argmax(-1))

# %% [markdown]
# ## Where to go next
#
# - **SemiReward**: set `algorithm='srfixmatch'` (plus `start_timing`,
#   `N_k`, `feature_dim`) to train a reward model online and filter
#   pseudo-labels by reward — the headline capability.
# - **Real configs**: `cfg = st.from_yaml('config/classic_cv/fixmatch/`
#   `fixmatch_cifar10_40_0.yaml')`, then `st.Trainer(cfg).fit()`.
# - **CLI**: `python train.py --c <yaml>` with any key overridable as a
#   flag.
# - **Multi-chip**: set `mesh_shape=(-1,)` for data-parallel over every
#   visible device; 2-D layouts via `mesh_shape=(d, f)`,
#   `mesh_axes=('data','fsdp')`.
