#!/usr/bin/env python
# (script preamble — not part of the notebook: make the repo importable
# when the example runs from any directory)
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

# %% [markdown]
# # Bringing your own dataset
#
# This walkthrough mirrors the reference's `Custom_Dataset.ipynb`
# (docs/tutorial.md §3): raw arrays -> `split_ssl_data` -> a data bundle
# -> the stock trainer. The TPU-native difference: datasets hold RAW uint8
# arrays and the weak/strong augmentation views are produced ON DEVICE
# inside the jitted step — there is no per-sample `__getitem__` transform
# pipeline to subclass.

# %%
import numpy as np

import semireward_tpu as st
from semireward_tpu.data.datasets import ArrayDataset, SSLDataBundle

# %% [markdown]
# ## Step 1: your data
#
# Any uint8 image array `[N, H, W, 3]` with integer labels `[N]`. Here: a
# synthetic 4-class task (class-colored noise around prototypes).

# %%
rs = np.random.RandomState(0)
base = rs.randint(0, 256, (4, 32, 32, 3))
y_all = rs.randint(0, 4, 512)
x_all = np.clip(base[y_all] + rs.randint(-40, 40, (512, 32, 32, 3)),
                0, 255).astype(np.uint8)
x_test, y_test = x_all[:64], y_all[:64]
x_train, y_train = x_all[64:], y_all[64:]
print("train:", x_train.shape, "test:", x_test.shape)

# %% [markdown]
# ## Step 2: labeled/unlabeled split
#
# `split_ssl_data` is the reference's class-balanced split
# (semilearn/datasets/utils.py:25-137): `lb_num_labels` per-class-balanced
# labeled samples, the rest unlabeled (labeled data included in the
# unlabeled set by default, like the reference). Pass
# `dump_dir=...` to persist the indices as `data_statistics/*.npy`.

# %%
lb_x, lb_y, ulb_x, ulb_y = st.split_ssl_data(
    x_train, y_train, num_classes=4, lb_num_labels=16)
print("labeled:", lb_x.shape, "unlabeled:", ulb_x.shape,
      "| per-class:", np.bincount(lb_y))

# %% [markdown]
# ## Step 3: wrap in an SSLDataBundle
#
# The bundle is the trainer's whole data interface: train_lb / train_ulb /
# eval datasets plus normalization constants. `ArrayDataset` is a thin
# (data, targets) holder; for lazy decode from JPEG folders use
# `JPEGFolderDataset` (it decodes per batch through a thread pool).

# %%
bundle = SSLDataBundle(
    train_lb=ArrayDataset(lb_x, lb_y),
    train_ulb=ArrayDataset(ulb_x, ulb_y),
    eval=ArrayDataset(x_test, y_test),
    num_classes=4, mean=(0.5,) * 3, std=(0.25,) * 3)

# %% [markdown]
# ## Step 4: train on it
#
# Hand the bundle to the Trainer (`dataset='custom'` skips the built-in
# dataset dispatch). Every algorithm — including the SemiReward variants
# and the imbalanced wrappers — works on a custom bundle unchanged.

# %%
cfg = st.get_config(dict(
    algorithm="fixmatch", net="wrn_28_2", dataset="custom",
    num_classes=4, num_labels=16, batch_size=8, uratio=1,
    num_train_iter=8, num_eval_iter=8, num_log_iter=2,
    eval_batch_size=16, img_size=32, optim="SGD", lr=0.03, ema_m=0.0,
    save_dir="./saved_models/examples", save_name="custom_dataset"))
trainer = st.Trainer(cfg, bundle=bundle)
trainer.fit()
print({k: round(float(v), 4) for k, v in trainer.evaluate().items()})

# %% [markdown]
# ## Registering a named dataset (optional)
#
# To make the dataset usable from YAML configs and the CLI
# (`--dataset mydata`), register a loader in `st.DATASETS` that returns a
# bundle — see `semireward_tpu/data/datasets.py` (CIFAR) and
# `data/cv_extra.py` (folder/npz layouts) for the patterns the built-ins
# use. NLP corpora use the reference's JSON layout
# (`train/dev/test.json` with back-translation fields), audio uses
# pickled `(wave, label)` rows — see `data/nlp.py` / `data/audio.py`.
