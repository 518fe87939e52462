"""Modality pipelines: how raw datasets become per-step view batches.

The reference dispatches collators by net name (datasets/utils.py:156-171:
bert* -> NLP tokenizing collator, hubert/wave2vec -> audio pad collator,
else CV transforms). Same here:

- CV: loader ships raw uint8; weak/strong views are on-device kernels fused
  into the train step (data/augment).
- NLP: the loader tokenizes host-side into the static max_length bucket;
  weak = 'ori' text, strong = a random back-translation (the reference's
  "augmentation" is a table lookup, so there is nothing to fuse on device).
- Audio: the loader random-crops to the fixed bucket; the strong view's
  waveform transforms run on device (data/audio.strong_augment_wave).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from semireward_tpu.data.loader import batched, infinite_indices


class GenericBundle:
    """Bundle facade for non-CV datasets (duck-types SSLDataBundle)."""

    def __init__(self, splits, num_classes):
        self.train_lb = splits["train_lb"]
        self.train_ulb = splits["train_ulb"]
        self.eval = splits["eval"]
        self.test = splits.get("test")
        self.num_classes = num_classes
        self.mean = (0.0, 0.0, 0.0)
        self.std = (1.0, 1.0, 1.0)

    @property
    def ulb_dest_len(self):
        return len(self.train_ulb)

    @property
    def lb_dest_len(self):
        return len(self.train_lb)


def modality_of(net_name: str) -> str:
    if net_name.startswith("bert") or net_name.startswith("dnabert") \
            or "hf_text" in net_name:
        return "nlp"
    if net_name.startswith(("hubert", "wave2vec", "wav2vec")):
        return "audio"
    return "cv"


class NLPSSLLoader:
    """Yields tokenized view batches directly (keys shaped like the
    reference's nlp collator output)."""

    def __init__(self, splits, collator, batch_size, ulb_batch_size,
                 batch_keys, seed=0, rank=0, world=1):
        # multi-host: same contract as loader.SSLLoader — each host draws
        # its rank-strided 1/world share of the global batch (the caller
        # divides batch sizes by world); view randomness is rank-salted
        self.lb = splits["train_lb"]
        self.ulb = splits["train_ulb"]
        self.col = collator
        self.keys = batch_keys
        self._lb = batched(infinite_indices(len(self.lb), seed, rank, world),
                           batch_size)
        self._ulb = batched(infinite_indices(len(self.ulb), seed + 1,
                                             rank, world), ulb_batch_size)
        self._rs = np.random.RandomState(seed + 2 + 1000 * rank)

    def __iter__(self):
        return self

    def __next__(self) -> Dict:
        li = next(self._lb)
        ui = next(self._ulb)
        out = {
            "y_lb": self.lb.targets[li],
            "idx_lb": li.astype(np.int32),
            "idx_ulb": ui.astype(np.int32),
        }
        for k in self.keys:
            if k == "x_lb":
                out[k] = self.col.views(self.lb, li, self._rs, strong=False)
            elif k == "x_lb_s":
                out[k] = self.col.views(self.lb, li, self._rs, strong=True)
            elif k in ("x_ulb_w", "x_ulb_w_2"):
                out[k] = self.col.views(self.ulb, ui, self._rs, strong=False)
            elif k.startswith("x_ulb_s"):
                out[k] = self.col.views(self.ulb, ui, self._rs, strong=True)
        return out


class AudioSSLLoader:
    """Yields fixed-bucket waveform batches; strong views carry the raw crop
    and are transformed on device inside the train step."""

    def __init__(self, splits, collator, batch_size, ulb_batch_size,
                 batch_keys, seed=0, rank=0, world=1):
        # multi-host: same contract as loader.SSLLoader — each host draws
        # its rank-strided 1/world share of the global batch (the caller
        # divides batch sizes by world); view randomness is rank-salted
        self.lb = splits["train_lb"]
        self.ulb = splits["train_ulb"]
        self.col = collator
        self.keys = batch_keys
        self._lb = batched(infinite_indices(len(self.lb), seed, rank, world),
                           batch_size)
        self._ulb = batched(infinite_indices(len(self.ulb), seed + 1,
                                             rank, world), ulb_batch_size)
        self._rs = np.random.RandomState(seed + 2 + 1000 * rank)

    def __iter__(self):
        return self

    def __next__(self) -> Dict:
        li = next(self._lb)
        ui = next(self._ulb)
        out = {
            "y_lb": self.lb.targets[li],
            "idx_lb": li.astype(np.int32),
            "idx_ulb": ui.astype(np.int32),
        }
        lb_waves = [self.lb.waves[i] for i in li]
        ulb_waves = [self.ulb.waves[i] for i in ui]
        for k in self.keys:
            if k == "x_lb":
                out[k] = self.col(lb_waves, self._rs)
            elif k in ("x_ulb_w", "x_ulb_w_2"):
                out[k] = self.col(ulb_waves, self._rs)
            elif k.startswith("x_ulb_s"):
                # fresh random crop; device-side strong transform applies
                out[k + "_base"] = self.col(ulb_waves, self._rs)
        return out
