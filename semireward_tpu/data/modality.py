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
    reference's nlp collator output), jointly bucketed per step when the
    collator has static length buckets (data/nlp.py:NLPCollator)."""

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
        # Multi-host + buckets: the bucket MUST be identical on every host
        # (SPMD one-program rule) but each host sees only its 1/world batch
        # shard. infinite_indices rank-strides ONE shared permutation, so
        # the union of all ranks' step-t indices is exactly positions
        # [t*world*bs, (t+1)*world*bs) of the unstrided stream — every host
        # re-derives the GLOBAL batch, bounds its max token length from a
        # precomputed per-text cap (max over 'ori' + both augs, covering
        # any strong pick), and picks the same bucket with no collective.
        self._global = None
        if world > 1 and getattr(collator, "buckets", None) \
                and len(collator.buckets) > 1:
            self._global = (
                batched(self._global_stream(len(self.lb), seed, world),
                        batch_size * world),
                batched(self._global_stream(len(self.ulb), seed + 1, world),
                        ulb_batch_size * world),
                self._text_maxlens(self.lb),
                self._text_maxlens(self.ulb),
            )

    @staticmethod
    def _global_stream(n, seed, world):
        g = np.random.RandomState(seed)
        stop = n - (n % world)
        while True:
            perm = g.permutation(n)
            for i in range(stop):
                yield perm[i]

    def _text_maxlens(self, ds) -> np.ndarray:
        tl = self.col.token_len
        if getattr(ds, "augs", None):
            return np.asarray([max(tl(t), max(tl(a) for a in augs))
                               for t, augs in zip(ds.texts, ds.augs)],
                              np.int32)
        return np.asarray([tl(t) for t in ds.texts], np.int32)

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
        if hasattr(self.col, "collate_views"):
            length = None
            if self._global is not None:
                glb, gulb, lens_lb, lens_ulb = self._global
                cap = max(int(lens_lb[next(glb)].max()),
                          int(lens_ulb[next(gulb)].max()))
                length = self.col.bucket_for(cap)
            out.update(self.col.collate_views(self.lb, self.ulb, li, ui,
                                              self.keys, self._rs,
                                              length=length))
            return out
        # collators without joint bucketing (BioCollator): per-view pad
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
