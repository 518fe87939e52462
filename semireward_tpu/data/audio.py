"""Audio datasets + on-device waveform augmentation.

Rebuild of reference semilearn/datasets/audio_datasets/{pkl_data.py,
datasetbase.py} and collactors/audio_collactor.py:
- pickle-per-split loaders ({train,dev,test}.pkl of (wav, label))
- weak view = random subsample crop to ``max_length_seconds`` (reference
  datasetbase.py:177-230)
- strong view = the reference's sox chain (gain / pitch / speed / reverb,
  datasetbase.py:231-301) re-expressed as vectorized jnp ops: gain is exact;
  speed/pitch are linear-interp resampling (sox uses higher-order kernels —
  documented approximation); reverb is a decaying comb echo.
- collator pads/crops to the static ``max_length_seconds * sample_rate``
  bucket so jit sees one shape.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class AudioDataset:
    waves: List[np.ndarray]
    targets: np.ndarray

    @property
    def data(self):
        return self.waves

    def __len__(self):
        return len(self.waves)


def load_pkl_dataset(data_dir: str, name: str):
    """reference audio_datasets/pkl_data.py."""
    base = os.path.join(data_dir, name)
    out = {}
    for split in ("train", "dev", "test"):
        with open(os.path.join(base, f"{split}.pkl"), "rb") as f:
            d = pickle.load(f)
        waves = [np.asarray(w, np.float32) for w, _ in d]
        ys = np.asarray([y for _, y in d], np.int64)
        out[split] = AudioDataset(waves, ys)
    return out


class AudioCollator:
    """Fixed-bucket batching: random-crop (train) / center-crop (eval) to
    max_length samples, zero-pad shorter clips; emits float32 [B, T]
    (reference audio_collactor.py:45-124 pads to max_length_seconds*sr)."""

    def __init__(self, max_length_seconds: float = 4.0,
                 sample_rate: int = 16000):
        self.T = int(max_length_seconds * sample_rate)

    def __call__(self, waves, rng: Optional[np.random.RandomState] = None):
        starts = np.zeros(len(waves), np.int64)
        if rng is not None:
            for i, w in enumerate(waves):
                if len(w) > self.T:
                    starts[i] = rng.randint(0, len(w) - self.T + 1)
        from semireward_tpu.data import _native
        return _native.crop_pad_f32(waves, starts, self.T)


# ---------------------------------------------------------------------------
# on-device waveform transforms (strong view)
# ---------------------------------------------------------------------------

def _resample_linear(x, rate):
    """Per-sample linear-interp resample of [T] by `rate`, same length out
    (content plays faster for rate>1, zero-padded tail)."""
    T = x.shape[0]
    pos = jnp.arange(T, dtype=jnp.float32) * rate
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = pos - lo.astype(jnp.float32)
    y = x[lo] * (1 - frac) + x[hi] * frac
    return jnp.where(pos < T - 1, y, 0.0)


def strong_augment_wave(rng, batch):
    """Reference WaveformTransforms: random gain in +-6 dB, speed in
    [0.5, 1.5], pitch shift +-3 semitones (approximated by resample), light
    echo for reverb (datasetbase.py:231-301)."""
    B, T = batch.shape
    keys = jax.random.split(rng, 5)
    gain_db = jax.random.uniform(keys[0], (B, 1), minval=-6.0, maxval=6.0)
    x = batch * (10.0 ** (gain_db / 20.0))

    speed = jax.random.uniform(keys[1], (B,), minval=0.5, maxval=1.5)
    x = jax.vmap(_resample_linear)(x, speed)

    semis = jax.random.randint(keys[2], (B,), -3, 4).astype(jnp.float32)
    pitch_rate = 2.0 ** (semis / 12.0)
    x = jax.vmap(_resample_linear)(x, pitch_rate)

    # echo: x + a * delay(x, d)
    a = jax.random.uniform(keys[3], (B, 1), minval=0.1, maxval=0.3)
    d = 800  # ~50ms at 16k
    x = x + a * jnp.pad(x, ((0, 0), (d, 0)))[:, :T]
    return x


def weak_augment_wave(rng, batch, orig_lens=None):
    """Weak = the random subsample crop already applied by the collator;
    on-device leg is identity (kept for pipeline symmetry)."""
    return batch


def get_audio_dataset(cfg, alg: str = "fixmatch"):
    splits = load_pkl_dataset(cfg.data_dir, cfg.dataset)
    train = splits["train"]
    rng = np.random.RandomState(cfg.seed)
    from semireward_tpu.data.split import sample_labeled_unlabeled_data

    lb_i, ulb_i = sample_labeled_unlabeled_data(
        train.targets, cfg.num_classes, cfg.num_labels,
        ulb_num_labels=cfg.ulb_num_labels, rng=rng)
    if cfg.include_lb_to_ulb:
        ulb_i = np.concatenate([lb_i, ulb_i])

    def sub(ds, idx):
        return AudioDataset([ds.waves[i] for i in idx], ds.targets[idx])

    return {"train_lb": sub(train, lb_i), "train_ulb": sub(train, ulb_i),
            "eval": splits["dev"], "test": splits["test"]}
