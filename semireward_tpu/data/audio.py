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
    """Reference WaveformTransforms (audio_datasets/datasetbase.py:12-39):
    draws per sample speed in [0.5, 2.0) (0.5 + 1.5*random()), pitch in
    [-2, 2) CENTS (sox `pitch` takes cents — a near-inaudible <0.2%
    rate factor, faithfully tiny), attenuation int in [-5, 5) dBFS —
    then applies **random.choices(k=2)** of the four sox effects
    {gain -n, pitch, speed, reverb -w} in draw order (with replacement;
    NOT all four), followed by `rate` back to sample_rate.

    On-device per-sample reproduction: two lax.switch slots over the
    four effect kernels. gain -n normalizes the peak to the drawn dBFS;
    pitch is a single resample at the cents factor (sox preserves
    duration; the <=0.12% duration error sits in the zero-padded buffer);
    speed is a single resample (the trailing `rate` restores the sample
    rate, leaving the 1/speed duration change, zero-padded/truncated to
    the fixed buffer); reverb -w (wet-only) is approximated by a decaying
    3-tap echo tail replacing the dry signal (documented approximation,
    DEVIATIONS.md #18 — sox's reverb is a dense Freeverb tail)."""
    B, T = batch.shape
    keys = jax.random.split(rng, 5)
    speed = jax.random.uniform(keys[0], (B,), minval=0.5, maxval=2.0)
    pitch_cents = jax.random.uniform(keys[1], (B,), minval=-2.0, maxval=2.0)
    atten_db = jax.random.randint(keys[2], (B,), -5, 5).astype(jnp.float32)
    choice = jax.random.randint(keys[3], (B, 2), 0, 4)

    def apply_one(x, c, sp, pc, att):
        return jax.lax.switch(
            c, (_sox_gain_n, _sox_pitch, _sox_speed, _sox_reverb_wet),
            x, sp, pc, att)

    def per_sample(x, c2, sp, pc, att):
        x = apply_one(x, c2[0], sp, pc, att)
        return apply_one(x, c2[1], sp, pc, att)

    return jax.vmap(per_sample)(batch, choice, speed, pitch_cents,
                                atten_db)


def _sox_gain_n(x, sp, pc, att):
    """`gain -n <att>`: normalize the peak to att dBFS."""
    peak = jnp.max(jnp.abs(x)) + 1e-9
    return x / peak * (10.0 ** (att / 20.0))


def _sox_pitch(x, sp, pc, att):
    """`pitch <cents>`: shift pitch by 2^(cents/1200). sox preserves
    duration via WSOLA; here a single playback-rate resample applies the
    same spectral shift with a <=0.12% duration error at the drawn +-2
    cents (absorbed by the fixed zero-padded buffer) — a resample-up-
    then-back pair would cancel to the identity and shift nothing
    (DEVIATIONS.md #18)."""
    r = 2.0 ** (pc / 1200.0)
    return _resample_linear(x, r)


def _sox_speed(x, sp, pc, att):
    """`speed <s>` + trailing `rate`: 1/s duration at the original
    sample rate (fixed buffer: zero-padded / truncated)."""
    return _resample_linear(x, sp)


def _sox_reverb_wet(x, sp, pc, att):
    """`reverb -w` (wet-only): the tail alone, no dry term — approximated
    by a decaying 3-tap echo (sox's is a dense Freeverb tail;
    DEVIATIONS.md #18)."""
    T = x.shape[0]
    d = 800  # ~50 ms at 16 kHz
    pad = jnp.pad(x, (d, 0))[:T]
    pad2 = jnp.pad(x, (2 * d, 0))[:T]
    pad3 = jnp.pad(x, (3 * d, 0))[:T]
    return 0.6 * pad + 0.36 * pad2 + 0.216 * pad3


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
