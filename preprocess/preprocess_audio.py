#!/usr/bin/env python
"""Audio dataset preprocessing -> pkl splits.

Rebuild of reference preprocess/preprocess_urbansound.py /
preprocess_superb.py: raw audio collections (UrbanSound8K fold layout,
ESC-50 folds, SUPERB keyword spotting) resampled to 16 kHz and pickled as
{train,dev,test}.pkl lists of (waveform_float32, label) — the layout
data/audio.py loads. librosa is used when available; scipy.io.wavfile
fallback covers plain wav trees.

Usage:
  python preprocess/preprocess_audio.py --dataset urbansound8k \
      --raw ./raw_data/UrbanSound8K --out ./data/urbansound8k
"""
from __future__ import annotations

import argparse
import csv
import os
import pickle


def load_wave(path: str, sr: int = 16000):
    try:
        import librosa

        wav, _ = librosa.load(path, sr=sr, mono=True)
        return wav.astype("float32")
    except ImportError:
        from scipy.io import wavfile
        import numpy as np

        rate, wav = wavfile.read(path)
        wav = wav.astype("float32")
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if wav.dtype.kind == "i":
            wav = wav / 32768.0
        if rate != sr:  # naive linear resample
            n = int(len(wav) * sr / rate)
            wav = np.interp(np.linspace(0, len(wav) - 1, n),
                            np.arange(len(wav)), wav).astype("float32")
        return wav


def urbansound(raw: str, out: str, sr: int):
    """folds 1-8 train, 9 dev, 10 test (reference convention)."""
    rows = {"train": [], "dev": [], "test": []}
    with open(os.path.join(raw, "metadata", "UrbanSound8K.csv")) as f:
        for r in csv.DictReader(f):
            fold = int(r["fold"])
            split = "train" if fold <= 8 else ("dev" if fold == 9 else "test")
            path = os.path.join(raw, "audio", f"fold{fold}",
                                r["slice_file_name"])
            rows[split].append((load_wave(path, sr), int(r["classID"])))
    dump(rows, out)


def esc50(raw: str, out: str, sr: int):
    """folds 1-3 train, 4 dev, 5 test (reference preprocess header)."""
    rows = {"train": [], "dev": [], "test": []}
    with open(os.path.join(raw, "meta", "esc50.csv")) as f:
        for r in csv.DictReader(f):
            fold = int(r["fold"])
            split = "train" if fold <= 3 else ("dev" if fold == 4 else "test")
            path = os.path.join(raw, "audio", r["filename"])
            rows[split].append((load_wave(path, sr), int(r["target"])))
    dump(rows, out)


def dump(rows, out):
    os.makedirs(out, exist_ok=True)
    for split, data in rows.items():
        with open(os.path.join(out, f"{split}.pkl"), "wb") as f:
            pickle.dump(data, f, protocol=4)
        print(f"{split}: {len(data)} clips")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["urbansound8k", "esc50"],
                   required=True)
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--sample_rate", type=int, default=16000)
    a = p.parse_args()
    {"urbansound8k": urbansound, "esc50": esc50}[a.dataset](
        a.raw, a.out, a.sample_rate)


if __name__ == "__main__":
    main()
