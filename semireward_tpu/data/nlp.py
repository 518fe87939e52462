"""NLP datasets + tokenizing collator.

Rebuild of reference semilearn/datasets/nlp_datasets/{json_data.py,
datasetbase.py} and collactors/nlp_collactor.py:
- JSON splits ``{train,dev,test}.json`` where each unlabeled sample carries
  pre-computed back-translation augmentations ('ori', 'aug_0', 'aug_1'); the
  strong view picks one at random (datasetbase.py:48-60).
- the collator tokenizes on the fly; jit needs static shapes, so instead of
  dynamic padding we pad to the fixed ``max_length`` bucket (reference caps
  at 512, train.py:199) — same content, one compiled shape.

Tokenizer: a HuggingFace tokenizer loaded from a LOCAL vocab when available
(zero-egress environment); otherwise a deterministic hash tokenizer keeps
the pipeline runnable for tests/synthetic runs (documented fallback).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from semireward_tpu.data.datasets import SSLDataBundle
from semireward_tpu.data.split import split_ssl_data


@dataclass
class TextDataset:
    texts: List[str]              # 'ori'
    augs: Optional[List[List[str]]]  # [aug_0, aug_1] per sample (ulb only)
    targets: np.ndarray

    # ArrayDataset-compatible surface
    @property
    def data(self):
        return np.asarray(self.texts, dtype=object)

    def __len__(self):
        return len(self.texts)


def load_json_dataset(data_dir: str, name: str):
    """reference nlp_datasets/json_data.py:96-165."""
    base = os.path.join(data_dir, name)
    out = {}
    for split in ("train", "dev", "test"):
        path = os.path.join(base, f"{split}.json")
        with open(path) as f:
            d = json.load(f)
        texts, augs, ys = [], [], []
        for k, v in d.items():
            if isinstance(v, dict):
                texts.append(v.get("ori", v.get("text", "")))
                augs.append([v.get("aug_0", texts[-1]),
                             v.get("aug_1", texts[-1])])
                ys.append(int(v.get("label", 0)))
        out[split] = TextDataset(texts, augs, np.asarray(ys, np.int64))
    return out


class HashTokenizer:
    """Deterministic fallback tokenizer (whitespace + stable hashing into
    the BERT vocab range). NOT wordpiece — only for environments without a
    local vocab file; real runs load the HF tokenizer below."""

    cls_id, sep_id, pad_id = 101, 102, 0

    def __init__(self, vocab_size: int = 30522):
        self.vocab_size = vocab_size

    def encode(self, text: str, max_length: int) -> np.ndarray:
        import hashlib

        ids = [self.cls_id]
        for tok in text.lower().split()[: max_length - 2]:
            h = int(hashlib.md5(tok.encode()).hexdigest(), 16)
            ids.append(1000 + h % (self.vocab_size - 1100))
        ids.append(self.sep_id)
        out = np.full(max_length, self.pad_id, np.int32)
        out[: len(ids)] = ids[:max_length]
        return out


def get_tokenizer(net_name: str, vocab_dir: Optional[str] = None):
    """reference collactors/nlp_collactor.py builds a HF AutoTokenizer; we
    load from a local path (offline) and fall back to HashTokenizer."""
    try:
        from transformers import AutoTokenizer

        path = vocab_dir or net_name.replace("_", "-")
        tok = AutoTokenizer.from_pretrained(path, local_files_only=True)

        class _Wrap:
            def encode(self, text, max_length):
                e = tok(text, max_length=max_length, padding="max_length",
                        truncation=True)
                return np.asarray(e["input_ids"], np.int32)

        return _Wrap()
    except Exception:
        return HashTokenizer()


class NLPCollator:
    """Emits the reference's x_lb/x_ulb_w/x_ulb_s dict shape with
    {input_ids, attention_mask} values (nlp_collactor.py:49-126), padded to
    the static max_length bucket."""

    def __init__(self, tokenizer, max_length: int = 512):
        self.tok = tokenizer
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> Dict[str, np.ndarray]:
        ids = np.stack([self.tok.encode(t, self.max_length) for t in texts])
        return {"input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int32)}

    def views(self, ds: TextDataset, idx: np.ndarray, rng: np.random.RandomState,
              strong: bool):
        """weak = 'ori'; strong = random pick of the back-translations
        (reference nlp datasetbase.py:48-60)."""
        if not strong or ds.augs is None:
            return self([ds.texts[i] for i in idx])
        picks = []
        for i in idx:
            a = ds.augs[i]
            picks.append(a[rng.randint(len(a))])
        return self(picks)


def get_nlp_dataset(cfg, alg: str = "fixmatch"):
    """Dataset factory for aclImdb / ag_news / amazon_review / yahoo_answers /
    yelp_review / dbpedia JSON layouts."""
    splits = load_json_dataset(cfg.data_dir, cfg.dataset)
    train = splits["train"]
    rng = np.random.RandomState(cfg.seed)
    lb_idx, ulb_idx = [], []
    from semireward_tpu.data.split import sample_labeled_unlabeled_data

    lb_i, ulb_i = sample_labeled_unlabeled_data(
        train.targets, cfg.num_classes, cfg.num_labels,
        ulb_num_labels=cfg.ulb_num_labels, rng=rng)
    if cfg.include_lb_to_ulb:
        ulb_i = np.concatenate([lb_i, ulb_i])

    def sub(ds, idx):
        return TextDataset([ds.texts[i] for i in idx],
                           [ds.augs[i] for i in idx] if ds.augs else None,
                           ds.targets[idx])

    return {
        "train_lb": sub(train, lb_i),
        "train_ulb": sub(train, ulb_i),
        "eval": splits["dev"],
        "test": splits["test"],
    }
