"""Bio/DNA dataset: CSV + k-mer tokenization for DNABERT.

Rebuild of reference semilearn/datasets/bio_datasets/csv_data.py:14-148:
CSV rows of (sequence, label); sequences split into overlapping k-mers that
a DNABERT-style vocab maps to ids. Without the HF DNABERT vocab on disk the
k-mers map through a closed-form 4^k index (A/C/G/T), which is exactly the
DNABERT vocab ordering offset by the special tokens.
"""
from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import List

import numpy as np

_BASE = {"A": 0, "C": 1, "G": 2, "T": 3}


def seq_to_kmers(seq: str, k: int = 6) -> List[str]:
    seq = seq.upper()
    return [seq[i:i + k] for i in range(len(seq) - k + 1)]


def kmer_to_id(kmer: str, k: int = 6, num_special: int = 5) -> int:
    """Closed-form DNABERT vocab index: specials then lexicographic 4^k."""
    idx = 0
    for ch in kmer:
        if ch not in _BASE:
            return 4  # [UNK]-ish
        idx = idx * 4 + _BASE[ch]
    return num_special + idx


def complement(seq: str) -> str:
    """Base-complement of a DNA sequence (reference csv_data.py:14-18
    get_alter_of_dna_sequence — complement without reversal). Used as the
    strong view: label-preserving, content-changing."""
    m = {"A": "T", "T": "A", "C": "G", "G": "C"}
    return "".join(m.get(c, c) for c in seq.upper())


@dataclass
class DNADataset:
    seqs: List[str]
    targets: np.ndarray
    k: int = 6
    max_length: int = 512

    @property
    def data(self):
        return np.asarray(self.seqs, dtype=object)

    @property
    def texts(self):
        """NLP-pipeline-compatible surface (Trainer eval batches)."""
        return self.seqs

    def __len__(self):
        return len(self.seqs)

    def encode(self, idx: int) -> np.ndarray:
        cls_id, sep_id, pad_id = 2, 3, 0  # DNABERT special ids
        kmers = seq_to_kmers(self.seqs[idx], self.k)[: self.max_length - 2]
        ids = [cls_id] + [kmer_to_id(m, self.k) for m in kmers] + [sep_id]
        out = np.full(self.max_length, pad_id, np.int32)
        out[: len(ids)] = ids
        return out


def load_csv_dataset(data_dir: str, name: str, k: int = 6,
                     max_length: int = 512):
    base = os.path.join(data_dir, name)
    out = {}
    for split in ("train", "dev", "test"):
        path = os.path.join(base, f"{split}.csv")
        seqs, ys = [], []
        with open(path) as f:
            for row in csv.reader(f):
                if len(row) < 2 or row[0] in ("sequence", "seq"):
                    continue
                seqs.append(row[0])
                ys.append(int(row[1]))
        out[split] = DNADataset(seqs, np.asarray(ys, np.int64), k, max_length)
    return out


class BioCollator:
    """k-mer tokenizing collator for DNABERT nets. Same interface as
    NLPCollator (__call__ + views) so the NLP loader/eval paths drive it
    unchanged: weak view = the sequence itself, strong view = its base
    complement (reference csv_data.py:14-18; the bio BasicDataset has no
    back-translation augs to pick from)."""

    def __init__(self, k: int = 6, max_length: int = 512):
        self.k = k
        self.max_length = max_length

    def _encode(self, seq: str) -> np.ndarray:
        cls_id, sep_id, pad_id = 2, 3, 0
        kmers = seq_to_kmers(seq, self.k)[: self.max_length - 2]
        ids = [cls_id] + [kmer_to_id(m, self.k) for m in kmers] + [sep_id]
        out = np.full(self.max_length, pad_id, np.int32)
        out[: len(ids)] = ids
        return out

    def __call__(self, seqs) -> dict:
        ids = np.stack([self._encode(s) for s in seqs])
        return {"input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int32)}

    def views(self, ds, idx: np.ndarray, rng: np.random.RandomState,
              strong: bool) -> dict:
        seqs = [ds.seqs[i] for i in idx]
        if strong:
            seqs = [complement(s) for s in seqs]
        return self(seqs)


def get_bio_dataset(cfg, alg: str = "fixmatch"):
    """Dataset factory wiring CSV/k-mer data into training (the reference
    builds this dataset, csv_data.py:73-148, but never dispatches it from
    get_dataset — fixed here so a dnabert run works end-to-end)."""
    from semireward_tpu.data.split import sample_labeled_unlabeled_data

    k = int(cfg.extra.get("kmer", 6))
    splits = load_csv_dataset(cfg.data_dir, cfg.dataset, k=k,
                              max_length=cfg.max_length)
    train = splits["train"]
    rng = np.random.RandomState(cfg.seed)
    lb_i, ulb_i = sample_labeled_unlabeled_data(
        train.targets, cfg.num_classes, cfg.num_labels,
        ulb_num_labels=cfg.ulb_num_labels, rng=rng)
    if cfg.include_lb_to_ulb:
        ulb_i = np.concatenate([lb_i, ulb_i])

    def sub(idx):
        return DNADataset([train.seqs[i] for i in idx], train.targets[idx],
                          k, cfg.max_length)

    return {"train_lb": sub(lb_i), "train_ulb": sub(ulb_i),
            "eval": splits["dev"], "test": splits["test"]}
