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


@dataclass
class DNADataset:
    seqs: List[str]
    targets: np.ndarray
    k: int = 6
    max_length: int = 512

    @property
    def data(self):
        return np.asarray(self.seqs, dtype=object)

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
