"""HF-auto style transformer builders (reference semilearn/nets/huggingface/
transformer.py:4-53 — generic tokenizer/model builders + dnabert_2_117m).

DNABERT-2-117M geometry on our from-scratch encoder: 12 layers, 768 hidden,
12 heads, 4^6-kmer vocab (4101 with specials). Weights import via
models.bert.load_hf_bert_weights from a locally downloaded checkpoint.
"""
from __future__ import annotations

import jax.numpy as jnp

from semireward_tpu.models.bert import ClassificationBert, _layer_id


def dnabert_2_117m(num_classes: int, dtype=jnp.bfloat16, **kw):
    geo = {k: kw[k] for k in ("hidden", "layers", "heads", "intermediate",
                              "max_position") if k in kw}
    return ClassificationBert(num_classes=num_classes, vocab_size=4101,
                              dtype=dtype, **geo)


def hf_text_classifier(num_classes: int, vocab_size: int = 30522,
                       hidden: int = 768, layers: int = 12, heads: int = 12,
                       dtype=jnp.bfloat16, **kw):
    """Generic builder mirroring the reference's get_(auto)model helpers."""
    return ClassificationBert(num_classes=num_classes, vocab_size=vocab_size,
                              hidden=hidden, layers=layers, heads=heads,
                              dtype=dtype)


for _b in (dnabert_2_117m, hf_text_classifier):
    _b.layer_id_fn = _layer_id
    _b.num_layers = 13
