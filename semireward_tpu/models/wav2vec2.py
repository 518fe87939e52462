"""wav2vec2-base classifier (reference semilearn/nets/wave2vecv2/
wave2vecv2.py:149-205). For classification inference/fine-tuning the
wav2vec2-base body is architecturally identical to HuBERT-base (same conv
feature extractor, feature projection, conv positional embedding, 12-layer
post-LN encoder); the quantizer modules never run in the reference's
classification path, so one shared implementation serves both.
"""
from __future__ import annotations

import jax.numpy as jnp

from semireward_tpu.models.hubert import (
    ClassificationAudioTransformer, _layer_id)


def wave2vecv2_base(num_classes: int, dtype=jnp.bfloat16, **kw):
    fields = {k: v for k, v in kw.items()
              if k in ("hidden", "layers", "heads", "use_fused_mlp",
                       "remat_attn", "use_flash", "fused_mesh")}
    if "num_layers" in kw:
        fields["layers"] = kw["num_layers"]
    return ClassificationAudioTransformer(num_classes=num_classes, dtype=dtype,
                                          **fields)


wave2vecv2_base.layer_id_fn = _layer_id
wave2vecv2_base.num_layers = 13
