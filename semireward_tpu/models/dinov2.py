"""DINOv2 backbones (reference semilearn/nets/vit/dinov2.py:7-64 — a
torch.hub wrapper around facebookresearch/dinov2).

TPU-native equivalent: the DINOv2 ViT-B/14 and ViT-L/14 geometries on our
VisionTransformer (patch 14, LayerScale init 1e-5, no class-token pooling
difference), with weights importable from a locally downloaded torch
checkpoint via models.utils.load_vit_checkpoint. torch.hub downloads are
impossible in a zero-egress environment — pass ``pretrain_path``.
"""
from __future__ import annotations

import jax.numpy as jnp

from semireward_tpu.models.vit import VisionTransformer, _layer_id


def _build(name, embed_dim, depth, num_heads):
    def build(num_classes: int, dtype=jnp.bfloat16, img_size: int = 224, **kw):
        size = (img_size // 14) * 14
        # forward recognized ViT flags (use_fused_mlp / use_flash / remat /
        # split_qkv, plus test-geometry overrides) like vit._builder does —
        # the Trainer's single-chip fused-MLP auto-default rides this
        fixed = ("num_classes", "img_size", "patch_size", "embed_dim",
                 "depth", "num_heads", "init_values", "dtype")
        extra = {k: v for k, v in kw.items()
                 if k in VisionTransformer.__annotations__ and k not in fixed}
        return VisionTransformer(
            num_classes=num_classes, img_size=size or 224, patch_size=14,
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            init_values=1e-5, dtype=dtype, **extra)

    build.__name__ = name
    build.layer_id_fn = _layer_id
    build.num_layers = depth + 1
    return build


dinov2_vitb14 = _build("dinov2_vitb14", 768, 12, 12)
dinov2_vitl14 = _build("dinov2_vitl14", 1024, 24, 16)
