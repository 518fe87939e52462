"""Pretrained checkpoint import utilities.

Rebuild of reference semilearn/nets/utils.py:18-73: load a torch checkpoint
(``{'model': state_dict}``), strip ``module.`` prefixes, skip classifier/head
keys, bicubic-resize the ViT pos_embed grid when geometry differs, and graft
onto a flax param tree. torch is used only to unpickle the .pth file —
nothing torch survives into the training path.
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def resize_pos_embed_vit(posemb: np.ndarray, new_len: int,
                         num_tokens: int = 1) -> np.ndarray:
    """reference nets/utils.py:53-73: bicubic grid resize, [1, N+1, D]."""
    posemb_tok = posemb[:, :num_tokens]
    posemb_grid = posemb[0, num_tokens:]
    gs_old = int(math.sqrt(len(posemb_grid)))
    gs_new = int(math.sqrt(new_len - num_tokens))
    if gs_old == gs_new:
        return posemb
    grid = posemb_grid.reshape(gs_old, gs_old, -1)
    resized = jax.image.resize(jnp.asarray(grid),
                               (gs_new, gs_new, grid.shape[-1]),
                               method="bicubic")
    resized = np.asarray(resized).reshape(1, gs_new * gs_new, -1)
    return np.concatenate([posemb_tok, resized], axis=1)


def _torch_state_dict(checkpoint_path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def load_vit_checkpoint(params, checkpoint_path: str,
                        skip_head: bool = True):
    """Graft a torch timm-style ViT state_dict (the reference's released
    pretrained .pth files) onto our VisionTransformer param tree."""
    sd = _torch_state_dict(checkpoint_path)
    p = jax.tree_util.tree_map(np.asarray, params)

    def set_(path, val, transpose=False):
        node = p
        for k in path[:-1]:
            node = node[k]
        val = np.asarray(val, np.float32)
        if transpose:
            val = val.T
        tgt = node[path[-1]]
        assert tgt.shape == val.shape, (path, tgt.shape, val.shape)
        node[path[-1]] = val

    if "pos_embed" in sd:
        set_(("pos_embed",),
             resize_pos_embed_vit(sd["pos_embed"], p["pos_embed"].shape[1]))
    if "cls_token" in sd:
        set_(("cls_token",), sd["cls_token"])
    if "patch_embed.proj.weight" in sd:
        # torch conv [D, C, k, k] -> flax [k, k, C, D]
        set_(("patch_embed", "kernel"),
             sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        set_(("patch_embed", "bias"), sd["patch_embed.proj.bias"])

    n_blocks = sum(1 for k in p if str(k).startswith("blocks"))
    for i in range(n_blocks):
        src = f"blocks.{i}."
        dst = f"blocks{i}"
        for ln in ("norm1", "norm2"):
            set_((dst, ln, "scale"), sd[src + ln + ".weight"])
            set_((dst, ln, "bias"), sd[src + ln + ".bias"])
        if "qkv" in p[dst]["attn"]:
            set_((dst, "attn", "qkv", "kernel"), sd[src + "attn.qkv.weight"],
                 True)
            if src + "attn.qkv.bias" in sd:
                set_((dst, "attn", "qkv", "bias"), sd[src + "attn.qkv.bias"])
        else:
            # split_qkv=True (tensor-parallel) tree: the torch fused qkv
            # weight is [3C, C] with contiguous thirds [q; k; v] — split it
            # onto the three separate projections (identical math)
            w3 = sd[src + "attn.qkv.weight"]
            C = w3.shape[0] // 3
            for j, nm in enumerate(("q", "k", "v")):
                set_((dst, "attn", nm, "kernel"), w3[j * C:(j + 1) * C], True)
                if src + "attn.qkv.bias" in sd:
                    set_((dst, "attn", nm, "bias"),
                         sd[src + "attn.qkv.bias"][j * C:(j + 1) * C])
        set_((dst, "attn", "proj", "kernel"), sd[src + "attn.proj.weight"], True)
        set_((dst, "attn", "proj", "bias"), sd[src + "attn.proj.bias"])
        set_((dst, "mlp", "fc1", "kernel"), sd[src + "mlp.fc1.weight"], True)
        set_((dst, "mlp", "fc1", "bias"), sd[src + "mlp.fc1.bias"])
        set_((dst, "mlp", "fc2", "kernel"), sd[src + "mlp.fc2.weight"], True)
        set_((dst, "mlp", "fc2", "bias"), sd[src + "mlp.fc2.bias"])
    if "norm.weight" in sd and "norm" in p:
        set_(("norm", "scale"), sd["norm.weight"])
        set_(("norm", "bias"), sd["norm.bias"])
    if not skip_head and "head.weight" in sd and "head" in p:
        set_(("head", "kernel"), sd["head.weight"], True)
        set_(("head", "bias"), sd["head.bias"])
    return jax.tree_util.tree_map(jnp.asarray, p)


def load_pretrained(model_name: str, params, checkpoint_path: str):
    """Dispatch by family (reference load_checkpoint is generic; ours keys on
    the builder name)."""
    if not checkpoint_path or not os.path.isfile(checkpoint_path):
        raise FileNotFoundError(
            f"pretrain_path '{checkpoint_path}' not found (no network in this "
            f"environment — place the released .pth locally)")
    if model_name.startswith(("vit", "dinov2")):
        return load_vit_checkpoint(params, checkpoint_path)
    if model_name.startswith("bert"):
        from semireward_tpu.models.bert import load_hf_bert_weights
        return load_hf_bert_weights(params, _torch_state_dict(checkpoint_path))
    if model_name.startswith(("hubert", "wave2vecv2")):
        from semireward_tpu.models.hubert import load_hf_audio_weights
        return load_hf_audio_weights(params,
                                     _torch_state_dict(checkpoint_path))
    raise NotImplementedError(
        f"pretrained import for '{model_name}' not wired yet")
