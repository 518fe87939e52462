"""Vision Transformer in flax.linen.

TPU-native rebuild of reference semilearn/nets/vit/vit.py:13-408 (timm-style
ViT: patch-embed conv, cls token, learned pos-embed, pre-norm blocks,
stochastic depth, token pooling, {'logits','feat'} contract).

TPU notes:
- attention is a fused einsum chain in ``dtype`` (bf16) — at USB sequence
  lengths (257 tokens for 32px/patch2, 197 for 224px/patch16) XLA fuses this
  onto the MXU without a custom kernel; a Pallas flash-attention path can be
  swapped in via ``semireward_tpu.ops.attention`` for long-seq configs.
- params stay float32; LayerNorm accumulates in float32.
- init matches the reference module defaults: zero pos_embed/cls_token (the
  reference applies *no* custom init — torch module defaults), so pretrained
  import is bit-compatible.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from semireward_tpu.models.initializers import DenseParams as _DenseParams
from semireward_tpu.models.initializers import torch_kernel_init as torch_default_init
from semireward_tpu.models.initializers import torch_bias_init


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth per sample (timm DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = jnp.bfloat16
    use_fused: bool = False
    fused_mesh: Any = None  # pure-dp mesh -> shard_map'd kernel

    @nn.compact
    def __call__(self, x, train: bool):
        if self.use_fused and not (train and self.drop > 0):
            # ONE pallas launch keeps the [rows, hidden] activation in VMEM
            # (ops/fused_mlp.py); param tree identical to the Dense path
            from semireward_tpu.ops.fused_mlp import (fused_mlp,
                                                      fused_mlp_sharded)
            w1, b1 = _DenseParams(x.shape[-1], self.hidden, name="fc1")()
            w2, b2 = _DenseParams(self.hidden, self.out, name="fc2")()
            if self.fused_mesh is not None:
                return fused_mlp_sharded(x.astype(self.dtype), w1, b1, w2,
                                         b2, mesh=self.fused_mesh)
            return fused_mlp(x.astype(self.dtype), w1, b1, w2, b2)
        dense = lambda f, name: nn.Dense(
            f, kernel_init=torch_default_init, bias_init=torch_bias_init,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        x = dense(self.hidden, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = dense(self.out, "fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class Attention(nn.Module):
    """Reference vit.py:78-107 — vanilla softmax attention."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.bfloat16
    use_flash: bool = False
    remat_attn: bool = True
    split_qkv: bool = False
    fused_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        if self.split_qkv:
            # tensor-parallel variant: three separate projections named
            # q/k/v so the Megatron column sharding (parallel/mesh.py) can
            # split each one head-aligned. Sharding the FUSED [C,3C] kernel
            # instead makes GSPMD all-gather the whole qkv activation per
            # layer to fix up the misaligned thirds (measured: 8x
            # f32[B,257,C] all-gathers per 2-layer step on a (4,2) mesh) —
            # so TP configs should set net_kwargs['split_qkv']=True. Math
            # identical to the fused projection (x @ W[:, i*C:(i+1)*C]);
            # single-chip default stays fused (one bigger MXU matmul).
            # Head alignment: the model-axis size must divide num_heads,
            # or the [B,N,C]->[B,N,H,hd] reshape re-introduces the gather.
            dense = lambda name: nn.Dense(
                C, use_bias=self.qkv_bias, kernel_init=torch_default_init,
                bias_init=torch_bias_init, dtype=self.dtype,
                param_dtype=jnp.float32, name=name)
            q = dense("q")(x).reshape(B, N, H, hd)
            k = dense("k")(x).reshape(B, N, H, hd)
            v = dense("v")(x).reshape(B, N, H, hd)
        else:
            qkv = nn.Dense(3 * C, use_bias=self.qkv_bias,
                           kernel_init=torch_default_init,
                           bias_init=torch_bias_init,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="qkv")(x)
            # split on the LAST axis (contiguous thirds of the fused
            # projection, identical elements to reshape(B,N,3,H,hd)[:,:,i])
            # — the 5-d reshape forces XLA to materialize a layout copy of
            # the whole qkv tensor per layer (bf16[B,N,3,H,hd]
            # {1,4,3,2,0}->{1,4,3,0,2}, ~0.4 ms/step on the headline
            # bench); contiguous slices + 4-d reshapes are bitcasts
            q, k, v = (t.reshape(B, N, H, hd)
                       for t in jnp.split(qkv, 3, axis=-1))  # [B,N,H,hd]
        if self.use_flash and not (train and self.attn_drop > 0):
            # Pallas flash attention (ops/attention.py), forward AND custom-
            # VJP backward — O(N*d) HBM traffic. Opt-in: at USB sequence
            # lengths (<=512) XLA's fused einsum wins (fewer kernel
            # launches); flash pays off for long-sequence stretch configs.
            # Pure-dp meshes keep the kernel via the shard_map'd wrapper
            # (pallas_call has no GSPMD partitioning rule).
            from semireward_tpu.ops.attention import flash_fn
            out = flash_fn(self.fused_mesh)(q, k, v)
        elif self.remat_attn and not (train and self.attn_drop > 0):
            # rematerialized einsum attention: without it autodiff stores the
            # f32 [B,H,N,N] softmax probs of every layer for the backward
            # (456 MB/step on the headline bench — the largest HBM residual
            # in the whole program, seen as per-layer copy-start/done pairs
            # in the trace); recomputing them in bwd costs one extra QK^T
            # einsum per layer (~0.04 ms total), bit-identical grads.
            dt = self.dtype

            def _attn(q, k, v):
                a = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                               preferred_element_type=jnp.float32) * (hd ** -0.5)
                a = jax.nn.softmax(a, axis=-1)
                return jnp.einsum("bhnm,bmhd->bnhd", a.astype(dt), v,
                                  preferred_element_type=jnp.float32)

            out = jax.checkpoint(_attn)(q, k, v)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                              preferred_element_type=jnp.float32) * (hd ** -0.5)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop, deterministic=not train)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(B, N, C).astype(self.dtype)
        out = nn.Dense(C, kernel_init=torch_default_init,
                       bias_init=torch_bias_init, dtype=self.dtype,
                       param_dtype=jnp.float32, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    dtype: Any = jnp.bfloat16
    use_flash: bool = False
    remat_attn: bool = True
    remat_mlp: bool = False
    split_qkv: bool = False
    use_fused_mlp: bool = False
    fused_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                       param_dtype=jnp.float32, name=name)
        mlp_cls = Mlp
        if self.remat_mlp and not (train and self.drop > 0):
            # recompute the [B,N,4C] fc1+gelu hidden in the backward instead
            # of holding it fwd->bwd (the largest bf16 residual, 18.9 MB/layer
            # at the headline geometry). Grads bit-identical. Measured SLOWER
            # there (64.3 vs 66.2 steps/s — recompute > traffic saved), so
            # opt-in: it pays off only when activation memory binds (large
            # batch/seq configs).
            mlp_cls = nn.remat(Mlp, static_argnums=(2,))
        h = Attention(self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
                      self.drop, dtype=self.dtype,
                      use_flash=self.use_flash, remat_attn=self.remat_attn,
                      split_qkv=self.split_qkv, fused_mesh=self.fused_mesh,
                      name="attn")(
            ln("norm1")(x).astype(self.dtype), train)
        if self.init_values:
            gamma1 = self.param("ls1", nn.initializers.constant(self.init_values),
                                (self.dim,), jnp.float32)
            h = h * gamma1
        rng = self.make_rng("dropout") if (train and self.drop_path > 0) else None
        x = x + _drop_path(h.astype(x.dtype), self.drop_path, not train, rng)
        h = mlp_cls(int(self.dim * self.mlp_ratio), self.dim, self.drop,
                    dtype=self.dtype, use_fused=self.use_fused_mlp,
                    fused_mesh=self.fused_mesh,
                    name="mlp")(
            ln("norm2")(x).astype(self.dtype), train)
        if self.init_values:
            gamma2 = self.param("ls2", nn.initializers.constant(self.init_values),
                                (self.dim,), jnp.float32)
            h = h * gamma2
        rng = self.make_rng("dropout") if (train and self.drop_path > 0) else None
        x = x + _drop_path(h.astype(x.dtype), self.drop_path, not train, rng)
        return x


class VisionTransformer(nn.Module):
    """Reference vit.py:169-320. Input NHWC float."""

    num_classes: int
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    global_pool: str = "token"
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    dtype: Any = jnp.bfloat16
    remat: bool = False  # jax.checkpoint each block (HBM <-> recompute)
    use_flash: bool = False  # Pallas flash attention (long-seq configs)
    remat_attn: bool = True  # recompute attn probs in bwd (saves f32 NxN residuals)
    remat_mlp: bool = False  # recompute the 4C mlp hidden in bwd — measured NEGATIVE
                             # at the headline geometry (64.3 vs 66.2 steps/s): the
                             # fc1+gelu recompute costs more than the 18.9 MB/layer
                             # residual saves; opt-in for memory-bound large configs
    split_qkv: bool = False  # separate q/k/v projections for tensor parallelism
                             # (head-aligned column sharding; see Attention docnote)
    use_fused_mlp: bool = False  # single-launch pallas MLP keeping the 4C hidden
    fused_mesh: Any = None        # pure-dp mesh: shard_map'd fused MLP
                                 # in VMEM (ops/fused_mlp.py); slightly different
                                 # (more precise) gelu numerics -> opt-in

    @property
    def num_features(self) -> int:
        return self.embed_dim

    @nn.compact
    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False):
        head = nn.Dense(self.num_classes, kernel_init=torch_default_init,
                        bias_init=torch_bias_init, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")
        if only_fc:
            return head(x)

        B = x.shape[0]
        p = self.patch_size
        grid = self.img_size // p
        num_patches = grid * grid

        # patch embed: conv stride=patch (reference vit.py:33-44)
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    kernel_init=torch_default_init, bias_init=torch_bias_init,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(self.dtype))
        x = x.reshape(B, num_patches, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", nn.initializers.zeros,
                               (1, num_patches + 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, self.embed_dim)), x],
            axis=1)
        x = x + pos_embed.astype(self.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        # stochastic-depth decay rule (static python floats, jit-safe)
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1)
               for i in range(self.depth)]
        block_cls = (nn.remat(Block, static_argnums=(2,))
                     if self.remat else Block)
        for i in range(self.depth):
            x = block_cls(self.embed_dim, self.num_heads, self.mlp_ratio,
                          self.qkv_bias, self.drop_rate, self.attn_drop_rate,
                          dpr[i], self.init_values, dtype=self.dtype,
                          use_flash=self.use_flash,
                          remat_attn=self.remat_attn,
                          remat_mlp=self.remat_mlp,
                          split_qkv=self.split_qkv,
                          use_fused_mlp=self.use_fused_mlp,
                          fused_mesh=self.fused_mesh,
                          name=f"blocks{i}")(x, train)

        use_fc_norm = self.global_pool == "avg"
        if not use_fc_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="norm")(x)
        if self.global_pool:
            x = x[:, 1:].mean(axis=1) if self.global_pool == "avg" else x[:, 0]
        if use_fc_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             param_dtype=jnp.float32, name="fc_norm")(x)
        feat = x.astype(jnp.float32)
        if only_feat:
            return feat
        return {"logits": head(feat), "feat": feat}


def _layer_id(names: Sequence[str], num_layers: int) -> int:
    """group_matcher equivalent (reference vit.py:307-317): embeds = layer 0,
    block i = layer i+1, norm/head = last."""
    if not names:
        return num_layers
    head = names[0]
    if head in ("cls_token", "pos_embed", "patch_embed"):
        return 0
    if head.startswith("blocks"):
        return int(head[len("blocks"):]) + 1
    return num_layers


def _builder(name, **cfg):
    def build(num_classes: int, dtype=jnp.bfloat16, **kw) -> VisionTransformer:
        merged = dict(cfg)
        merged.update({k: v for k, v in kw.items()
                       if k in VisionTransformer.__annotations__})
        return VisionTransformer(num_classes=num_classes, dtype=dtype, **merged)

    build.__name__ = name
    build.layer_id_fn = _layer_id
    build.num_layers = cfg.get("depth", 12) + 1
    return build


# reference vit.py:323-408
vit_tiny_patch2_32 = _builder("vit_tiny_patch2_32", img_size=32, patch_size=2,
                              embed_dim=192, depth=12, num_heads=3,
                              drop_path_rate=0.1)
vit_small_patch2_32 = _builder("vit_small_patch2_32", img_size=32, patch_size=2,
                               embed_dim=384, depth=12, num_heads=6,
                               drop_path_rate=0.2)
vit_small_patch16_224 = _builder("vit_small_patch16_224", img_size=224,
                                 patch_size=16, embed_dim=384, depth=12,
                                 num_heads=6, drop_path_rate=0.2)
vit_base_patch16_96 = _builder("vit_base_patch16_96", img_size=96,
                               patch_size=16, embed_dim=768, depth=12,
                               num_heads=12, drop_path_rate=0.2)
vit_base_patch16_224 = _builder("vit_base_patch16_224", img_size=224,
                                patch_size=16, embed_dim=768, depth=12,
                                num_heads=12, drop_path_rate=0.2)
