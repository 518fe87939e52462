"""HuBERT-base / wav2vec2-base audio classifiers in flax.linen.

Rebuild of reference semilearn/nets/hubert/hubert.py:10-62 and
wave2vecv2/wave2vecv2.py (HF HubertModel / Wav2Vec2Model + dropout +
mean-pool + 2-layer GELU head; feature extractor frozen). The encoder here
is the shared wav2vec2/HuBERT-base geometry implemented from scratch:

- conv feature extractor: 7 temporal convs (512ch; k/s = 10/5, 3/2 x4,
  2/2 x2), group-norm on the first layer, GELU; gradients STOPPED through it
  (the reference sets feature_extractor._requires_grad=False, hubert.py:15)
- feature projection: LayerNorm -> Linear 512->768 -> dropout
- convolutional relative positional embedding (k=128, groups=16) + post-LN
  transformer encoder, 12 layers, 768 hidden, 12 heads

``load_hf_audio_weights`` grafts a HF state_dict for pretrained runs.

TPU notes: raw waveforms arrive as fixed-length [B, max_len_s*sr] float
buckets (reference audio collator pads to exactly that,
collactors/audio_collactor.py:45-124), so all shapes are static; the conv
stack and attention run in bf16 on the MXU.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from semireward_tpu.models.initializers import DenseParams, torch_bias_init

w_init = nn.initializers.normal(0.02)

_CONVS = [(512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
          (512, 2, 2), (512, 2, 2)]


class FeatureExtractor(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: [B, T]
        h = x[..., None].astype(self.dtype)  # [B, T, 1]
        for i, (ch, k, s) in enumerate(_CONVS):
            h = nn.Conv(ch, (k,), strides=(s,), padding="VALID",
                        use_bias=False, kernel_init=w_init,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=512, epsilon=1e-5,
                                 dtype=jnp.float32, param_dtype=jnp.float32,
                                 name="gn0")(h.astype(jnp.float32)
                                             ).astype(self.dtype)
            h = nn.gelu(h, approximate=False)
        return h  # [B, T', 512]


class EncoderLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    dtype: Any = jnp.bfloat16
    use_fused: bool = False
    remat_attn: bool = True
    use_flash: bool = False
    fused_mesh: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        H, hd = self.heads, self.hidden // self.heads
        B, L, _ = x.shape
        dense = lambda n: nn.Dense(self.hidden, kernel_init=w_init,
                                   bias_init=torch_bias_init,
                                   dtype=self.dtype, param_dtype=jnp.float32,
                                   name=n)
        q = dense("q")(x).reshape(B, L, H, hd)
        k = dense("k")(x).reshape(B, L, H, hd)
        v = dense("v")(x).reshape(B, L, H, hd)
        if self.use_flash and (train or L >= 128):
            # blockwise pallas attention (ops/attention.py); in training
            # the p=0.1 prob dropout runs in-kernel via a counter-hash
            # mask regenerated in the backward (documented RNG-stream
            # deviation, DEVIATIONS.md). Pure-dp meshes keep the kernel
            # via the shard_map'd wrapper (pallas_call has no GSPMD rule).
            from semireward_tpu.ops.attention import flash_fn
            flash = flash_fn(self.fused_mesh)
            if train:
                key = self.make_rng("dropout")
                seed = jax.random.randint(key, (1, 1),
                                          0, jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
                o = flash(q, k, v, dropout_rate=0.1, dropout_seed=seed)
            else:
                o = flash(q, k, v)
        elif train and self.remat_attn:
            # remat with in-checkpoint dropout (see models/bert.py
            # BertSelfAttention): avoids storing the f32 probs + mask
            # residuals per layer for the backward
            dt = self.dtype
            scale = hd ** -0.5
            key = self.make_rng("dropout")

            def _attn(q, k, v, key):
                a = jnp.einsum("blhd,bmhd->bhlm", q, k,
                               preferred_element_type=jnp.float32) * scale
                a = jax.nn.softmax(a, axis=-1)
                m = jax.random.bernoulli(key, 0.9, a.shape)
                a = jnp.where(m, a / 0.9, 0.0)
                return jnp.einsum("bhlm,bmhd->blhd", a.astype(dt), v,
                                  preferred_element_type=jnp.float32)

            o = jax.checkpoint(_attn)(q, k, v, key)
        else:
            att = jnp.einsum("blhd,bmhd->bhlm", q, k,
                             preferred_element_type=jnp.float32) * (hd ** -0.5)
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(0.1, deterministic=not train)(att)
            o = jnp.einsum("bhlm,bmhd->blhd", att.astype(self.dtype), v,
                           preferred_element_type=jnp.float32)
        o = dense("out")(o.reshape(B, L, self.hidden).astype(self.dtype))
        o = nn.Dropout(0.1, deterministic=not train)(o)
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name=n)
        x = ln("ln1")((x + o).astype(jnp.float32)).astype(self.dtype)
        if self.use_fused:
            # dropout sits AFTER ff2, so the hidden-blocked pallas MLP
            # (ops/fused_mlp.py) applies in training too; param tree
            # identical to the Dense pair
            from semireward_tpu.ops.fused_mlp import (fused_mlp,
                                                      fused_mlp_sharded)
            w1, b1 = DenseParams(self.hidden, self.intermediate,
                                 kernel_init=w_init, name="ff1")()
            w2, b2 = DenseParams(self.intermediate, self.hidden,
                                 kernel_init=w_init, name="ff2")()
            if self.fused_mesh is not None:
                m = fused_mlp_sharded(x.astype(self.dtype), w1, b1, w2, b2,
                                      mesh=self.fused_mesh)
            else:
                m = fused_mlp(x.astype(self.dtype), w1, b1, w2, b2)
        else:
            m = nn.Dense(self.intermediate, kernel_init=w_init,
                         bias_init=torch_bias_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ff1")(x)
            m = nn.gelu(m, approximate=False)
            m = nn.Dense(self.hidden, kernel_init=w_init,
                         bias_init=torch_bias_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="ff2")(m)
        m = nn.Dropout(0.1, deterministic=not train)(m)
        return ln("ln2")((x + m).astype(jnp.float32)).astype(self.dtype)


class ClassificationAudioTransformer(nn.Module):
    """Shared HuBERT/wav2vec2-base classifier body."""

    num_classes: int
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    dtype: Any = jnp.bfloat16
    use_fused_mlp: bool = False
    remat_attn: bool = True
    use_flash: bool = False
    fused_mesh: Any = None

    @property
    def num_features(self) -> int:
        return self.hidden

    @nn.compact
    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False):
        def head(feat):
            h = nn.Dense(self.hidden, kernel_init=w_init,
                         bias_init=torch_bias_init, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="classifier_fc1")(feat)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.num_classes, kernel_init=w_init,
                            bias_init=torch_bias_init, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="classifier_fc2")(h)

        if only_fc:
            return head(x)

        if isinstance(x, dict):
            x = x.get("input_values", x)
        # frozen feature extractor (hubert.py:15)
        feats = jax.lax.stop_gradient(
            FeatureExtractor(dtype=self.dtype, name="feature_extractor")(x))
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="fp_ln")(
            feats.astype(jnp.float32))
        h = nn.Dense(self.hidden, kernel_init=w_init,
                     bias_init=torch_bias_init, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fp_proj")(
            h.astype(self.dtype))
        h = nn.Dropout(0.1, deterministic=not train)(h)

        # conv positional embedding (k=128, groups=16) + residual
        pos = nn.Conv(self.hidden, (128,), padding=[(64, 64)],
                      feature_group_count=16, kernel_init=w_init,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="pos_conv")(h)
        pos = nn.gelu(pos[:, : h.shape[1]], approximate=False)
        h = h + pos
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="encoder_ln")(
            h.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dropout(0.1, deterministic=not train)(h)

        for i in range(self.layers):
            h = EncoderLayer(self.hidden, self.heads, dtype=self.dtype,
                             use_fused=self.use_fused_mlp,
                             remat_attn=self.remat_attn,
                             use_flash=self.use_flash,
                             fused_mesh=self.fused_mesh,
                             name=f"layer{i}")(h, train)
        last = h.astype(jnp.float32)
        drop = nn.Dropout(0.1, deterministic=not train)(last)
        feat = jnp.mean(drop, axis=1)
        if only_feat:
            return feat
        return {"logits": head(feat), "feat": feat}


def _layer_id(names, num_layers):
    head = names[0] if names else ""
    if head in ("feature_extractor", "fp_ln", "fp_proj", "pos_conv",
                "encoder_ln"):
        return 0
    if head.startswith("layer"):
        try:
            return int(head[5:]) + 1
        except ValueError:
            return num_layers
    return num_layers


def hubert_base(num_classes: int, dtype=jnp.bfloat16, **kw):
    fields = {k: v for k, v in kw.items()
              if k in ("hidden", "layers", "heads", "use_fused_mlp",
                       "remat_attn", "use_flash", "fused_mesh")}
    if "num_layers" in kw:
        fields["layers"] = kw["num_layers"]
    return ClassificationAudioTransformer(num_classes=num_classes, dtype=dtype,
                                          **fields)


hubert_base.layer_id_fn = _layer_id
hubert_base.num_layers = 13


def load_hf_audio_weights(params, state_dict):
    """Graft a HuggingFace HubertModel / Wav2Vec2Model state_dict
    (numpy-convertible values) onto this module's param tree — the
    pretrained-weights path of reference hubert.py:10-21 /
    wave2vecv2.py:149-160 (`HubertModel.from_pretrained`). Torch conv
    weights are [out, in/groups, k] -> flax [k, in/groups, out]; linear
    weights [out, in] -> [in, out]. The positional conv is weight-normed
    in HF — both storage formats (legacy ``weight_g``/``weight_v`` and
    torch>=2 ``parametrizations.weight.original0/1``) are recomposed."""
    import numpy as np

    p = jax.tree_util.tree_map(np.asarray, params)

    def put(path, val, t=None):
        node = p
        for k in path[:-1]:
            node = node[k]
        val = np.asarray(val, np.float32)
        if t is not None:
            val = val.transpose(t)
        assert node[path[-1]].shape == val.shape, (
            path, node[path[-1]].shape, val.shape)
        node[path[-1]] = val

    sd = {}
    for k, v in state_dict.items():
        stripped = True
        while stripped:  # wrapper ckpts can nest, e.g. 'model.hubert.'
            stripped = False
            for pre in ("hubert.", "wav2vec2.", "model."):
                if k.startswith(pre):
                    k = k[len(pre):]
                    stripped = True
        sd[k] = np.asarray(v)

    for i in range(len(_CONVS)):
        put(("feature_extractor", f"conv{i}", "kernel"),
            sd[f"feature_extractor.conv_layers.{i}.conv.weight"], (2, 1, 0))
    put(("feature_extractor", "gn0", "scale"),
        sd["feature_extractor.conv_layers.0.layer_norm.weight"])
    put(("feature_extractor", "gn0", "bias"),
        sd["feature_extractor.conv_layers.0.layer_norm.bias"])
    put(("fp_ln", "scale"), sd["feature_projection.layer_norm.weight"])
    put(("fp_ln", "bias"), sd["feature_projection.layer_norm.bias"])
    put(("fp_proj", "kernel"), sd["feature_projection.projection.weight"],
        (1, 0))
    put(("fp_proj", "bias"), sd["feature_projection.projection.bias"])

    pc = "encoder.pos_conv_embed.conv."
    if pc + "weight_g" in sd:                      # legacy weight_norm keys
        g, v = sd[pc + "weight_g"], sd[pc + "weight_v"]
    else:                                          # torch>=2 parametrization
        g = sd[pc + "parametrizations.weight.original0"]
        v = sd[pc + "parametrizations.weight.original1"]
    # torch weight_norm(conv, dim=2): w = v * g / ||v|| per kernel slice
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1),
                                                   keepdims=True))
    w = (v * (g / norm)).astype(np.float32)        # [out, in/groups, k]
    put(("pos_conv", "kernel"), w, (2, 1, 0))
    put(("pos_conv", "bias"), sd[pc + "bias"])
    put(("encoder_ln", "scale"), sd["encoder.layer_norm.weight"])
    put(("encoder_ln", "bias"), sd["encoder.layer_norm.bias"])

    n_layers = sum(1 for k in p if k.startswith("layer")
                   and k[5:].isdigit())
    for i in range(n_layers):
        src = f"encoder.layers.{i}."
        dst = f"layer{i}"
        for ours, hf in (("q", "attention.q_proj"), ("k", "attention.k_proj"),
                         ("v", "attention.v_proj"),
                         ("out", "attention.out_proj"),
                         ("ff1", "feed_forward.intermediate_dense"),
                         ("ff2", "feed_forward.output_dense")):
            put((dst, ours, "kernel"), sd[src + hf + ".weight"], (1, 0))
            put((dst, ours, "bias"), sd[src + hf + ".bias"])
        put((dst, "ln1", "scale"), sd[src + "layer_norm.weight"])
        put((dst, "ln1", "bias"), sd[src + "layer_norm.bias"])
        put((dst, "ln2", "scale"), sd[src + "final_layer_norm.weight"])
        put((dst, "ln2", "bias"), sd[src + "final_layer_norm.bias"])
    return jax.tree_util.tree_map(jnp.asarray, p)
