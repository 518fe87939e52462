"""BERT-base classifier in flax.linen.

Rebuild of reference semilearn/nets/bert/bert.py:9-73: HF BertModel +
dropout(0.1) + mean-pool over tokens + 2-layer GELU head; ``return_embed``
exposes the embedding-layer output for VAT's perturbation
(vat/vat.py:54-58). The encoder here is a from-scratch post-LN BERT
(bert-base geometry: 12 layers, 768 hidden, 12 heads, GELU, LN eps 1e-12);
``load_hf_bert_weights`` grafts a HuggingFace torch state_dict onto the
param tree for pretrained runs (no torch needed at train time).

TPU notes: one fused attention einsum chain per layer in bf16; sequences pad
to the static ``max_length`` bucket (reference caps at 512, train.py:199) so
jit sees one shape; masking is additive -inf bias.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from semireward_tpu.models.initializers import DenseParams, torch_bias_init

bert_init = nn.initializers.normal(0.02)


class BertSelfAttention(nn.Module):
    hidden: int
    heads: int
    dtype: Any = jnp.bfloat16
    remat_attn: bool = True
    use_flash: bool = False
    fused_mesh: Any = None

    @nn.compact
    def __call__(self, x, attn_bias, train: bool):
        H, hd = self.heads, self.hidden // self.heads
        B, L, _ = x.shape
        dense = lambda n: nn.Dense(self.hidden, kernel_init=bert_init,
                                   bias_init=torch_bias_init, dtype=self.dtype,
                                   param_dtype=jnp.float32, name=n)
        q = dense("query")(x).reshape(B, L, H, hd)
        k = dense("key")(x).reshape(B, L, H, hd)
        v = dense("value")(x).reshape(B, L, H, hd)
        # the kernel handles the key-only padding bias [B,1,1,L] in-block,
        # and (with use_flash) applies the p=0.1 prob dropout in-kernel via
        # a counter-based hash mask regenerated in the backward — see
        # ops/attention.py module docstring (documented RNG-stream
        # deviation, DEVIATIONS.md). Under any mesh the shard_map'd
        # wrapper keeps the pallas kernel out of GSPMD's hands (pallas_call
        # has no partitioning rule and would all-gather its operands):
        # data-like meshes (pure-dp / data×fsdp) shard the batch, 'model'
        # (TP) meshes additionally shard the head dim — see
        # ops/attention.py:flash_attention_sharded.
        from semireward_tpu.ops.attention import flash_fn
        flash = flash_fn(self.fused_mesh)
        if not train:
            if self.use_flash:
                out = flash(q, k, v, bias=attn_bias)
            else:
                # default eval: plain XLA einsum, exactly as before round 3
                att = jnp.einsum("blhd,bmhd->bhlm", q, k,
                                 preferred_element_type=jnp.float32
                                 ) * (hd ** -0.5)
                att = jax.nn.softmax(att + attn_bias, axis=-1)
                out = jnp.einsum("bhlm,bmhd->blhd", att.astype(self.dtype), v,
                                 preferred_element_type=jnp.float32)
        elif self.use_flash:
            key = self.make_rng("dropout")
            seed = jax.random.randint(key, (1, 1), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            out = flash(q, k, v, bias=attn_bias, dropout_rate=0.1,
                        dropout_seed=seed)
        elif self.remat_attn:
            # rematerialized attention WITH dropout: unlike ViT (whose
            # attn_drop is 0 in every reference config) BERT always trains
            # with p=0.1 on the probs, so the ViT-style remat guard would
            # never engage; instead the dropout mask is regenerated inside
            # the checkpoint from an explicit key (same bernoulli call as
            # nn.Dropout -> bit-identical masks and grads). Without this,
            # autodiff stores f32 probs + bf16 dropped-probs + the bool
            # mask per layer (~300 MB/layer at L=512) for the backward.
            dt = self.dtype
            scale = hd ** -0.5
            key = self.make_rng("dropout")

            def _attn(q, k, v, bias, key):
                a = jnp.einsum("blhd,bmhd->bhlm", q, k,
                               preferred_element_type=jnp.float32) * scale
                a = jax.nn.softmax(a + bias, axis=-1)
                m = jax.random.bernoulli(key, 0.9, a.shape)
                a = jnp.where(m, a / 0.9, 0.0)
                return jnp.einsum("bhlm,bmhd->blhd", a.astype(dt), v,
                                  preferred_element_type=jnp.float32)

            out = jax.checkpoint(_attn)(q, k, v, attn_bias, key)
        else:
            att = jnp.einsum("blhd,bmhd->bhlm", q, k,
                             preferred_element_type=jnp.float32) * (hd ** -0.5)
            att = att + attn_bias
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(0.1, deterministic=not train)(att)
            out = jnp.einsum("bhlm,bmhd->blhd", att.astype(self.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(B, L, self.hidden).astype(self.dtype)
        return dense("output")(out)


class BertLayer(nn.Module):
    hidden: int
    heads: int
    intermediate: int
    dtype: Any = jnp.bfloat16
    use_fused: bool = False
    remat_attn: bool = True
    use_flash: bool = False
    fused_mesh: Any = None

    @nn.compact
    def __call__(self, x, attn_bias, train: bool):
        ln = lambda n: nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name=n)
        h = BertSelfAttention(self.hidden, self.heads, dtype=self.dtype,
                              remat_attn=self.remat_attn,
                              use_flash=self.use_flash,
                              fused_mesh=self.fused_mesh,
                              name="attention")(x, attn_bias, train)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        x = ln("attention_ln")((x + h).astype(jnp.float32)).astype(self.dtype)
        if self.use_fused:
            # dropout sits AFTER fc2, so the hidden-blocked pallas MLP
            # (ops/fused_mlp.py) applies in training too; param tree
            # identical to the Dense pair
            from semireward_tpu.ops.fused_mlp import (fused_mlp,
                                                      fused_mlp_sharded)
            w1, b1 = DenseParams(self.hidden, self.intermediate,
                                 kernel_init=bert_init,
                                 name="intermediate")()
            w2, b2 = DenseParams(self.intermediate, self.hidden,
                                 kernel_init=bert_init, name="output")()
            if self.fused_mesh is not None:
                m = fused_mlp_sharded(x.astype(self.dtype), w1, b1, w2, b2,
                                      mesh=self.fused_mesh)
            else:
                m = fused_mlp(x.astype(self.dtype), w1, b1, w2, b2)
        else:
            m = nn.Dense(self.intermediate, kernel_init=bert_init,
                         bias_init=torch_bias_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="intermediate")(x)
            m = nn.gelu(m, approximate=False)
            m = nn.Dense(self.hidden, kernel_init=bert_init,
                         bias_init=torch_bias_init, dtype=self.dtype,
                         param_dtype=jnp.float32, name="output")(m)
        m = nn.Dropout(0.1, deterministic=not train)(m)
        return ln("output_ln")((x + m).astype(jnp.float32)).astype(self.dtype)


class ClassificationBert(nn.Module):
    """Forward contract per reference bert.py:22-48: x is a dict with
    input_ids [B,L] and attention_mask [B,L]."""

    num_classes: int
    vocab_size: int = 30522       # bert-base-uncased; cased = 28996
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
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
                 only_feat: bool = False, return_embed: bool = False,
                 inputs_embeds: Optional[jnp.ndarray] = None):
        def head(feat):
            h = nn.Dense(self.hidden, kernel_init=bert_init,
                         bias_init=torch_bias_init, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="classifier_fc1")(feat)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(self.num_classes, kernel_init=bert_init,
                            bias_init=torch_bias_init, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="classifier_fc2")(h)

        if only_fc:
            return head(x)

        ids = x["input_ids"]
        mask = x.get("attention_mask")
        B, L = ids.shape
        if mask is None:
            mask = jnp.ones((B, L), jnp.int32)

        if inputs_embeds is None and "inputs_embeds" in x:
            inputs_embeds = x["inputs_embeds"]
        word = nn.Embed(self.vocab_size, self.hidden, embedding_init=bert_init,
                        param_dtype=jnp.float32, name="word_embeddings")
        pos = self.param("position_embeddings", bert_init,
                         (self.max_position, self.hidden), jnp.float32)
        tok = self.param("token_type_embeddings", bert_init,
                         (self.type_vocab, self.hidden), jnp.float32)
        # HF semantics: inputs_embeds substitutes the WORD embeddings only;
        # position/type embeddings and the LayerNorm still apply (this is
        # what makes the reference's VAT-embed path re-embed hidden_states[0],
        # vat.py:85-89 — quirk reproduced)
        base = word(ids) if inputs_embeds is None else inputs_embeds
        emb = base + pos[None, :L] + tok[0][None, None]
        emb = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="embeddings_ln")(emb)
        embed_out = emb  # hidden_states[0] for VAT (bert.py:45-46)
        h = nn.Dropout(0.1, deterministic=not train)(emb).astype(self.dtype)

        attn_bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9
                              ).astype(jnp.float32)
        for i in range(self.layers):
            h = BertLayer(self.hidden, self.heads, self.intermediate,
                          dtype=self.dtype, use_fused=self.use_fused_mlp,
                          remat_attn=self.remat_attn,
                          use_flash=self.use_flash,
                          fused_mesh=self.fused_mesh,
                          name=f"layer{i}")(h, attn_bias, train)
        last_hidden = h.astype(jnp.float32)
        drop = nn.Dropout(0.1, deterministic=not train)(last_hidden)
        # reference mean-pools over ALL positions including padding
        # (bert.py:36-37: torch.mean(drop_hidden, 1))
        feat = jnp.mean(drop, axis=1)

        if only_feat:
            return feat
        out = {"logits": head(feat), "feat": feat}
        if return_embed:
            out["embed"] = embed_out
        return out


def _layer_id(names, num_layers):
    head = names[0] if names else ""
    if "embedding" in head or head == "embeddings_ln":
        return 0
    if head.startswith("layer"):
        try:
            return int(head[5:]) + 1
        except ValueError:
            return num_layers
    return num_layers


_BERT_FIELDS = ("hidden", "layers", "heads", "intermediate", "max_position",
                "use_fused_mlp", "remat_attn", "use_flash", "fused_mesh")


def bert_base_uncased(num_classes: int, dtype=jnp.bfloat16, **kw):
    fields = {k: v for k, v in kw.items() if k in _BERT_FIELDS}
    return ClassificationBert(num_classes=num_classes, vocab_size=30522,
                              dtype=dtype, **fields)


def bert_base_cased(num_classes: int, dtype=jnp.bfloat16, **kw):
    fields = {k: v for k, v in kw.items() if k in _BERT_FIELDS}
    return ClassificationBert(num_classes=num_classes, vocab_size=28996,
                              dtype=dtype, **fields)


for _b in (bert_base_uncased, bert_base_cased):
    _b.layer_id_fn = _layer_id
    _b.num_layers = 13


def load_hf_bert_weights(params, state_dict: Dict[str, Any]):
    """Graft a HuggingFace BertModel state_dict (numpy-convertible values)
    onto this module's param tree. Torch linear weights are [out,in] ->
    transposed to flax [in,out]."""
    import numpy as np

    p = jax.tree_util.tree_map(np.asarray, params)

    def put(path, val, transpose=False):
        node = p
        for k in path[:-1]:
            node = node[k]
        val = np.asarray(val)
        if transpose:
            val = val.T
        assert node[path[-1]].shape == val.shape, (path, node[path[-1]].shape, val.shape)
        node[path[-1]] = val.astype(np.float32)

    sd = {k.replace("bert.", "", 1): np.asarray(v)
          for k, v in state_dict.items()}
    put(("word_embeddings", "embedding"), sd["embeddings.word_embeddings.weight"])
    put(("position_embeddings",), sd["embeddings.position_embeddings.weight"])
    put(("token_type_embeddings",), sd["embeddings.token_type_embeddings.weight"])
    put(("embeddings_ln", "scale"), sd["embeddings.LayerNorm.weight"])
    put(("embeddings_ln", "bias"), sd["embeddings.LayerNorm.bias"])
    n_layers = sum(1 for k in p if k.startswith("layer"))
    for i in range(n_layers):
        src = f"encoder.layer.{i}."
        dst = f"layer{i}"
        for name, hf in (("query", "attention.self.query"),
                         ("key", "attention.self.key"),
                         ("value", "attention.self.value"),
                         ("output", "attention.output.dense")):
            put((dst, "attention", name, "kernel"), sd[src + hf + ".weight"], True)
            put((dst, "attention", name, "bias"), sd[src + hf + ".bias"])
        put((dst, "attention_ln", "scale"), sd[src + "attention.output.LayerNorm.weight"])
        put((dst, "attention_ln", "bias"), sd[src + "attention.output.LayerNorm.bias"])
        put((dst, "intermediate", "kernel"), sd[src + "intermediate.dense.weight"], True)
        put((dst, "intermediate", "bias"), sd[src + "intermediate.dense.bias"])
        put((dst, "output", "kernel"), sd[src + "output.dense.weight"], True)
        put((dst, "output", "bias"), sd[src + "output.dense.bias"])
        put((dst, "output_ln", "scale"), sd[src + "output.LayerNorm.weight"])
        put((dst, "output_ln", "bias"), sd[src + "output.LayerNorm.bias"])
    return jax.tree_util.tree_map(jnp.asarray, p)
