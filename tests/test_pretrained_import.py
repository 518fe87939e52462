"""Pretrained checkpoint import paths (reference nets/utils.py:18-73):
torch .pth -> flax param graft, incl. pos-embed bicubic resize. Uses a
synthetic torch state_dict (no network in this environment)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semireward_tpu.registry import NETS


def _fake_timm_vit_sd(embed_dim=192, depth=12, num_heads=3, patch=2,
                      grid=8, num_classes=10, seed=0):
    """timm-style ViT state_dict with torch layouts ([out,in] linears,
    [D,C,k,k] conv), pos_embed grid `grid`x`grid`."""
    rs = np.random.RandomState(seed)
    sd = {
        "pos_embed": rs.randn(1, grid * grid + 1, embed_dim).astype(np.float32),
        "cls_token": rs.randn(1, 1, embed_dim).astype(np.float32),
        "patch_embed.proj.weight": rs.randn(embed_dim, 3, patch, patch
                                            ).astype(np.float32),
        "patch_embed.proj.bias": rs.randn(embed_dim).astype(np.float32),
        "norm.weight": np.ones(embed_dim, np.float32),
        "norm.bias": np.zeros(embed_dim, np.float32),
        "head.weight": rs.randn(num_classes, embed_dim).astype(np.float32),
        "head.bias": np.zeros(num_classes, np.float32),
    }
    mlp = embed_dim * 4
    for i in range(depth):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(embed_dim, np.float32)
        sd[b + "norm1.bias"] = np.zeros(embed_dim, np.float32)
        sd[b + "norm2.weight"] = np.ones(embed_dim, np.float32)
        sd[b + "norm2.bias"] = np.zeros(embed_dim, np.float32)
        sd[b + "attn.qkv.weight"] = rs.randn(3 * embed_dim, embed_dim
                                             ).astype(np.float32)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * embed_dim, np.float32)
        sd[b + "attn.proj.weight"] = rs.randn(embed_dim, embed_dim
                                              ).astype(np.float32)
        sd[b + "attn.proj.bias"] = np.zeros(embed_dim, np.float32)
        sd[b + "mlp.fc1.weight"] = rs.randn(mlp, embed_dim).astype(np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros(mlp, np.float32)
        sd[b + "mlp.fc2.weight"] = rs.randn(embed_dim, mlp).astype(np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros(embed_dim, np.float32)
    return sd


class TestViTImport:
    def test_graft_and_pos_embed_resize(self, tmp_path):
        import torch
        from semireward_tpu.models.utils import load_vit_checkpoint

        model = NETS.get("vit_tiny_patch2_32")(num_classes=10)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 32, 32, 3)), train=False)["params"]
        # source grid 8x8 (e.g. a patch16/128 checkpoint) -> target 16x16:
        # exercises the bicubic pos-embed resize (reference nets/utils.py:53-73)
        sd = _fake_timm_vit_sd(grid=8)
        path = tmp_path / "vit.pth"
        torch.save({"model": {("module." + k): torch.tensor(v)
                              for k, v in sd.items()}}, str(path))

        new = load_vit_checkpoint(params, str(path))
        # torch linear [out,in] -> flax [in,out]
        np.testing.assert_allclose(
            np.asarray(new["blocks0"]["attn"]["qkv"]["kernel"]),
            sd["blocks.0.attn.qkv.weight"].T, rtol=1e-6)
        # conv [D,C,k,k] -> [k,k,C,D]
        np.testing.assert_allclose(
            np.asarray(new["patch_embed"]["kernel"]),
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
        # pos embed resized to target token count, cls token kept verbatim
        assert new["pos_embed"].shape == params["pos_embed"].shape
        np.testing.assert_allclose(np.asarray(new["pos_embed"])[0, 0],
                                   sd["pos_embed"][0, 0], rtol=1e-6)
        # head skipped: stays at init
        np.testing.assert_allclose(np.asarray(new["head"]["kernel"]),
                                   np.asarray(params["head"]["kernel"]))
        # grafted model runs and differs from init
        x = jnp.ones((2, 32, 32, 3))
        out_init = model.apply({"params": params}, x, train=False)["logits"]
        out_new = model.apply({"params": new}, x, train=False)["logits"]
        assert not np.allclose(np.asarray(out_init), np.asarray(out_new))

    def test_graft_onto_split_qkv_tree(self, tmp_path):
        """The tensor-parallel split_qkv=True tree imports the SAME fused
        torch checkpoint: the [3C, C] qkv weight splits into contiguous
        thirds, and the grafted model's forward matches the fused graft
        exactly (x @ W[:, iC:(i+1)C] == (x @ W)[:, iC:(i+1)C])."""
        import torch
        from semireward_tpu.models.utils import load_vit_checkpoint

        sd = _fake_timm_vit_sd(grid=16)
        path = tmp_path / "vit.pth"
        torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}},
                   str(path))

        fused = NETS.get("vit_tiny_patch2_32")(num_classes=10,
                                               dtype=jnp.float32)
        split = NETS.get("vit_tiny_patch2_32")(num_classes=10,
                                               dtype=jnp.float32,
                                               split_qkv=True)
        x = jnp.ones((1, 32, 32, 3))
        pf = load_vit_checkpoint(
            fused.init(jax.random.PRNGKey(0), x, train=False)["params"],
            str(path))
        ps = load_vit_checkpoint(
            split.init(jax.random.PRNGKey(0), x, train=False)["params"],
            str(path))
        C = pf["blocks0"]["attn"]["qkv"]["kernel"].shape[0]
        for j, nm in enumerate(("q", "k", "v")):
            np.testing.assert_allclose(
                np.asarray(ps["blocks0"]["attn"][nm]["kernel"]),
                np.asarray(pf["blocks0"]["attn"]["qkv"]["kernel"])[:, j * C:(j + 1) * C],
                rtol=1e-6)
        of = fused.apply({"params": pf}, x, train=False)["logits"]
        os_ = split.apply({"params": ps}, x, train=False)["logits"]
        np.testing.assert_allclose(np.asarray(os_), np.asarray(of),
                                   rtol=1e-5, atol=1e-5)


class TestBertImport:
    def test_hf_state_dict_graft(self):
        from semireward_tpu.models.bert import load_hf_bert_weights
        from semireward_tpu.registry import NETS

        model = NETS.get("bert_base_uncased")(num_classes=2)
        ids = jnp.ones((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0),
                            {"input_ids": ids, "attention_mask": ids},
                            train=False)["params"]
        rs = np.random.RandomState(0)

        def rand_like(arr, transpose=False):
            a = np.asarray(arr)
            shape = a.shape[::-1] if transpose else a.shape
            return rs.randn(*shape).astype(np.float32)

        # full fake HF BertModel state dict, shapes mirrored from our tree
        # (torch linear weights are [out,in] -> stored transposed)
        sd = {
            "embeddings.word_embeddings.weight":
                rand_like(params["word_embeddings"]["embedding"]),
            "embeddings.position_embeddings.weight":
                rand_like(params["position_embeddings"]),
            "embeddings.token_type_embeddings.weight":
                rand_like(params["token_type_embeddings"]),
            "embeddings.LayerNorm.weight":
                rand_like(params["embeddings_ln"]["scale"]),
            "embeddings.LayerNorm.bias":
                rand_like(params["embeddings_ln"]["bias"]),
        }
        n_layers = sum(1 for k in params if str(k).startswith("layer"))
        for i in range(n_layers):
            lp = params[f"layer{i}"]
            src = f"encoder.layer.{i}."
            for name, hf in (("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value"),
                             ("output", "attention.output.dense")):
                sd[src + hf + ".weight"] = rand_like(
                    lp["attention"][name]["kernel"], transpose=True)
                sd[src + hf + ".bias"] = rand_like(
                    lp["attention"][name]["bias"])
            sd[src + "attention.output.LayerNorm.weight"] = rand_like(
                lp["attention_ln"]["scale"])
            sd[src + "attention.output.LayerNorm.bias"] = rand_like(
                lp["attention_ln"]["bias"])
            sd[src + "intermediate.dense.weight"] = rand_like(
                lp["intermediate"]["kernel"], transpose=True)
            sd[src + "intermediate.dense.bias"] = rand_like(
                lp["intermediate"]["bias"])
            sd[src + "output.dense.weight"] = rand_like(
                lp["output"]["kernel"], transpose=True)
            sd[src + "output.dense.bias"] = rand_like(lp["output"]["bias"])
            sd[src + "output.LayerNorm.weight"] = rand_like(
                lp["output_ln"]["scale"])
            sd[src + "output.LayerNorm.bias"] = rand_like(
                lp["output_ln"]["bias"])

        new = load_hf_bert_weights(params, sd)
        np.testing.assert_allclose(
            np.asarray(new["word_embeddings"]["embedding"]),
            sd["embeddings.word_embeddings.weight"], rtol=1e-6)
        # linear transposed correctly
        np.testing.assert_allclose(
            np.asarray(new["layer0"]["intermediate"]["kernel"]),
            sd["encoder.layer.0.intermediate.dense.weight"].T, rtol=1e-6)
        # grafted model runs and differs from init
        batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
        o0 = model.apply({"params": params}, batch, train=False)["logits"]
        o1 = model.apply({"params": new}, batch, train=False)["logits"]
        assert not np.allclose(np.asarray(o0), np.asarray(o1))
