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


class TestGenuineHFForwardParity:
    """Forward parity against the GENUINE HuggingFace torch modules the
    reference wraps (nets/bert/bert.py:9-21 `BertModel.from_pretrained`,
    nets/hubert/hubert.py:10-15 `HubertModel.from_pretrained`): build the
    real HF model (random init — zero-egress env), graft its state_dict
    through our loaders, and require the encoders to agree numerically.
    This checks the ARCHITECTURE (LN placement/eps, embedding semantics,
    weight-norm pos-conv recomposition, padding handling), not just the
    graft mechanics."""

    def test_bert_encoder_matches_hf(self):
        import torch
        from transformers import BertConfig, BertModel
        from semireward_tpu.models.bert import (ClassificationBert,
                                                load_hf_bert_weights)

        cfg = BertConfig(vocab_size=200, hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=128,
                         max_position_embeddings=32, type_vocab_size=2,
                         hidden_act="gelu", layer_norm_eps=1e-12)
        torch.manual_seed(0)
        hf = BertModel(cfg).eval()

        ours = ClassificationBert(num_classes=2, vocab_size=200, hidden=64,
                                  layers=2, heads=4, intermediate=128,
                                  max_position=32, dtype=jnp.float32)
        rs = np.random.RandomState(0)
        ids = rs.randint(1, 200, (2, 24))
        mask = np.ones((2, 24), np.int64)
        mask[1, 15:] = 0
        batch = {"input_ids": jnp.asarray(ids, jnp.int32),
                 "attention_mask": jnp.asarray(mask, jnp.int32)}
        v = ours.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, batch, train=False)
        params = load_hf_bert_weights(
            v["params"], {k: t.detach().numpy()
                          for k, t in hf.state_dict().items()})
        feat = ours.apply({"params": params}, batch, train=False,
                          only_feat=True)
        with torch.no_grad():
            out = hf(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state
        # our feat mean-pools ALL positions incl. padding (the reference's
        # documented pooling quirk, DEVIATIONS #12)
        ref = out.mean(dim=1).numpy()
        np.testing.assert_allclose(np.asarray(feat), ref, rtol=1e-4,
                                   atol=2e-4)

    def test_hubert_encoder_matches_hf(self):
        import torch
        from transformers import HubertConfig, HubertModel
        from semireward_tpu.models.hubert import (
            ClassificationAudioTransformer, load_hf_audio_weights)

        cfg = HubertConfig(num_hidden_layers=2)
        torch.manual_seed(0)
        hf = HubertModel(cfg).eval()

        ours = ClassificationAudioTransformer(num_classes=2, layers=2,
                                              dtype=jnp.float32)
        wav = np.random.RandomState(0).randn(2, 4000).astype(np.float32) * 0.1
        v = ours.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      jnp.asarray(wav), train=False)
        params = load_hf_audio_weights(
            v["params"], {k: t.detach().numpy()
                          for k, t in hf.state_dict().items()})
        feat = ours.apply({"params": params}, jnp.asarray(wav), train=False,
                          only_feat=True)
        with torch.no_grad():
            ref = hf(torch.tensor(wav)).last_hidden_state.mean(dim=1).numpy()
        np.testing.assert_allclose(np.asarray(feat), ref, rtol=1e-3,
                                   atol=2e-3)

    def test_wav2vec2_encoder_matches_hf(self):
        """The reference's wav2vec2 path wraps Wav2Vec2Model
        (wave2vecv2.py:149-160); its classification forward is
        architecturally identical to HuBERT's, so one shared implementation
        serves both (models/wav2vec2.py) — proven here against the genuine
        HF module (whose extra quantizer/masked_spec_embed keys the graft
        must ignore)."""
        import torch
        from transformers import Wav2Vec2Config, Wav2Vec2Model
        from semireward_tpu.models.hubert import load_hf_audio_weights
        from semireward_tpu.registry import NETS
        import semireward_tpu  # noqa: F401

        cfg = Wav2Vec2Config(num_hidden_layers=1)
        torch.manual_seed(0)
        hf = Wav2Vec2Model(cfg).eval()

        ours = NETS.get("wave2vecv2_base")(num_classes=2, num_layers=1,
                                           dtype=jnp.float32)
        wav = np.random.RandomState(2).randn(1, 4000).astype(np.float32) * 0.1
        v = ours.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      jnp.asarray(wav), train=False)
        params = load_hf_audio_weights(
            v["params"], {k: t.detach().numpy()
                          for k, t in hf.state_dict().items()})
        feat = ours.apply({"params": params}, jnp.asarray(wav), train=False,
                          only_feat=True)
        with torch.no_grad():
            ref = hf(torch.tensor(wav)).last_hidden_state.mean(dim=1).numpy()
        np.testing.assert_allclose(np.asarray(feat), ref, rtol=1e-3,
                                   atol=2e-3)


class TestUsePretrainTrainerPath:
    def test_trainer_grafts_checkpoint_and_trains(self, tmp_path):
        """The CLI surface (reference train.py: net_builder(pretrained=
        args.use_pretrain, pretrained_path=args.pretrain_path)): a config
        with use_pretrain=True must graft the .pth onto the backbone at
        Trainer construction — params AND the EMA shadow — and the
        grafted state must still train."""
        import torch
        from semireward_tpu.config import get_config
        from semireward_tpu.core.trainer import Trainer

        sd = _fake_timm_vit_sd(grid=16, seed=3)
        path = tmp_path / "pretrained.pth"
        torch.save({"model": {k: torch.from_numpy(v)
                              for k, v in sd.items()}}, str(path))

        cfg = get_config(dict(
            algorithm="fixmatch", net="vit_tiny_patch2_32",
            dataset="synthetic", num_classes=10, num_labels=40,
            batch_size=4, uratio=1, eval_batch_size=8, img_size=32,
            crop_ratio=0.875, num_train_iter=2, num_eval_iter=1 << 30,
            num_log_iter=1, optim="AdamW", lr=5e-4, ema_m=0.999, seed=0,
            compute_dtype="float32", save_dir=str(tmp_path),
            use_pretrain=True, pretrain_path=str(path), mesh_shape=(1,)))
        cfg.extra["synthetic_train"] = 64
        cfg.extra["synthetic_test"] = 16
        tr = Trainer(cfg, use_mesh=False)

        got = np.asarray(tr.state.params["blocks0"]["attn"]["proj"]["kernel"])
        want = sd["blocks.0.attn.proj.weight"].T
        np.testing.assert_allclose(got, want, rtol=1e-6)
        got_pe = np.asarray(tr.state.params["pos_embed"])
        np.testing.assert_allclose(got_pe, sd["pos_embed"], rtol=1e-6)
        # EMA shadow restarts FROM the grafted weights, not the random init
        ema = np.asarray(tr.state.ema_params["blocks0"]["attn"]["proj"]
                         ["kernel"])
        np.testing.assert_allclose(ema, want, rtol=1e-6)
        # head stays randomly initialized (skip_head: num_classes differs)
        head = np.asarray(tr.state.params["head"]["kernel"])
        assert not np.allclose(head, sd["head.weight"].T)
        tr.train()  # 2 steps: the grafted state jits and steps

    def test_missing_path_raises_actionable_error(self, tmp_path):
        from semireward_tpu.config import get_config
        from semireward_tpu.core.trainer import Trainer

        cfg = get_config(dict(
            algorithm="fixmatch", net="vit_tiny_patch2_32",
            dataset="synthetic", num_classes=10, num_labels=40,
            batch_size=4, uratio=1, eval_batch_size=8, img_size=32,
            num_train_iter=2, num_eval_iter=1 << 30, num_log_iter=1,
            seed=0, compute_dtype="float32", save_dir=str(tmp_path),
            use_pretrain=True, pretrain_path="", mesh_shape=(1,)))
        cfg.extra["synthetic_train"] = 64
        with pytest.raises(FileNotFoundError, match="pretrain_path"):
            Trainer(cfg, use_mesh=False)
