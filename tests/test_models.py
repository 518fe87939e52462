"""Model zoo contract tests (reference nets/__init__.py:4-10 forward
contract; wrn.py:118-157; vit.py:253-320)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semireward_tpu.registry import NETS
import semireward_tpu  # noqa: F401


def _init(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=False)
    return v, x


def _nparams(params):
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


class TestWRN:
    def test_contract_and_param_count(self):
        model = NETS.get("wrn_28_2")(num_classes=10, dtype=jnp.float32)
        v, x = _init(model, (2, 32, 32, 3))
        # torch reference wrn_28_2(num_classes=10): 1,467,626 params
        # (verified against /root/reference/semilearn/nets/wrn/wrn.py)
        assert _nparams(v["params"]) == 1467626
        out = model.apply(v, x, train=False)
        assert out["logits"].shape == (2, 10)
        assert out["feat"].shape == (2, 128)
        feat = model.apply(v, x, train=False, only_feat=True)
        np.testing.assert_allclose(np.asarray(feat), np.asarray(out["feat"]),
                                   rtol=1e-5)
        logits = model.apply(v, feat, only_fc=True)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(out["logits"]), rtol=1e-5)

    def test_bn_stats_update_in_train(self, rs):
        model = NETS.get("wrn_28_2")(num_classes=10, dtype=jnp.float32)
        v, _ = _init(model, (2, 32, 32, 3))
        x = jnp.asarray(rs.randn(2, 32, 32, 3), jnp.float32)
        out, new_state = model.apply(v, x, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.PRNGKey(0)})
        before = jax.tree_util.tree_leaves(v["batch_stats"])
        after = jax.tree_util.tree_leaves(new_state["batch_stats"])
        assert any(not np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after))

    def test_wrn_var(self):
        model = NETS.get("wrn_var_37_2")(num_classes=10, dtype=jnp.float32)
        v, x = _init(model, (2, 96, 96, 3))
        out = model.apply(v, x, train=False)
        assert out["feat"].shape == (2, 256)


class TestViT:
    def test_tiny_contract(self):
        model = NETS.get("vit_tiny_patch2_32")(num_classes=100,
                                               dtype=jnp.float32)
        v, x = _init(model, (2, 32, 32, 3))
        out = model.apply(v, x, train=False)
        assert out["logits"].shape == (2, 100)
        assert out["feat"].shape == (2, 192)

    def test_small_param_count(self):
        model = NETS.get("vit_small_patch2_32")(num_classes=100,
                                                dtype=jnp.float32)
        v, _ = _init(model, (1, 32, 32, 3))
        # patch(4992) + cls(384) + pos(98688) + 12*1,774,464 + norm(768)
        # + head(38500) = 21,436,900, matching the reference architecture
        assert _nparams(v["params"]) == 21_436_900

    def test_deterministic_eval(self, rs):
        model = NETS.get("vit_tiny_patch2_32")(num_classes=10,
                                               dtype=jnp.float32)
        v, _ = _init(model, (2, 32, 32, 3))
        x = jnp.asarray(rs.randn(2, 32, 32, 3), jnp.float32)
        a = model.apply(v, x, train=False)["logits"]
        b = model.apply(v, x, train=False)["logits"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dnabert_registered_and_forwards():
    """dnabert_2_117m (reference nets/huggingface/transformer.py:4-53)
    registers and classifies tokenized k-mer input."""
    import jax
    import jax.numpy as jnp
    import semireward_tpu as st

    assert "dnabert_2_117m" in list(st.NETS.keys())
    assert "hf_text_classifier" in list(st.NETS.keys())
    m = st.get_net_builder("dnabert_2_117m")(num_classes=2, dtype=jnp.float32)
    ids = jnp.ones((1, 8), jnp.int32)
    batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
    p = m.init(jax.random.PRNGKey(0), batch, train=False)["params"]
    out = m.apply({"params": p}, batch, train=False)
    assert out["logits"].shape == (1, 2)


def test_vit_remat_flags_grads_bit_identical(rs):
    """remat_attn / remat_mlp re-compute the same math in the backward —
    gradients must be BIT-identical to the stored-residual path (they only
    trade HBM residuals for recompute; see docs/benchmark.md)."""
    from semireward_tpu.models.vit import VisionTransformer

    kw = dict(num_classes=10, img_size=32, patch_size=2, embed_dim=64,
              depth=2, num_heads=4, dtype=jnp.float32)
    x = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)
    base = VisionTransformer(remat_attn=False, remat_mlp=False, **kw)
    v = base.init({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1)}, x, train=False)

    def grads(model):
        def f(p):
            out = model.apply({"params": p}, x, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out["logits"] ** 2)
        return jax.grad(f)(v["params"])

    g0 = grads(base)
    for flags in (dict(remat_attn=True, remat_mlp=False),
                  dict(remat_attn=False, remat_mlp=True),
                  dict(remat_attn=True, remat_mlp=True)):
        g1 = grads(VisionTransformer(**flags, **kw))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), g0, g1)


class TestFlashWiring:
    """use_flash reaches BERT/HuBERT attention (ops/attention.py): eval is
    numerically unchanged (no dropout; the key-bias kernel == einsum), and
    the training path draws a per-layer hash-dropout seed from the dropout
    RNG (the fused-einsum fallback on CPU applies the identical stream the
    TPU kernel generates — see test_flash_attention.py)."""

    _BKW = dict(num_classes=3, hidden=64, heads=4, intermediate=128,
                max_position=32, dtype=jnp.float32)

    def _bert_batch(self):
        ids = jnp.arange(2 * 16).reshape(2, 16) % 50
        mask = jnp.asarray(np.array([[1] * 16, [1] * 9 + [0] * 7]))
        return {"input_ids": ids, "attention_mask": mask}

    def test_bert_eval_identical_and_train_runs(self):
        from semireward_tpu.models.bert import ClassificationBert

        batch = self._bert_batch()
        base = ClassificationBert(layers=2, **self._BKW)
        flash = ClassificationBert(layers=2, use_flash=True, **self._BKW)
        v = base.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, batch, train=False)
        o0 = base.apply(v, batch, train=False)["logits"]
        o1 = flash.apply(v, batch, train=False)["logits"]
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

        def loss(p):
            out = flash.apply({"params": p}, batch, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out["logits"] ** 2)

        g = jax.grad(loss)(v["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
        # the seed derives from the dropout rng -> a different rng key
        # changes the attention-dropout mask and hence the loss
        l2 = flash.apply({"params": v["params"]}, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(3)})["logits"]
        l1 = flash.apply({"params": v["params"]}, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})["logits"]
        assert np.abs(np.asarray(l1) - np.asarray(l2)).max() > 0

    def test_hubert_eval_identical_and_train_runs(self):
        from semireward_tpu.models.hubert import ClassificationAudioTransformer

        kw = dict(num_classes=3, hidden=64, heads=4, layers=2,
                  dtype=jnp.float32)
        wav = jnp.asarray(np.random.RandomState(0).randn(2, 4000),
                          jnp.float32)
        base = ClassificationAudioTransformer(**kw)
        flash = ClassificationAudioTransformer(use_flash=True, **kw)
        v = base.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, wav, train=False)
        o0 = base.apply(v, wav, train=False)["logits"]
        o1 = flash.apply(v, wav, train=False)["logits"]
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

        def loss(p):
            out = flash.apply({"params": p}, wav, train=True,
                              rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(out["logits"] ** 2)

        g = jax.grad(loss)(v["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))

    def test_builders_accept_use_flash(self):
        m = NETS.get("bert_base_uncased")(num_classes=2, use_flash=True)
        assert m.use_flash
        m = NETS.get("hubert_base")(num_classes=2, use_flash=True)
        assert m.use_flash
        m = NETS.get("wave2vecv2_base")(num_classes=2, use_flash=True)
        assert m.use_flash
