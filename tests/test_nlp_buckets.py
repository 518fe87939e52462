"""Multi-bucket static padding for NLP (round-5 perf work).

The reference pads each batch to its own max length
(semilearn/datasets/collactors/nlp_collactor.py:49-126); jit needs static
shapes, so NLPCollator pads to the smallest static bucket that fits
(default 64/128/256/max_length). These tests pin:
- bucket selection (smallest fitting bucket, joint across views),
- model correctness across buckets (real-position hidden states invariant
  to padding length; only the reference's include-padding mean-pool quirk
  differs — and buckets bring that quirk CLOSER to the reference's
  dynamic padding than the old fixed-512 pad),
- multi-host bucket agreement (SPMD one-program rule),
- an end-to-end trainer run with buckets engaged.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semireward_tpu.data.nlp import (NLPCollator, HashTokenizer, TextDataset,
                                     auto_buckets)
from semireward_tpu.data.modality import NLPSSLLoader


def make_col(max_length=512):
    return NLPCollator(HashTokenizer(), max_length=max_length,
                       buckets=auto_buckets(max_length))


class TestBucketSelection:
    def test_auto_buckets(self):
        assert auto_buckets(512) == (64, 128, 256, 512)
        assert auto_buckets(128) == (64, 128)
        assert auto_buckets(40) == (40,)

    def test_smallest_fitting_bucket(self):
        col = make_col()
        assert col.bucket_for(2) == 64
        assert col.bucket_for(64) == 64
        assert col.bucket_for(65) == 128
        assert col.bucket_for(300) == 512
        assert col.bucket_for(9999) == 512  # clamps at max_length

    def test_call_buckets_and_content_prefix(self):
        col = make_col()
        texts = ["w1 w2 w3", "w4 " * 30]
        b = col(texts)
        assert b["input_ids"].shape == (2, 64)
        b512 = col(texts, length=512)
        np.testing.assert_array_equal(b512["input_ids"][:, :64],
                                      b["input_ids"])
        assert (b512["input_ids"][:, 64:] == 0).all()
        np.testing.assert_array_equal(
            b["attention_mask"], (b["input_ids"] != 0).astype(np.int32))

    def test_joint_views_one_width(self):
        col = make_col()
        lb = TextDataset(["a b"] * 6, None, np.zeros(6, np.int64))
        # strong augs are long -> they should set the joint bucket
        ulb = TextDataset(["x " * 20] * 8, [["p " * 90, "q r"]] * 8,
                          np.zeros(8, np.int64))
        out = col.collate_views(lb, ulb, np.arange(4), np.arange(4),
                                ["x_lb", "x_ulb_w", "x_ulb_s"],
                                np.random.RandomState(0))
        widths = {v["input_ids"].shape[1] for v in out.values()}
        assert len(widths) == 1 and widths.pop() in (64, 128)

    def test_single_bucket_backcompat(self):
        """buckets=None keeps the historical fixed-max_length shape."""
        col = NLPCollator(HashTokenizer(), max_length=96)
        assert col.buckets == (96,)
        assert col(["a b"])["input_ids"].shape == (1, 96)

    def test_rng_stream_matches_per_view_path(self):
        """collate_views consumes the strong-pick RNG in the same order as
        the historical per-view views() calls (reproducible streams)."""
        col = make_col()
        ulb = TextDataset([f"t{i} " * 10 for i in range(20)],
                          [[f"a{i} " * 12, f"b{i} " * 8] for i in range(20)],
                          np.zeros(20, np.int64))
        lb = TextDataset(["l m n"] * 10, None, np.zeros(10, np.int64))
        keys = ["x_lb", "x_ulb_w", "x_ulb_s"]
        li, ui = np.arange(4), np.arange(6, 12)
        joint = col.collate_views(lb, ulb, li, ui, keys,
                                  np.random.RandomState(7), length=512)
        rs = np.random.RandomState(7)
        is_lb = lambda k: k in ("x_lb", "x_lb_s")
        legacy = {k: col.views(lb if is_lb(k) else ulb,
                               li if is_lb(k) else ui, rs,
                               strong=k.endswith("_s"), length=512)
                  for k in keys}
        for k in keys:
            np.testing.assert_array_equal(joint[k]["input_ids"],
                                          legacy[k]["input_ids"])


class TestMultiHostBucketAgreement:
    def test_two_ranks_same_bucket(self):
        rs = np.random.RandomState(3)
        texts = [" ".join(f"w{j}" for j in range(rs.randint(5, 200)))
                 for _ in range(40)]
        lb = TextDataset(texts[:16], None, np.zeros(16, np.int64))
        ulb = TextDataset(texts, [[t + " x", t] for t in texts],
                          np.zeros(40, np.int64))
        keys = ["x_lb", "x_ulb_w", "x_ulb_s"]
        loaders = [NLPSSLLoader({"train_lb": lb, "train_ulb": ulb},
                                make_col(), 2, 4, keys, seed=0,
                                rank=r, world=2) for r in range(2)]
        for step in range(8):
            b0, b1 = next(loaders[0]), next(loaders[1])
            w0 = b0["x_ulb_w"]["input_ids"].shape[1]
            w1 = b1["x_ulb_w"]["input_ids"].shape[1]
            assert w0 == w1, (step, w0, w1)
            # the shared bucket must fit every rank's realized tokens
            for b in (b0, b1):
                for k in keys:
                    assert int(b[k]["attention_mask"].sum(-1).max()) <= w0

    def test_global_window_covers_all_rank_indices(self):
        """The unstrided stream's step-t window == union of all ranks'
        step-t indices (loader.infinite_indices rank striding)."""
        from semireward_tpu.data.loader import infinite_indices, batched
        n, world, bs = 21, 2, 3
        ranks = [batched(infinite_indices(n, 5, r, world), bs)
                 for r in range(world)]
        gstream = batched(NLPSSLLoader._global_stream(n, 5, world),
                          bs * world)
        for _ in range(10):
            union = np.sort(np.concatenate([next(r) for r in ranks]))
            window = np.sort(next(gstream))
            np.testing.assert_array_equal(union, window)


class TestModelBucketInvariance:
    def test_real_positions_invariant_to_padding_length(self):
        """The invariant the bucket path rests on: a REAL token position's
        hidden state after a transformer layer is identical whether the
        sequence is padded to 32 or to 96 — padded keys are masked out of
        attention and every other op is per-position. (The pooled feat
        still depends on pad length through the reference's
        include-padding mean-pool, bert.py:36-37 torch.mean over ALL
        positions — the same quirk the reference has under dynamic
        padding, where feats depend on the batch max length.)"""
        from semireward_tpu.models.bert import BertLayer

        B, n_real, H = 2, 7, 32
        rs = np.random.RandomState(0)
        x_real = jnp.asarray(rs.randn(B, n_real, H), jnp.float32)
        layer = BertLayer(hidden=H, heads=4, intermediate=64,
                          dtype=jnp.float32)

        def run(pad_to):
            pad = pad_to - n_real
            x = jnp.concatenate(
                [x_real, jnp.asarray(rs.randn(B, pad, H), jnp.float32)], 1)
            mask = np.zeros((B, pad_to), np.int32)
            mask[:, :n_real] = 1
            bias = jnp.where(jnp.asarray(mask)[:, None, None, :] > 0,
                             0.0, -1e9).astype(jnp.float32)
            return x, bias

        x32, b32 = run(32)
        x96, b96 = run(96)
        params = layer.init(jax.random.PRNGKey(0), x32, b32, False)
        out32 = np.asarray(layer.apply(params, x32, b32, False))
        out96 = np.asarray(layer.apply(params, x96, b96, False))
        np.testing.assert_allclose(out32[:, :n_real], out96[:, :n_real],
                                   rtol=1e-5, atol=1e-5)

    def test_pad_content_cannot_leak_into_real_positions(self):
        """Corrupting masked-out pad positions' CONTENT must leave every
        real position's post-layer state unchanged."""
        from semireward_tpu.models.bert import BertLayer

        B, n_real, L, H = 2, 5, 32, 32
        rs = np.random.RandomState(1)
        x = rs.randn(B, L, H).astype(np.float32)
        mask = np.zeros((B, L), np.int32)
        mask[:, :n_real] = 1
        bias = jnp.where(jnp.asarray(mask)[:, None, None, :] > 0,
                         0.0, -1e9).astype(jnp.float32)
        layer = BertLayer(hidden=H, heads=4, intermediate=64,
                          dtype=jnp.float32)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), bias,
                            False)
        out1 = np.asarray(layer.apply(params, jnp.asarray(x), bias, False))
        x2 = x.copy()
        x2[:, n_real:] = rs.randn(B, L - n_real, H)  # garbage pad content
        out2 = np.asarray(layer.apply(params, jnp.asarray(x2), bias, False))
        np.testing.assert_allclose(out1[:, :n_real], out2[:, :n_real],
                                   rtol=1e-5, atol=1e-5)
        # ... while the pad rows themselves DO change (sanity that the
        # corruption reached the layer)
        assert np.abs(out1[:, n_real:] - out2[:, n_real:]).max() > 1e-3

    def test_backbone_runs_at_every_bucket(self):
        """BertBackbone end-to-end at each bucket width (pos-embed slice,
        mask plumbing, head) — one forward per bucket, no shape errors."""
        from semireward_tpu.models.bert import ClassificationBert as BertBackbone

        model = BertBackbone(num_classes=3, hidden=32, layers=2, heads=2,
                             intermediate=64, vocab_size=200,
                             max_position=512, dtype=jnp.float32)
        col = NLPCollator(HashTokenizer(vocab_size=200), max_length=512,
                          buckets=auto_buckets(512))
        texts = ["tok1 tok2 tok3", "a b c d e"]
        init_batch = col(texts, length=512)
        params = model.init(jax.random.PRNGKey(0),
                            {k: jnp.asarray(v) for k, v in init_batch.items()},
                            train=False)
        for L in col.buckets:
            b = col(texts, length=L)
            out = model.apply(params,
                              {k: jnp.asarray(v) for k, v in b.items()},
                              train=False)
            assert out["logits"].shape == (2, 3)


@pytest.fixture
def nlp_corpus(tmp_path):
    root = tmp_path / "data"
    base = root / "synthnlp"
    base.mkdir(parents=True)
    rs = np.random.RandomState(0)
    words = [f"w{i}" for i in range(50)]
    for split, count in (("train", 60), ("dev", 8), ("test", 8)):
        d = {}
        for i in range(count):
            y = int(rs.randint(2))
            text = " ".join(rs.choice(words, 10 + 5 * y))
            d[str(i)] = {"ori": text, "aug_0": text + " a",
                         "aug_1": text + " b", "label": y}
        with open(base / f"{split}.json", "w") as f:
            json.dump(d, f)
    return str(root)


class TestTrainerBuckets:
    def test_e2e_train_with_buckets(self, nlp_corpus):
        """Short synthetic corpus + max_length 512 => every batch lands in
        the 64 bucket; the trainer compiles/steps/evals end-to-end."""
        from semireward_tpu.config import get_config
        from semireward_tpu.core.trainer import Trainer

        cfg = get_config(dict(
            algorithm="fixmatch", net="bert_base_uncased", dataset="synthnlp",
            num_classes=2, num_labels=8, batch_size=2, uratio=1,
            eval_batch_size=4, max_length=512, optim="AdamW", lr=5e-5,
            num_train_iter=2, num_eval_iter=2, num_log_iter=1,
            data_dir=nlp_corpus, seed=0, save_name="t_buckets",
            save_dir=os.path.join(nlp_corpus, "out"),
            net_kwargs=dict(hidden=32, layers=2, heads=2, intermediate=64,
                            vocab_size=30522, max_position=512)))
        cfg.extra["prefetch_depth"] = 0
        tr = Trainer(cfg, use_mesh=False)
        assert tr.collator.buckets == (64, 128, 256, 512)
        loader = tr._make_loader()
        b = next(loader)
        assert b["x_ulb_w"]["input_ids"].shape[1] == 64
        res = tr.train(num_iters=2)
        assert "eval/top-1-acc" in res

    def test_buckets_off_knob(self, nlp_corpus):
        from semireward_tpu.config import get_config
        from semireward_tpu.core.trainer import Trainer

        cfg = get_config(dict(
            algorithm="fixmatch", net="bert_base_uncased", dataset="synthnlp",
            num_classes=2, num_labels=8, batch_size=2, uratio=1,
            eval_batch_size=4, max_length=128, optim="AdamW", lr=5e-5,
            num_train_iter=1, num_eval_iter=8, num_log_iter=8,
            data_dir=nlp_corpus, seed=0, save_name="t_nobuckets",
            save_dir=os.path.join(nlp_corpus, "out2"),
            net_kwargs=dict(hidden=32, layers=2, heads=2, intermediate=64,
                            vocab_size=30522, max_position=128)))
        cfg.extra["length_buckets"] = False
        cfg.extra["prefetch_depth"] = 0
        tr = Trainer(cfg, use_mesh=False)
        assert tr.collator.buckets == (128,)
        b = next(tr._make_loader())
        assert b["x_ulb_w"]["input_ids"].shape[1] == 128
