"""Masking / thresholding / dist-align parity with the reference hook
semantics, recomputed here in numpy straight from the cited formulas."""
import numpy as np
import pytest

import jax.numpy as jnp

from semireward_tpu.algorithms import common as C


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestFixedThreshold:
    def test_basic(self, rs):
        probs = softmax(rs.randn(32, 10).astype(np.float32))
        mask = np.asarray(C.fixed_threshold_mask(jnp.asarray(probs), 0.4))
        assert np.array_equal(mask, (probs.max(-1) >= 0.4).astype(np.float32))


class TestFlexMatch:
    def _ref_update(self, selected, num_classes, thresh_warmup):
        """reference flexmatch/utils.py:23-35 Counter logic in numpy."""
        from collections import Counter
        counter = Counter(selected.tolist())
        acc = np.zeros(num_classes, np.float32)
        if max(counter.values()) < len(selected):
            if thresh_warmup:
                denom = max(counter.values())
            else:
                c2 = {k: v for k, v in counter.items() if k != -1}
                denom = max(c2.values())
            for i in range(num_classes):
                acc[i] = counter[i] / denom
            return acc, True
        return acc, False

    @pytest.mark.parametrize("thresh_warmup", [True, False])
    def test_matches_counter_logic(self, rs, thresh_warmup):
        num_classes, ulb_len = 5, 40
        state = C.flex_init(ulb_len, num_classes)
        p_cutoff = 0.3
        for step in range(6):
            probs = softmax(rs.randn(8, num_classes).astype(np.float32) * 3)
            idx = rs.choice(ulb_len, 8, replace=False)
            prev_acc = np.asarray(state.classwise_acc)
            state, mask = C.flex_mask(state, jnp.asarray(probs),
                                      jnp.asarray(idx), p_cutoff, thresh_warmup)
            # mask must use the PREVIOUS classwise_acc (convex mapping)
            maxp, maxi = probs.max(-1), probs.argmax(-1)
            expect_mask = (maxp >= p_cutoff * (prev_acc[maxi] /
                                               (2.0 - prev_acc[maxi])))
            np.testing.assert_array_equal(np.asarray(mask),
                                          expect_mask.astype(np.float32))
            # selected_label scatter + classwise_acc from Counter logic
            ref_acc, updated = self._ref_update(
                np.asarray(state.selected_label), num_classes, thresh_warmup)
            if updated:
                np.testing.assert_allclose(np.asarray(state.classwise_acc),
                                           ref_acc, rtol=1e-6)

    def test_no_update_when_all_unselected(self):
        state = C.flex_init(10, 3)
        probs = jnp.asarray(np.full((4, 3), 1 / 3, np.float32))
        state, mask = C.flex_mask(state, probs, jnp.arange(4), 0.95, True)
        assert np.all(np.asarray(state.classwise_acc) == 0)
        assert np.all(np.asarray(state.selected_label) == -1)


class TestFreeMatch:
    def test_ema_updates(self, rs):
        num_classes, m = 4, 0.9
        state = C.free_init(num_classes)
        probs = softmax(rs.randn(16, num_classes).astype(np.float32) * 2)
        new, mask = C.free_mask(state, jnp.asarray(probs), momentum=m)
        maxp, maxi = probs.max(-1), probs.argmax(-1)
        time_p = (1 / num_classes) * m + (1 - m) * maxp.mean()
        p_model = np.full(num_classes, 1 / num_classes) * m + (1 - m) * probs.mean(0)
        hist = np.bincount(maxi, minlength=num_classes).astype(np.float32)
        label_hist = np.full(num_classes, 1 / num_classes) * m + \
            (1 - m) * hist / hist.sum()
        np.testing.assert_allclose(float(new.time_p), time_p, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new.p_model), p_model, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(new.label_hist), label_hist, rtol=1e-5)
        mod = p_model / p_model.max()
        expect = (maxp >= time_p * mod[maxi]).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(mask), expect)

    def test_entropy_loss_matches_dense_formula(self, rs):
        """Weighted-select form == reference boolean-indexed form
        (freematch.py:16-44) when mask is 0/1."""
        import torch
        num_classes = 6
        logits_s = rs.randn(20, num_classes).astype(np.float32)
        mask = (rs.rand(20) > 0.4).astype(np.float32)
        p_model = softmax(rs.randn(num_classes))[None].astype(np.float32)[0]
        label_hist = softmax(rs.randn(num_classes))[None].astype(np.float32)[0]
        ours = float(C.free_entropy_loss(jnp.asarray(mask), jnp.asarray(logits_s),
                                         jnp.asarray(p_model), jnp.asarray(label_hist)))
        # reference formula
        lt = torch.tensor(logits_s)[torch.tensor(mask).bool()]
        prob_s = lt.softmax(-1)
        _, pred = prob_s.max(-1)
        hist = torch.bincount(pred, minlength=num_classes).float()
        hist = hist / hist.sum()
        mod_pm = torch.tensor(p_model).reshape(1, -1) / torch.tensor(label_hist).reshape(1, -1)
        mod_pm = mod_pm / mod_pm.sum(-1, keepdim=True)
        mod_mp = prob_s.mean(0, keepdim=True) * torch.where(
            hist == 0, torch.zeros_like(hist), 1 / hist)
        mod_mp = mod_mp / mod_mp.sum(-1, keepdim=True)
        ref = float((mod_pm * torch.log(mod_mp + 1e-12)).sum(1).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestSoftMatch:
    def test_global_stats(self, rs):
        state = C.softmatch_init(5)
        probs = softmax(rs.randn(32, 5).astype(np.float32) * 2)
        m, n_sigma = 0.99, 2.0
        new, mask = C.softmatch_mask(state, jnp.asarray(probs), n_sigma, m)
        maxp = probs.max(-1)
        mu = 0.2 * m + (1 - m) * maxp.mean()
        var = 1.0 * m + (1 - m) * maxp.var(ddof=1)
        np.testing.assert_allclose(float(new.prob_max_mu_t), mu, rtol=1e-5)
        np.testing.assert_allclose(float(new.prob_max_var_t), var, rtol=1e-5)
        diff = np.minimum(maxp - mu, 0.0)
        expect = np.exp(-(diff**2) / (2 * var / n_sigma**2))
        np.testing.assert_allclose(np.asarray(mask), expect, rtol=1e-5)

    def test_per_class_only_updates_multi_sample_classes(self, rs):
        state = C.softmatch_init(4, per_class=True)
        probs = np.zeros((3, 4), np.float32)
        probs[:, 0] = 0.9  # all argmax class 0 -> classes 1-3 get (0,1) stats
        probs[:, 1:] = 0.1 / 3
        new, _ = C.softmatch_mask(state, jnp.asarray(probs), 2.0, 0.9,
                                  per_class=True)
        mu = np.asarray(new.prob_max_mu_t)
        # untouched classes EMA toward 0 (mu_t=0) / 1 (var_t=1)
        np.testing.assert_allclose(mu[1:], 0.25 * 0.9, rtol=1e-5)


class TestDistAlign:
    def test_ema_first_step_is_plain_mean(self, rs):
        state, _ = C.dist_align_ema_init(5)
        probs = softmax(rs.randn(8, 5).astype(np.float32))
        new, aligned = C.dist_align_ema(state, jnp.asarray(probs), momentum=0.9)
        np.testing.assert_allclose(np.asarray(new.p_model), probs.mean(0), rtol=1e-5)
        expect = probs * (1 / 5 + 1e-6) / (probs.mean(0) + 1e-6)
        expect = expect / expect.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(aligned), expect, rtol=1e-5)

    def test_queue(self, rs):
        state = C.dist_align_queue_init(4, queue_length=3)
        for i in range(5):
            probs = softmax(rs.randn(6, 4).astype(np.float32))
            state, aligned = C.dist_align_queue(state, jnp.asarray(probs))
        assert int(state.p_model_ptr) == 5 % 3
        np.testing.assert_allclose(np.asarray(aligned).sum(-1), 1.0, rtol=1e-5)
