"""Loss-function parity against torch (the reference's substrate).

Each test recomputes the reference formula with torch.nn.functional
(cross_entropy.py:11-31, consistency.py:13-45, regression.py:11-85) and
asserts our jax version matches to float tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from semireward_tpu.core import losses as L


def t(x):
    return torch.tensor(np.asarray(x))


class TestCELoss:
    def test_hard_targets(self, rs):
        logits = rs.randn(16, 10).astype(np.float32)
        y = rs.randint(0, 10, 16)
        ours = np.asarray(L.ce_loss(jnp.asarray(logits), jnp.asarray(y), "none"))
        ref = F.nll_loss(F.log_softmax(t(logits), -1), t(y), reduction="none")
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)

    def test_soft_targets(self, rs):
        logits = rs.randn(16, 10).astype(np.float32)
        targets = rs.dirichlet(np.ones(10), 16).astype(np.float32)
        ours = np.asarray(L.ce_loss(jnp.asarray(logits), jnp.asarray(targets), "mean"))
        log_pred = F.log_softmax(t(logits), -1)
        ref = torch.sum(-t(targets) * log_pred, dim=1).mean()
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)


class TestConsistencyLoss:
    @pytest.mark.parametrize("name", ["ce", "mse", "l1"])
    def test_masked(self, rs, name):
        logits = rs.randn(12, 7).astype(np.float32)
        if name == "ce":
            targets = rs.randint(0, 7, 12)
        else:
            targets = rs.dirichlet(np.ones(7), 12).astype(np.float32)
        mask = (rs.rand(12) > 0.5).astype(np.float32)
        mask2 = (rs.rand(12) > 0.3).astype(np.float32)
        ours = np.asarray(L.consistency_loss(
            jnp.asarray(logits), jnp.asarray(targets), name,
            jnp.asarray(mask), jnp.asarray(mask2)))
        # reference consistency.py:31-45
        if name == "mse":
            probs = torch.softmax(t(logits), -1)
            ref = F.mse_loss(probs, t(targets), reduction="none").mean(dim=1)
        elif name == "l1":
            ref = F.l1_loss(t(logits), t(targets), reduction="none").mean(dim=1)
        else:
            ref = F.nll_loss(F.log_softmax(t(logits), -1), t(targets),
                             reduction="none")
        ref = (ref * t(mask) * t(mask2)).mean()
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)


class TestRegLoss:
    @pytest.mark.parametrize("mode", ["l1_loss", "l2_loss", "focal_l1_loss",
                                      "focal_l2_loss", "huber_loss"])
    def test_modes(self, rs, mode):
        logits = rs.randn(8, 1).astype(np.float32)
        target = rs.randn(8).astype(np.float32)
        ours = np.asarray(L.reg_loss(jnp.asarray(logits), jnp.asarray(target), mode))
        tt = t(target).view(t(logits).shape)
        tl = t(logits)
        if mode == "l1_loss":
            ref = F.l1_loss(tl, tt)
        elif mode == "l2_loss":
            ref = F.mse_loss(tl, tt)
        elif mode == "huber_loss":
            l1 = F.l1_loss(tl, tt, reduction="none")
            ref = torch.where(l1 < 1.0, 0.5 * l1**2, l1 - 0.5).mean()
        else:
            l = (F.l1_loss if mode == "focal_l1_loss" else F.mse_loss)(
                tl, tt, reduction="none")
            w = (2 * torch.sigmoid(0.2 * torch.abs(tl - tt)) - 1) ** 1.0
            ref = (l * w).mean()
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)


class TestTargets:
    def test_smooth_targets(self, rs):
        logits = rs.randn(6, 5).astype(np.float32)
        y = rs.randint(0, 5, 6)
        ours = np.asarray(L.smooth_targets(jnp.asarray(logits), jnp.asarray(y), 0.1))
        ref = torch.zeros(6, 5)
        ref.fill_(0.1 / 4)
        ref.scatter_(1, t(y).unsqueeze(1), 0.9)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)

    def test_gen_ulb_targets_hard(self, rs):
        logits = rs.randn(6, 5).astype(np.float32)
        assert np.array_equal(
            np.asarray(L.gen_ulb_targets(jnp.asarray(logits), True)),
            logits.argmax(-1))

    def test_gen_ulb_targets_soft_T(self, rs):
        logits = rs.randn(6, 5).astype(np.float32)
        ours = np.asarray(L.gen_ulb_targets(jnp.asarray(logits), False, T=0.5))
        ref = torch.softmax(t(logits) / 0.5, -1)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=1e-5)
