"""Optimizer/schedule parity vs torch (reference build.py:193-251)."""
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from semireward_tpu.core import optim as O


class TestCosineSchedule:
    def test_matches_reference_lambda(self):
        # reference get_cosine_schedule_with_warmup (build.py:227-251)
        lr, total, warm = 0.03, 1000, 100
        sched = O.cosine_schedule_with_warmup(lr, total, warm)
        for step in [0, 1, 50, 99, 100, 101, 500, 999, 1000]:
            if step < warm:
                ref = lr * step / max(1, warm)
            else:
                frac = (step - warm) / max(1, total - warm)
                ref = lr * max(0.0, math.cos(math.pi * (7.0 / 16.0) * frac))
            np.testing.assert_allclose(float(sched(step)), ref, rtol=1e-6)


def _torch_step(optimizer_name, w0, g, lr, wd, momentum=0.9, steps=3):
    w = torch.tensor(w0.copy(), requires_grad=True)
    if optimizer_name == "sgd":
        opt = torch.optim.SGD([w], lr=lr, momentum=momentum,
                              weight_decay=wd, nesterov=True)
    else:
        opt = torch.optim.AdamW([w], lr=lr, weight_decay=wd)
    for _ in range(steps):
        opt.zero_grad()
        w.grad = torch.tensor(g)
        opt.step()
    return w.detach().numpy()


def _ours_step(optimizer_name, w0, g, lr, wd, momentum=0.9, steps=3):
    params = {"dense": {"kernel": jnp.asarray(w0)}}
    grads = {"dense": {"kernel": jnp.asarray(g)}}
    tx = O.build_optimizer(
        params, optim_name=optimizer_name, lr=lr, momentum=momentum,
        weight_decay=wd, num_training_steps=10 ** 9,
        schedule=lambda c: lr)  # constant lr isolates the optimizer rule
    state = tx.init(params)
    for _ in range(steps):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return np.asarray(params["dense"]["kernel"])


class TestOptimizerParity:
    def test_sgd_nesterov_wd(self, rs):
        w0 = rs.randn(4, 6).astype(np.float32)
        g = rs.randn(4, 6).astype(np.float32)
        ours = _ours_step("SGD", w0, g, lr=0.03, wd=5e-4)
        ref = _torch_step("sgd", w0, g, lr=0.03, wd=5e-4)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_adamw_wd(self, rs):
        w0 = rs.randn(4, 6).astype(np.float32)
        g = rs.randn(4, 6).astype(np.float32)
        ours = _ours_step("AdamW", w0, g, lr=5e-4, wd=5e-4)
        ref = _torch_step("adamw", w0, g, lr=5e-4, wd=5e-4)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)

    def test_wd_mask_skips_bias_and_norm(self, rs):
        params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 4)),
                           "bias": jnp.zeros((4,))},
                  "bn1": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))}}
        mask = O.default_wd_mask(params)
        assert mask["conv"]["kernel"] is True
        assert mask["conv"]["bias"] is False
        assert mask["bn1"]["scale"] is False
        assert mask["bn1"]["bias"] is False

    def test_layer_decay_scales(self):
        params = {"blocks0": {"w": jnp.zeros((2, 2))},
                  "blocks5": {"w": jnp.zeros((2, 2))},
                  "head": {"w": jnp.zeros((2, 2))}}

        def lid(names, n):
            if names[0].startswith("blocks"):
                return int(names[0][6:]) + 1
            return n

        scales = O.layer_decay_scales(params, 0.5, lid, num_layers=7)
        # reference nets/utils.py:166-168: scale = ld ** (layer_max - id),
        # head (id = layer_max) = 1.0 exactly
        assert np.isclose(scales["head"]["w"], 1.0)
        assert np.isclose(scales["blocks5"]["w"], 0.5 ** 1)  # layer 6
        assert np.isclose(scales["blocks0"]["w"], 0.5 ** 6)  # layer 1


class TestFlatEquivalence:
    """flat=True (one raveled vector) must match the per-leaf optax chain
    bit-for-bit over multiple steps."""

    def _run(self, optim_name, flat, steps=5, layer_decay=1.0):
        import jax
        import jax.numpy as jnp
        from semireward_tpu.core.optim import build_optimizer

        params = {
            "blocks_0": {"kernel": jnp.ones((4, 3)) * 0.5,
                         "bias": jnp.zeros((3,))},
            "norm": {"scale": jnp.ones((3,))},
            "head": {"kernel": jnp.full((3, 2), 0.2)},
        }
        lid = lambda names, n: 0 if names[0] == "blocks_0" else n + 1
        tx = build_optimizer(params, optim_name, lr=0.1, momentum=0.9,
                             weight_decay=0.01, layer_decay=layer_decay,
                             num_training_steps=100, layer_id_fn=lid,
                             num_layers=2, flat=flat)
        state = tx.init(params)
        import numpy as np
        rs = np.random.RandomState(0)
        for i in range(steps):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    rs.standard_normal(p.shape).astype(np.float32)), params)
            import optax
            upd, state = tx.update(grads, state, params)
            params = optax.apply_updates(params, upd)
        return params

    def test_sgd_flat_matches_tree(self):
        import numpy as np, jax
        a = self._run("SGD", flat=True)
        b = self._run("SGD", flat=False)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)

    def test_adamw_layerdecay_flat_matches_tree(self):
        import numpy as np, jax
        a = self._run("AdamW", flat=True, layer_decay=0.5)
        b = self._run("AdamW", flat=False, layer_decay=0.5)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-7)
