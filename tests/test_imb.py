"""Imbalanced-SSL wrappers: one composed train step per method + unit tests
for the weighting rules."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import semireward_tpu  # noqa: F401
import semireward_tpu.imb  # noqa: F401
from semireward_tpu.config import get_config
from semireward_tpu.registry import ALGORITHMS, IMB_ALGORITHMS, NETS
from semireward_tpu.core.step import init_train_state, make_train_step
from semireward_tpu.imb.saw import effective_weights


class TestEffectiveWeights:
    def test_matches_reference_formula(self):
        import torch
        y = np.array([100, 10, 1], np.float64)
        ours = effective_weights(y)
        yt = torch.tensor(y)
        N = torch.sum(yt) / len(yt)
        beta = (N - 1) / N
        eff = 1.0 - torch.pow(beta, yt)
        w = (1.0 - beta) / eff
        ref = (w / w.sum() * len(yt)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def build(imb_name, base="fixmatch", B=4, C_=4):
    cfg = get_config(dict(
        algorithm=base, imb_algorithm=imb_name, net="wrn_28_2",
        num_classes=C_, batch_size=B, uratio=1, num_train_iter=40, epoch=4,
        lr=0.01, optim="SGD", ema_m=0.999, img_size=32,
        compute_dtype="float32"))
    data_info = {"ulb_dest_len": 32, "lb_dest_len": 16,
                 "lb_class_dist": np.array([0.4, 0.3, 0.2, 0.1])}
    base_cls = ALGORITHMS.get(base)
    alg = IMB_ALGORITHMS.get(imb_name)(cfg, data_info, base_cls=base_cls)
    model = alg.wrap_model(NETS.get("wrn_28_2")(num_classes=C_,
                                                dtype=jnp.float32))
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = jax.jit(make_train_step(cfg, alg, model, tx))
    return cfg, alg, state, step


def batch(rs, B=4, C_=4):
    return dict(
        x_lb=jnp.asarray(rs.randn(B, 32, 32, 3), jnp.float32),
        y_lb=jnp.asarray(rs.randint(0, C_, B)),
        idx_ulb=jnp.asarray(rs.choice(32, B, replace=False), jnp.int32),
        x_ulb_w=jnp.asarray(rs.randn(B, 32, 32, 3), jnp.float32),
        x_ulb_s=jnp.asarray(rs.randn(B, 32, 32, 3), jnp.float32))


@pytest.mark.parametrize("imb_name", ["saw", "debiaspl", "adsh", "abc",
                                      "tras", "darp"])
def test_imb_step(imb_name, rs):
    cfg, alg, state, step = build(imb_name)
    for _ in range(2):
        state, m = step(state, batch(rs))
    assert int(state.step) == 2
    assert np.isfinite(float(m["total_loss"]))


def test_debiaspl_p_hat_moves(rs):
    cfg, alg, state, step = build("debiaspl")
    p0 = np.asarray(state.algo[1]["p_hat"])
    state, _ = step(state, batch(rs))
    p1 = np.asarray(state.algo[1]["p_hat"])
    assert not np.allclose(p0, p1)


def test_darp_updates_pseudo_orig(rs):
    cfg, alg, state, step = build("darp")
    b = batch(rs)
    state, _ = step(state, b)
    po = np.asarray(state.algo[1].pseudo_orig)
    idx = np.asarray(b["idx_ulb"])
    # updated rows are real prob rows, others still uniform
    assert not np.allclose(po[idx], 0.25)
    others = np.setdiff1d(np.arange(32), idx)
    np.testing.assert_allclose(po[others], 0.25, rtol=1e-6)


def test_cossl_step(rs):
    """CoSSL composed step with TFE streams."""
    cfg, alg, state, step = build("cossl")
    b = batch(rs)
    b["x_tfe_lb"] = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)
    b["y_tfe_lb"] = jnp.asarray(rs.randint(0, 4, 4))
    b["x_tfe_ulb"] = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)
    state, m = step(state, b)
    assert np.isfinite(float(m["total_loss"]))
    assert "tea_loss" in m
    # warm_epoch=0 -> the dedicated teacher SGD is active from step 0:
    # its momentum buffers must move (reference cossl.py:50-75 steps
    # tfe_optimizer on the same grads right after the main optimizer)
    buf = state.algo[1]["tfe_momentum"]
    assert not np.allclose(np.asarray(buf["kernel"]), 0.0)


def test_cossl_teacher_sgd_matches_torch(rs):
    """The dedicated head update must be torch-SGD (nesterov, wd) exactly,
    applied ON TOP of the main optimizer's update of the same params."""
    import torch

    cfg, alg, state, step = build("cossl")
    b = batch(rs)
    b["x_tfe_lb"] = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)
    b["y_tfe_lb"] = jnp.asarray(rs.randint(0, 4, 4))
    b["x_tfe_ulb"] = jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32)

    # reproduce the step by hand: grads of the composed loss wrt the head,
    # with the exact same per-step rng the jitted step derives
    from semireward_tpu.algorithms.base import StepCtx
    from semireward_tpu.utils import prng

    model = alg.wrap_model(NETS.get("wrn_28_2")(num_classes=4,
                                                dtype=jnp.float32))

    def state_model_apply(*a, **kw):
        return model.apply(*a, **kw)

    rng = prng.step_key(state.rng, state.step)

    def loss_fn2(params):
        ctx = StepCtx(apply_fn=state_model_apply, params=params,
                      batch_stats=state.batch_stats, batch=b,
                      algo_state=state.algo, rng=rng, step=state.step,
                      ema_params=state.ema_params, sr_state=None)
        return alg.loss(ctx).total_loss

    grads = jax.grad(loss_fn2)(state.params)
    g_head = {k: np.asarray(v, np.float64)
              for k, v in grads["teacher_classifier"].items()}
    p0 = {k: np.asarray(v, np.float64)
          for k, v in state.params["teacher_classifier"].items()}

    # what post_param_update does, re-derived with torch.optim.SGD applied
    # to the MAIN-optimizer-updated head over the same grads
    new_state, _ = step(state, b)
    lr = float(cfg.extra.get("cossl_tfe_warm_lr", 0.02))
    wd = float(cfg.extra.get("cossl_tfe_warm_wd", 5e-4))

    # the intermediate (main-optimizer-updated) head is not observable from
    # outside the jitted step — recompute the main tx update directly, then
    # verify end-to-end: torch-SGD applied to it reproduces the final head
    import optax
    from semireward_tpu.core.optim import build_optimizer
    tx = build_optimizer(state.params, optim_name=cfg.optim, lr=cfg.lr,
                         momentum=cfg.momentum,
                         weight_decay=cfg.weight_decay,
                         layer_decay=cfg.layer_decay,
                         num_training_steps=cfg.num_train_iter,
                         num_warmup_steps=cfg.num_warmup_iter,
                         clip_grad=cfg.grad_clip)
    upd, _ = tx.update(grads, state.opt_state, state.params)
    mid = optax.apply_updates(state.params, upd)["teacher_classifier"]

    pt = {k: torch.tensor(np.asarray(v, np.float64), requires_grad=True)
          for k, v in mid.items()}
    opt = torch.optim.SGD(list(pt.values()), lr=lr,
                          momentum=float(cfg.momentum), weight_decay=wd,
                          nesterov=True)
    for k in pt:
        pt[k].grad = torch.tensor(g_head[k])
    opt.step()
    final = np.asarray(new_state.params["teacher_classifier"]["kernel"])
    np.testing.assert_allclose(final, pt["kernel"].detach().numpy(),
                               rtol=1e-4, atol=1e-6)
