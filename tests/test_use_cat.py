"""use_cat=False — the reference's separate-forwards path
(algorithmbase use_cat + Bn_Controller, core/utils/misc.py:105-129):
lb and strong-ulb branches forward separately (BN stats update per branch),
the weak branch forwards under frozen BN stats and no grad."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import semireward_tpu  # noqa: F401
from semireward_tpu.config import get_config
from semireward_tpu.registry import ALGORITHMS, NETS
from semireward_tpu.algorithms.common import ssl_forward
from semireward_tpu.core.step import init_train_state, make_train_step


def _mk(net_name, use_cat, **net_kw):
    cfg = get_config(dict(
        algorithm="fixmatch", net=net_name, num_classes=4, batch_size=4,
        uratio=1, num_train_iter=40, lr=0.01, optim="SGD", ema_m=0.999,
        img_size=32, compute_dtype="float32", use_cat=use_cat))
    model = NETS.get(net_name)(num_classes=4, dtype=jnp.float32, **net_kw)
    alg = ALGORITHMS.get("fixmatch")(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = jax.jit(make_train_step(cfg, alg, model, tx))
    return cfg, model, state, step


def _batch(rs, B=4):
    return dict(
        x_lb=jnp.asarray(rs.randn(B, 32, 32, 3), jnp.float32),
        y_lb=jnp.asarray(rs.randint(0, 4, B)),
        idx_ulb=jnp.asarray(rs.choice(32, B, replace=False), jnp.int32),
        x_ulb_w=jnp.asarray(rs.randn(B, 32, 32, 3), jnp.float32),
        x_ulb_s=jnp.asarray(rs.randn(B, 32, 32, 3), jnp.float32))


def test_equivalent_for_stat_free_net(rs):
    """For a batch-independent net (ViT, dropout off at these sizes via
    deterministic rng per-branch being irrelevant: drop rates are 0), the
    concat and separate paths must produce identical losses."""
    outs = {}
    b = _batch(rs)
    for use_cat in (True, False):
        cfg, model, state, step = _mk("vit_tiny_patch2_32", use_cat, depth=2)
        _, m = step(state, b)
        outs[use_cat] = float(m["total_loss"])
    assert np.isfinite(outs[True])
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5)


def test_bn_semantics_differ_and_weak_branch_frozen(rs):
    """For a BN net the two paths legitimately differ (per-branch vs joint
    batch moments — why the flag exists). The weak branch must NOT
    contribute to the separate path's running stats: its forward runs under
    frozen stats like the reference's Bn_Controller."""
    cfg, model, state, step = _mk("wrn_28_2", False, depth=10)
    b = _batch(rs)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_sep = ssl_forward(model.apply, state.params, state.batch_stats,
                          b["x_lb"], b["x_ulb_w"], b["x_ulb_s"],
                          jax.random.PRNGKey(0), train=True, use_cat=False)
    out_cat = ssl_forward(model.apply, state.params, state.batch_stats,
                          b["x_lb"], b["x_ulb_w"], b["x_ulb_s"],
                          jax.random.PRNGKey(0), train=True, use_cat=True)
    # paths differ on a BN net (joint vs per-branch normalization)
    assert not np.allclose(np.asarray(out_cat.logits_x_lb),
                           np.asarray(out_sep.logits_x_lb))

    # weak-branch freeze: running stats after (lb, s) forwards must be
    # IDENTICAL whether or not the weak forward happened
    def fwd(v, x, mutable):
        out = model.apply(v, x, train=True, mutable=mutable,
                          rngs={"dropout": jax.random.PRNGKey(0)})
        return out if mutable else (out, {})

    v = dict(variables)
    _, st1 = fwd(v, b["x_lb"], ["batch_stats"])
    v = {"params": state.params, "batch_stats": st1["batch_stats"]}
    _, st2 = fwd(v, b["x_ulb_s"], ["batch_stats"])
    expect = st2["batch_stats"]
    got = out_sep.model_state["batch_stats"]
    for a, c in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)

    # and the full jitted step runs end-to-end with use_cat=False
    state2, m = step(state, b)
    assert np.isfinite(float(m["total_loss"]))
