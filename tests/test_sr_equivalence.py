"""SR-wrapper invariants:
- before start_timing the sr* variant's MODEL update is identical to the
  base algorithm's (reward filtering off; rewarder training touches only
  rewarder params)
- the regression branch of (sr)pseudolabel runs with float targets
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import semireward_tpu  # noqa: F401
from semireward_tpu.config import get_config
from semireward_tpu.registry import ALGORITHMS, NETS
from semireward_tpu.core.step import init_train_state, make_train_step


def build(alg, **over):
    kw = dict(algorithm=alg, net="wrn_28_2", num_classes=4, batch_size=4,
              uratio=1, num_train_iter=40, lr=0.01, optim="SGD", ema_m=0.999,
              img_size=32, compute_dtype="float32", start_timing=10 ** 6,
              N_k=2, feature_dim=128)
    kw.update(over)
    cfg = get_config(kw)
    model = NETS.get("wrn_28_2")(num_classes=cfg.num_classes,
                                 dtype=jnp.float32)
    a = ALGORITHMS.get(alg)(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, a, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    return cfg, state, jax.jit(make_train_step(cfg, a, model, tx))


def batches(rs, n_steps, n=4, C=4):
    out = []
    for _ in range(n_steps):
        out.append(dict(
            x_lb=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32),
            y_lb=jnp.asarray(rs.randint(0, C, n)),
            idx_ulb=jnp.asarray(rs.choice(32, n, replace=False), jnp.int32),
            x_ulb_w=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32),
            x_ulb_s=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32)))
    return out


def test_sr_matches_base_before_start_timing():
    rs = np.random.RandomState(0)
    bs = batches(rs, 3)
    _, s_base, step_base = build("flexmatch")
    _, s_sr, step_sr = build("srflexmatch")
    for b in bs:
        s_base, m_base = step_base(s_base, b)
        s_sr, m_sr = step_sr(s_sr, b)
    np.testing.assert_allclose(float(m_base["total_loss"]),
                               float(m_sr["total_loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_base.params),
                     jax.tree_util.tree_leaves(s_sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # and the rewarder HAS been training meanwhile (stage 1)
    assert s_sr.sr is not None


def test_pseudolabel_regression_branch():
    rs = np.random.RandomState(0)
    cfg = get_config(dict(
        algorithm="pseudolabel", net="wrn_28_2", num_classes=1, batch_size=4,
        uratio=1, num_train_iter=40, lr=0.01, optim="SGD", ema_m=0.0,
        img_size=32, compute_dtype="float32", is_regression=True,
        reg_loss="l1_loss"))
    model = NETS.get("wrn_28_2")(num_classes=1, dtype=jnp.float32)
    a = ALGORITHMS.get("pseudolabel")(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, a, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = jax.jit(make_train_step(cfg, a, model, tx))
    batch = dict(
        x_lb=jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32),
        y_lb=jnp.asarray(rs.rand(4), jnp.float32),      # float targets
        x_ulb_w=jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32))
    state, m = step(state, batch)
    assert np.isfinite(float(m["total_loss"]))


def test_srpseudolabel_regression_branch():
    rs = np.random.RandomState(0)
    cfg = get_config(dict(
        algorithm="srpseudolabel", net="wrn_28_2", num_classes=1, batch_size=4,
        uratio=1, num_train_iter=40, lr=0.01, optim="SGD", ema_m=0.0,
        img_size=32, compute_dtype="float32", is_regression=True,
        reg_loss="l1_loss", start_timing=1, N_k=2, feature_dim=128))
    model = NETS.get("wrn_28_2")(num_classes=1, dtype=jnp.float32)
    a = ALGORITHMS.get("srpseudolabel")(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, a, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = jax.jit(make_train_step(cfg, a, model, tx))
    for i in range(4):
        batch = dict(
            x_lb=jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32),
            y_lb=jnp.asarray(rs.rand(4), jnp.float32),
            idx_ulb=jnp.asarray(rs.choice(32, 4, replace=False), jnp.int32),
            x_ulb_w=jnp.asarray(rs.randn(4, 32, 32, 3), jnp.float32))
        state, m = step(state, batch)
    assert np.isfinite(float(m["total_loss"]))


@pytest.mark.parametrize("base", ["fixmatch", "pseudolabel", "freematch",
                                  "softmatch"])
def test_all_sr_variants_match_base_before_start_timing(base):
    """Every sr* variant (srfixmatch/srpseudolabel/srfreematch/srsoftmatch,
    reference sr*/ dirs) is bit-identical to its base algorithm until
    start_timing — srflexmatch is covered by the test above."""
    rs = np.random.RandomState(1)
    bs = batches(rs, 2)
    if base == "pseudolabel":
        # pseudolabel consumes only the weak view
        for b in bs:
            b.pop("x_ulb_s", None)
    _, s_base, step_base = build(base)
    _, s_sr, step_sr = build("sr" + base)
    for b in bs:
        s_base, m_base = step_base(s_base, b)
        s_sr, m_sr = step_sr(s_sr, b)
    np.testing.assert_allclose(float(m_base["total_loss"]),
                               float(m_sr["total_loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_base.params),
                     jax.tree_util.tree_leaves(s_sr.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_ref_equivalent_reforward_is_loss_equivalent():
    """bench.py --ref-equivalent restores the reference data_generator's
    redundant device work (sr_reforward=8 backbone re-forwards per stage-2
    step, srflexmatch.py:72-104). The deviation claim is that this work is
    LOSS-equivalent: with a deterministic forward the re-forward logits
    equal the main forward's, so the trained state trajectory must match
    the fast path's step for step."""
    rs = np.random.RandomState(0)
    bs = batches(rs, 3)
    # start_timing=0 puts both variants in stage 2 (reward filtering ON)
    _, s_fast, step_fast = build("srflexmatch", start_timing=0)
    cfg_r, s_ref, _ = build("srflexmatch", start_timing=0)
    cfg_r.extra["sr_reforward"] = 8
    model = NETS.get("wrn_28_2")(num_classes=cfg_r.num_classes,
                                 dtype=jnp.float32)
    a = ALGORITHMS.get("srflexmatch")(cfg_r, {"ulb_dest_len": 32})
    from semireward_tpu.core.step import init_train_state as _init
    s_ref, tx = _init(cfg_r, a, model, jax.random.PRNGKey(0),
                      jnp.zeros((2, 32, 32, 3)))
    step_ref = jax.jit(make_train_step(cfg_r, a, model, tx))
    for b in bs:
        s_fast, m_fast = step_fast(s_fast, b)
        s_ref, m_ref = step_ref(s_ref, b)
    np.testing.assert_allclose(float(m_ref["total_loss"]),
                               float(m_fast["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_ref["util_ratio"]),
                               float(m_fast["util_ratio"]), rtol=1e-6)
    # param drift stays at float-reassociation level (the re-forward program
    # fuses differently; 3 steps of SGD amplify last-ulp differences)
    for x, y in zip(jax.tree_util.tree_leaves(s_fast.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(s_fast.algo),
                    jax.tree_util.tree_leaves(s_ref.algo)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_ref_equivalent_reforward_nlp_dict_batch():
    """The ref-equivalent re-forward scaffold must trace with NLP dict
    batches (int32 token ids): the anti-DCE perturbation is modality-aware
    (float leaves scale by 1+i*1e-45; int leaves add an exact,
    non-foldable zero). Regression for the bench --mode nlp ref arm."""
    from semireward_tpu.models.bert import ClassificationBert
    from semireward_tpu.config import get_config

    rs = np.random.RandomState(0)
    cfg = get_config(dict(algorithm="srflexmatch", num_classes=2,
                          batch_size=2, uratio=1, num_train_iter=8,
                          optim="AdamW", lr=1e-4, ema_m=0.0,
                          max_length=16, compute_dtype="float32",
                          start_timing=0, N_k=2, feature_dim=32,
                          use_cat=False))
    cfg.extra["sr_reforward"] = 3
    model = ClassificationBert(num_classes=2, vocab_size=200, hidden=32,
                               layers=1, heads=2, intermediate=64,
                               max_position=16, dtype=jnp.float32)
    alg = ALGORITHMS.get("srflexmatch")(cfg, {"ulb_dest_len": 16,
                                              "num_features": 32})
    sample = {"input_ids": jnp.zeros((2, 16), jnp.int32),
              "attention_mask": jnp.ones((2, 16), jnp.int32)}
    from semireward_tpu.core.step import init_train_state as _init
    state, tx = _init(cfg, alg, model, jax.random.PRNGKey(0), sample)
    step = jax.jit(make_train_step(cfg, alg, model, tx))

    def tok(n):
        return {"input_ids": jnp.asarray(rs.randint(1, 200, (n, 16)),
                                         jnp.int32),
                "attention_mask": jnp.ones((n, 16), jnp.int32)}

    for i in range(2):
        batch = dict(x_lb=tok(2), y_lb=jnp.asarray([0, 1]),
                     x_ulb_w=tok(2), x_ulb_s=tok(2),
                     idx_ulb=jnp.asarray([2 * i, 2 * i + 1], jnp.int32))
        state, m = step(state, batch)
    assert np.isfinite(float(m["total_loss"]))


def test_auto_split_forward_loss_equivalent_on_stat_free_net():
    """extra['auto_split_forward'] (weak view forward-only on stat-free
    nets — algorithms/base.py) must be loss-equivalent to the concat path:
    with dropout inactive the per-sample math is identical, so one step's
    losses/grads match to float-reassociation tolerance; and it must be a
    NO-OP on BN nets (batch_stats present -> concat semantics kept)."""
    from semireward_tpu.models.vit import VisionTransformer

    rs = np.random.RandomState(0)

    def build_vit(split):
        cfg = get_config(dict(
            algorithm="fixmatch", num_classes=4, batch_size=4, uratio=1,
            num_train_iter=16, optim="SGD", lr=0.05, ema_m=0.0,
            img_size=16, compute_dtype="float32", p_cutoff=0.0))
        if split:
            cfg.extra["auto_split_forward"] = True
        model = VisionTransformer(num_classes=4, img_size=16, patch_size=4,
                                  embed_dim=32, depth=2, num_heads=2,
                                  drop_rate=0.0, dtype=jnp.float32)
        alg = ALGORITHMS.get("fixmatch")(cfg, {"ulb_dest_len": 32})
        state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                     jnp.zeros((2, 16, 16, 3)))
        return state, jax.jit(make_train_step(cfg, alg, model, tx))

    batches = []
    for i in range(3):
        batches.append(dict(
            x_lb=jnp.asarray(rs.randn(4, 16, 16, 3), jnp.float32),
            y_lb=jnp.asarray(rs.randint(0, 4, 4)),
            idx_ulb=jnp.asarray([0, 1, 2, 3], jnp.int32),
            x_ulb_w=jnp.asarray(rs.randn(4, 16, 16, 3), jnp.float32),
            x_ulb_s=jnp.asarray(rs.randn(4, 16, 16, 3), jnp.float32)))

    s_cat, step_cat = build_vit(False)
    s_sp, step_sp = build_vit(True)
    for b in batches:
        s_cat, m_cat = step_cat(s_cat, b)
        s_sp, m_sp = step_sp(s_sp, b)
    np.testing.assert_allclose(float(m_sp["total_loss"]),
                               float(m_cat["total_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m_sp["util_ratio"]),
                               float(m_cat["util_ratio"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(s_cat.params),
                     jax.tree_util.tree_leaves(s_sp.params)):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-9
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-4 * scale)
