"""jit-equivalence + donation/aliasing audits (SURVEY §4 test plan b/§5.2):
eager vs jitted step must agree bitwise-closely, resumed RNG streams must
be reproducible, and donated buffers must never be read after the call."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import semireward_tpu  # noqa: F401
from semireward_tpu.config import get_config
from semireward_tpu.registry import ALGORITHMS, NETS
from semireward_tpu.core.step import init_train_state, make_train_step


def setup(alg="flexmatch"):
    cfg = get_config(dict(
        algorithm=alg, net="wrn_28_2", num_classes=4, batch_size=4, uratio=1,
        num_train_iter=40, lr=0.01, optim="SGD", ema_m=0.999, img_size=32,
        compute_dtype="float32", start_timing=2, N_k=2, feature_dim=128))
    model = NETS.get("wrn_28_2")(num_classes=4, dtype=jnp.float32)
    a = ALGORITHMS.get(alg)(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, a, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    return cfg, a, model, state, make_train_step(cfg, a, model, tx)


def mkbatch(rs, n=4):
    return dict(
        x_lb=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32),
        y_lb=jnp.asarray(rs.randint(0, 4, n)),
        idx_ulb=jnp.asarray(rs.choice(32, n, replace=False), jnp.int32),
        x_ulb_w=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32),
        x_ulb_s=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32))


class TestJitEquivalence:
    def test_eager_matches_jit(self, rs):
        cfg, a, model, state, step = setup()
        batch = mkbatch(rs)
        s_eager, m_eager = step(state, batch)          # traced eagerly
        s_jit, m_jit = jax.jit(step)(state, batch)
        np.testing.assert_allclose(float(m_eager["total_loss"]),
                                   float(m_jit["total_loss"]), rtol=1e-5)
        for a_, b_ in zip(jax.tree_util.tree_leaves(s_eager.params),
                          jax.tree_util.tree_leaves(s_jit.params)):
            # fusion reorders float reductions; tolerance covers it
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-3, atol=2e-5)

    def test_step_is_deterministic_given_state(self, rs):
        """Same state + batch -> identical result: PRNG is derived from
        (root key, step), never from global state."""
        cfg, a, model, state, step = setup()
        jstep = jax.jit(step)
        batch = mkbatch(rs)
        s1, m1 = jstep(state, batch)
        s2, m2 = jstep(state, batch)
        assert float(m1["total_loss"]) == float(m2["total_loss"])
        for a_, b_ in zip(jax.tree_util.tree_leaves(s1.params),
                          jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))

    def test_resume_reproduces_stream(self, rs):
        """Running 4 steps straight == running 2, snapshotting, running 2
        more — byte-identical params (checkpoint/resume determinism)."""
        cfg, a, model, state, step = setup()
        jstep = jax.jit(step)
        batches = [mkbatch(rs) for _ in range(4)]
        sA = state
        for b in batches:
            sA, _ = jstep(sA, b)
        sB = state
        for b in batches[:2]:
            sB, _ = jstep(sB, b)
        # "checkpoint": roundtrip through host numpy
        snap = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)), sB)
        for b in batches[2:]:
            snap, _ = jstep(snap, b)
        for a_, b_ in zip(jax.tree_util.tree_leaves(sA.params),
                          jax.tree_util.tree_leaves(snap.params)):
            np.testing.assert_array_equal(np.asarray(a_), np.asarray(b_))


class TestDonation:
    def test_donated_state_not_reused(self, rs):
        """donate_argnums=0 invalidates the input state — the trainer must
        never touch it again. This asserts jax actually flags reuse (the
        aliasing audit from SURVEY §5.2)."""
        cfg, a, model, state, step = setup("fixmatch")
        jstep = jax.jit(step, donate_argnums=0)
        batch = mkbatch(rs)
        new_state, _ = jstep(state, batch)
        with pytest.raises(Exception):
            _ = float(jnp.sum(jax.tree_util.tree_leaves(state.params)[0]))

    def test_donation_chain_runs(self, rs):
        cfg, a, model, state, step = setup("fixmatch")
        jstep = jax.jit(step, donate_argnums=0)
        for i in range(3):
            state, m = jstep(state, mkbatch(rs))
        assert int(state.step) == 3

    def test_no_aliased_leaves_in_any_initial_state(self):
        """No two leaves of ANY algorithm's initial TrainState may alias one
        buffer: the state is donated every step, and a double-donation is an
        INVALID_ARGUMENT on the TPU runtime (found live: FreeState init
        shared one array between p_model and label_hist — CPU tolerated it,
        the chip did not)."""
        import semireward_tpu.imb  # noqa: F401
        from semireward_tpu.registry import IMB_ALGORITHMS

        model = NETS.get("wrn_28_2")(num_classes=4, dtype=jnp.float32,
                                     depth=10)
        di = {"ulb_dest_len": 64, "lb_dest_len": 32,
              "lb_class_dist": np.full(4, 0.25), "num_features": 128}

        def cfg_for(alg, imb=""):
            return get_config(dict(
                algorithm=alg, net="wrn_28_2", num_classes=4, batch_size=4,
                uratio=1, num_train_iter=40, epoch=4, lr=0.01, optim="SGD",
                ema_m=0.999, img_size=32, compute_dtype="float32",
                start_timing=2, N_k=2, feature_dim=128, queue_batch=2,
                da_len=8, proj_size=16, imb_algorithm=imb))

        def assert_unique(name, alg, cfg):
            m = alg.wrap_model(model)
            state, _ = init_train_state(cfg, alg, m, jax.random.PRNGKey(0),
                                        jnp.zeros((2, 32, 32, 3)))
            # host-side state transforms must not introduce aliases either
            # (found live: Dash's set_rho_init assigned one array to both
            # rho_init and rho)
            if hasattr(alg, "set_rho_init"):
                state = state.replace(algo=alg.set_rho_init(state.algo, 0.5))
            leaves = [l for l in jax.tree_util.tree_leaves(state)
                      if hasattr(l, "shape")]
            ids = [id(l) for l in leaves]
            assert len(ids) == len(set(ids)), f"{name}: aliased state leaves"

        for name in ALGORITHMS.keys():
            cfg = cfg_for(name)
            assert_unique(name, ALGORITHMS.get(name)(cfg, dict(di)), cfg)
        for iname in IMB_ALGORITHMS.keys():
            cfg = cfg_for("fixmatch", iname)
            alg = IMB_ALGORITHMS.get(iname)(
                cfg, dict(di), base_cls=ALGORITHMS.get("fixmatch"))
            assert_unique(f"fixmatch+{iname}", alg, cfg)


class TestBf16Grads:
    def test_bf16_grads_close_to_f32_and_trains(self, rs):
        """The bench A/B arm cfg.extra['bf16_grads'] (core/step.py):
        cotangents flow in bf16 with f32 restored at the optimizer
        boundary. Contract: grads stay f32-typed at the optimizer (the
        update must not change param dtypes) and one step lands within
        bf16 rounding of the f32-cotangent step."""
        cfg, a, model, state, step = setup()
        cfg.extra["bf16_grads"] = True
        from semireward_tpu.core import optim as optim_lib
        tx = optim_lib.build_optimizer(
            state.params, optim_name=cfg.optim, lr=cfg.lr,
            momentum=cfg.momentum, weight_decay=cfg.weight_decay,
            layer_decay=cfg.layer_decay,
            num_training_steps=cfg.num_train_iter,
            num_warmup_steps=cfg.num_warmup_iter, clip_grad=cfg.grad_clip)
        step_b = make_train_step(cfg, a, model, tx)
        batch = mkbatch(rs)
        s32, m32 = jax.jit(step)(state, batch)
        sb, mb = jax.jit(step_b)(state, batch)
        assert np.isfinite(float(mb["total_loss"]))
        np.testing.assert_allclose(float(mb["total_loss"]),
                                   float(m32["total_loss"]),
                                   rtol=2e-2, atol=1e-3)
        for p32, pb in zip(jax.tree_util.tree_leaves(s32.params),
                           jax.tree_util.tree_leaves(sb.params)):
            assert pb.dtype == p32.dtype
            # one SGD step: bf16 grad rounding (~0.4% relative) x lr
            np.testing.assert_allclose(np.asarray(pb), np.asarray(p32),
                                       rtol=0.05, atol=3e-3)
