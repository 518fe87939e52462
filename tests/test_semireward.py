"""SemiReward module + protocol tests (reference semireward.py,
srflexmatch.py)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from semireward_tpu.algorithms.semireward import (
    Generator, Rewarder, cosine_similarity_n, label_dim, sr_decay,
    init_sr_state,
)
from semireward_tpu.config import get_config


class TestHelpers:
    def test_label_dim(self):
        # reference semireward.py:147-148
        assert label_dim(10) == 100
        assert label_dim(100) == 100
        assert label_dim(1000) == 1000

    def test_cosine_similarity_n_vs_torch(self, rs):
        x = rs.randn(6, 10).astype(np.float32)
        y = rs.randn(6, 10).astype(np.float32)
        ours = np.asarray(cosine_similarity_n(jnp.asarray(x), jnp.asarray(y)))
        cs = torch.cosine_similarity(torch.tensor(x), torch.tensor(y), dim=-1,
                                     eps=1e-8)
        ref = ((cs + 1) / 2).view(6, 1).numpy()
        assert ours.shape == (6, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_sr_decay(self):
        # int(max(8, 1 + T/it)) — reference algorithmbase.py:177-183
        T = 1024
        for it, want in [(1, 1025), (100, 11), (512, 8), (1000, 8)]:
            got = int(sr_decay(jnp.asarray(it), T))
            assert got == want, (it, got, want)


class TestModules:
    def test_rewarder_shape_and_range(self, rs):
        r = Rewarder(label_dim=100, label_embedding_dim=128, feature_dim=32)
        params = r.init(jax.random.PRNGKey(0), jnp.zeros((4, 32)),
                        jnp.zeros((4,), jnp.int32))
        out = r.apply(params, jnp.asarray(rs.randn(4, 32), jnp.float32),
                      jnp.asarray([1, 5, 99, 0]))
        assert out.shape == (4, 1)
        assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))

    def test_rewarder_cross_attention_is_batch_dim(self, rs):
        """Permuting the batch must permute rewards but keep the shared
        context identical — the attention pools over the batch dim
        (reference semireward.py:60-62)."""
        r = Rewarder(label_dim=100, feature_dim=16)
        feats = jnp.asarray(rs.randn(6, 16), jnp.float32)
        labels = jnp.asarray(rs.randint(0, 100, 6))
        params = r.init(jax.random.PRNGKey(0), feats, labels)
        out = np.asarray(r.apply(params, feats, labels))
        perm = np.asarray([3, 1, 5, 0, 2, 4])
        out_p = np.asarray(r.apply(params, feats[perm], labels[perm]))
        np.testing.assert_allclose(out_p, out[perm], rtol=1e-5, atol=1e-6)

    def test_generator_nonnegative_output(self, rs):
        g = Generator(feature_dim=16)
        params = g.init(jax.random.PRNGKey(0), jnp.zeros((4, 16)))
        out = g.apply(params, jnp.asarray(rs.randn(4, 16), jnp.float32))
        assert out.shape == (4, 1)
        assert np.all(np.asarray(out) >= 0)


def _tiny_sr_setup(start_timing=3, N_k=2, **overrides):
    from semireward_tpu.registry import ALGORITHMS, NETS
    from semireward_tpu.core.step import init_train_state, make_train_step
    cfg = get_config(dict(
        algorithm="srfixmatch", net="wrn_28_2", num_classes=10, batch_size=4,
        uratio=1, num_train_iter=64, lr=0.01, optim="SGD", ema_m=0.0,
        img_size=32, start_timing=start_timing, N_k=N_k, feature_dim=128,
        sr_ema=True, sr_ema_m=0.9, p_cutoff=0.0, compute_dtype="float32",
        **overrides))
    model = NETS.get("wrn_28_2")(num_classes=10, dtype=jnp.float32)
    alg = ALGORITHMS.get("srfixmatch")(cfg, {"ulb_dest_len": 64})
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = jax.jit(make_train_step(cfg, alg, model, tx))
    return cfg, state, step


def _batch(rs, n=4):
    return dict(
        x_lb=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32),
        y_lb=jnp.asarray(rs.randint(0, 10, n)),
        idx_ulb=jnp.asarray(rs.choice(64, n, replace=False)),
        x_ulb_w=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32),
        x_ulb_s=jnp.asarray(rs.randn(n, 32, 32, 3), jnp.float32))


class TestProtocol:
    def test_generator_never_trains(self, rs):
        """The .long() cast blocks all generator gradients in the reference
        (srflexmatch.py:158-208) — generator params must never change."""
        cfg, state, step = _tiny_sr_setup()
        g0 = jax.tree_util.tree_map(np.asarray, state.sr.gen_params)
        for _ in range(6):
            state, _ = step(state, _batch(rs))
        g1 = jax.tree_util.tree_map(np.asarray, state.sr.gen_params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(a, b)

    def test_stage_boundaries(self, rs):
        """it=0: no SR training. 0<it<start: rewarder trains every step.
        it==start: tracking only. it>start: train only on N_k steps."""
        cfg, state, step = _tiny_sr_setup(start_timing=3, N_k=2)

        def rew_snapshot(s):
            return np.concatenate([np.asarray(l).ravel() for l in
                                   jax.tree_util.tree_leaves(s.sr.rewarder_params)])

        snaps = [rew_snapshot(state)]
        for i in range(7):
            state, _ = step(state, _batch(rs))
            snaps.append(rew_snapshot(state))
        changed = [not np.array_equal(snaps[i], snaps[i + 1]) for i in range(7)]
        # step consuming it=0 -> no train; it=1,2 -> stage1 trains;
        # it=3 (==start) -> no train; it>3: trains iff it % N_k == 0
        assert changed[0] is False
        assert changed[1] is True and changed[2] is True
        assert changed[3] is False
        assert changed[4] is True   # it=4, 4%2==0 and 4>3
        assert changed[5] is False  # it=5
        assert changed[6] is True   # it=6

    def test_max_reward_resets_on_nk(self, rs):
        cfg, state, step = _tiny_sr_setup(start_timing=1, N_k=3)
        seen_reset = seen_track = False
        for i in range(8):
            state, m = step(state, _batch(rs))
            it = int(state.step) - 1
            mr = float(state.sr.max_reward)
            if it > 1 and it % 3 == 0:
                assert mr == -np.inf
                seen_reset = True
            elif it >= 1:
                assert np.isfinite(mr)
                seen_track = True
        assert seen_reset and seen_track

    def test_mask2_filters_loss(self, rs):
        """Stage-2 unsup loss must differ from the plain masked loss when
        rewards split the batch."""
        cfg, state, step = _tiny_sr_setup(start_timing=2)
        losses = []
        for i in range(6):
            state, m = step(state, _batch(rs))
            losses.append(float(m["sr_keep_ratio"]))
        # before stage 2 the keep ratio is reported as 1
        assert losses[0] == 1.0 and losses[1] == 1.0

    def test_ema_rewarder_shadow_moves(self, rs):
        cfg, state, step = _tiny_sr_setup(start_timing=3)
        e0 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.sr.rewarder_ema_params))
        for _ in range(4):
            state, _ = step(state, _batch(rs))
        e1 = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, state.sr.rewarder_ema_params))
        assert any(not np.array_equal(a, b) for a, b in zip(e0, e1))


class TestPerSampleMode:
    """Beyond-reference opt-in: cfg.sr_per_sample (see DEVIATIONS.md).
    Default-off mode must stay bit-faithful to the reference; the variant
    must actually produce feature-dependent (per-sample) rewards."""

    def test_param_tree_identical_across_modes(self):
        k = jax.random.PRNGKey(0)
        feats = jax.random.normal(k, (6, 32))
        labels = jnp.zeros((6,), jnp.int32)
        shapes = []
        for ps in (False, True):
            rew = Rewarder(label_dim=100, feature_dim=32, per_sample=ps)
            params = rew.init(k, feats, labels)["params"]
            shapes.append(jax.tree_util.tree_map(lambda a: a.shape, params))
        assert shapes[0] == shapes[1]

    def test_per_sample_rewards_are_feature_dependent(self):
        """Faithful mode: same label => identical reward (the class-level
        limitation documented in docs/quality.md). Per-sample mode: rewards
        must differ across samples sharing a label."""
        k = jax.random.PRNGKey(1)
        feats = jax.random.normal(k, (6, 32))
        labels = jnp.asarray([2, 2, 2, 5, 5, 5], jnp.int32)
        ref = Rewarder(label_dim=100, feature_dim=32, per_sample=False)
        ps = Rewarder(label_dim=100, feature_dim=32, per_sample=True)
        p0 = ref.init(k, feats, labels)["params"]
        p1 = ps.init(k, feats, labels)["params"]
        r0 = np.asarray(ref.apply({"params": p0}, feats, labels)).squeeze(-1)
        r1 = np.asarray(ps.apply({"params": p1}, feats, labels)).squeeze(-1)
        np.testing.assert_allclose(r0[0], r0[1])
        np.testing.assert_allclose(r0[3], r0[5])
        assert not np.allclose(r1[0], r1[1])
        assert not np.allclose(r1[3], r1[5])

    def test_per_sample_step_trains_rewarder(self, rs):
        """The jitted step with sr_per_sample=True must run both stages and
        move the rewarder params (candidate training on the labeled batch)."""
        cfg, state, step = _tiny_sr_setup(start_timing=3, N_k=2,
                                          sr_per_sample=True)
        r0 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            np.asarray, state.sr.rewarder_params))
        for _ in range(6):  # crosses start_timing=3 and an N_k boundary
            state, m = step(state, _batch(rs))
        r1 = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            np.asarray, state.sr.rewarder_params))
        assert any(not np.array_equal(a, b) for a, b in zip(r0, r1))
        assert np.isfinite(float(m["total_loss"]))

    def test_learned_per_sample_scorer_separates_pairs(self):
        """Train the per-sample rewarder with the variant's candidate
        objective on separable features; it must then score correct
        (feature, label) pairs above mismatched ones PER SAMPLE within a
        single mixed batch — the capability the faithful architecture
        cannot express (docs/quality.md)."""
        import optax
        from semireward_tpu.algorithms.semireward import cosine_similarity_n

        C, D, B = 4, 16, 32
        k = jax.random.PRNGKey(2)
        protos = jax.random.normal(k, (C, D)) * 3.0
        rew = Rewarder(label_dim=100, feature_dim=D, per_sample=True)
        params = rew.init(k, jnp.zeros((2, D)), jnp.zeros((2,), jnp.int32))[
            "params"]
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def train_step(params, opt, key):
            ky, kn, kc = jax.random.split(key, 3)
            y = jax.random.randint(ky, (B,), 0, C)
            feats = protos[y] + 0.1 * jax.random.normal(kn, (B, D))
            cand = jax.random.randint(kc, (B,), 0, C)
            labels = jnp.concatenate([y, cand])
            feats2 = jnp.concatenate([feats, feats])
            refs = jnp.concatenate([y, y])
            target = cosine_similarity_n(jax.nn.one_hot(labels, C),
                                         jax.nn.one_hot(refs, C))

            def loss_fn(p):
                r = rew.apply({"params": p}, feats2, labels)
                return jnp.mean((r - target) ** 2)

            g = jax.grad(loss_fn)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt

        key = jax.random.PRNGKey(3)
        for i in range(300):
            key, k1 = jax.random.split(key)
            params, opt = train_step(params, opt, k1)

        # one mixed batch: half correct pairs, half shifted labels
        ky, kn = jax.random.split(jax.random.PRNGKey(4))
        y = jax.random.randint(ky, (B,), 0, C)
        feats = protos[y] + 0.1 * jax.random.normal(kn, (B, D))
        wrong = (y + 1) % C
        labels = jnp.concatenate([y[: B // 2], wrong[B // 2:]])
        r = np.asarray(rew.apply({"params": params}, feats, labels)).squeeze(-1)
        good, bad = r[: B // 2].mean(), r[B // 2:].mean()
        assert good > bad + 0.1, (good, bad)
