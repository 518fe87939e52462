"""K-step lockstep parity against the GENUINE reference source (VERDICT r2
item 6).

Every other torch-parity test re-derives the reference math by hand; these
import the reference's own torch modules via importlib file loading
(bypassing the torchvision-blocked package ``__init__``) and drive K steps
of reference-vs-rebuild on identical inputs with grafted weights:

- flexmatch/utils.py:11-63   FlexMatchThresholdingHook (selected_label /
  classwise_acc / mask trajectories)
- freematch/utils.py:10-66   FreeMatchThresholdingHook (time_p / p_model /
  label_hist / mask)
- softmatch/utils.py:12-77   SoftMatchWeightingHook (Gaussian mu / var /
  soft mask)
- semireward/semireward.py   Rewarder forward + Adam training trajectory,
  EMARewarder shadow, Generator forward + the ``.long()`` gradient block,
  cosine_similarity_n / label_dim helpers

The hooks are exercised exactly as the reference train_step calls them
(probs precomputed, ``softmax_x_ulb=False`` — srflexmatch.py:135-141).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import semireward_tpu  # noqa: F401
from semireward_tpu.algorithms import common as C

torch = pytest.importorskip("torch")

REF = "/root/reference/semilearn"


def _file_mod(fqname: str, path: str):
    if fqname in sys.modules:
        return sys.modules[fqname]
    spec = importlib.util.spec_from_file_location(fqname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fqname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Load the reference's torch-only modules from their source files.

    Only PLUMBING is stubbed (`concat_all_gather`, never reached with
    distributed=False, and the parent package objects); every line of
    algorithm math executes from the reference's own files.
    """
    for pkg in ("semilearn", "semilearn.core", "semilearn.algorithms"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
    _file_mod("semilearn.core.hooks", f"{REF}/core/hooks/hook.py")
    _file_mod("semilearn.algorithms.hooks", f"{REF}/algorithms/hooks/masking.py")
    if "semilearn.algorithms.utils" not in sys.modules:
        stub = types.ModuleType("semilearn.algorithms.utils")
        stub.concat_all_gather = lambda t: t  # dist-off path never calls it
        sys.modules["semilearn.algorithms.utils"] = stub
    return types.SimpleNamespace(
        semireward=_file_mod("ref_sr", f"{REF}/algorithms/semireward/semireward.py"),
        flexmatch=_file_mod("ref_flex_utils", f"{REF}/algorithms/flexmatch/utils.py"),
        freematch=_file_mod("ref_free_utils", f"{REF}/algorithms/freematch/utils.py"),
        softmatch=_file_mod("ref_soft_utils", f"{REF}/algorithms/softmatch/utils.py"),
    )


def _probs(rs, B, C_):
    logits = rs.randn(B, C_).astype(np.float32) * 3.0
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


# ---------------------------------------------------------------------------
# Masking-hook state trajectories
# ---------------------------------------------------------------------------

def test_flexmatch_hook_lockstep(ref, rs):
    K, B, NC, ULB = 12, 16, 4, 48
    alg = types.SimpleNamespace(p_cutoff=0.7)
    hook = ref.flexmatch.FlexMatchThresholdingHook(ulb_dest_len=ULB,
                                                   num_classes=NC)
    state = C.flex_init(ULB, NC)
    for t in range(K):
        probs = _probs(rs, B, NC)
        idx = rs.choice(ULB, B, replace=False).astype(np.int64)
        m_ref = hook.masking(alg, torch.tensor(probs), torch.tensor(idx),
                             softmax_x_ulb=False)
        state, m_jax = C.flex_mask(state, jnp.asarray(probs),
                                   jnp.asarray(idx, jnp.int32), 0.7)
        np.testing.assert_allclose(np.asarray(m_jax), m_ref.numpy(),
                                   atol=1e-6, err_msg=f"mask diverged @t={t}")
        np.testing.assert_array_equal(
            np.asarray(state.selected_label), hook.selected_label.numpy(),
            err_msg=f"selected_label diverged @t={t}")
        np.testing.assert_allclose(
            np.asarray(state.classwise_acc), hook.classwise_acc.numpy(),
            atol=1e-6, err_msg=f"classwise_acc diverged @t={t}")


@pytest.mark.parametrize("use_quantile,clip_thresh", [(False, False),
                                                      (False, True),
                                                      (True, False)])
def test_freematch_hook_lockstep(ref, rs, use_quantile, clip_thresh):
    K, B, NC = 12, 16, 4
    alg = types.SimpleNamespace(distributed=False, world_size=1,
                                use_quantile=use_quantile,
                                clip_thresh=clip_thresh)
    hook = ref.freematch.FreeMatchThresholdingHook(num_classes=NC,
                                                   momentum=0.99)
    state = C.free_init(NC)
    for t in range(K):
        probs = _probs(rs, B, NC)
        m_ref = hook.masking(alg, torch.tensor(probs), softmax_x_ulb=False)
        state, m_jax = C.free_mask(state, jnp.asarray(probs), momentum=0.99,
                                   use_quantile=use_quantile,
                                   clip_thresh=clip_thresh)
        np.testing.assert_allclose(np.asarray(m_jax), m_ref.numpy(),
                                   atol=1e-6, err_msg=f"mask @t={t}")
        np.testing.assert_allclose(float(state.time_p),
                                   float(hook.time_p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.p_model),
                                   hook.p_model.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(state.label_hist),
                                   hook.label_hist.numpy(), atol=1e-6)


def test_softmatch_hook_lockstep(ref, rs):
    # per_class=False only: the reference's per_class init dereferences
    # self.args (softmatch/utils.py:28) which the hook never has — that
    # branch cannot be constructed from the genuine source.
    K, B, NC = 12, 16, 4
    alg = types.SimpleNamespace(distributed=False, world_size=1)
    hook = ref.softmatch.SoftMatchWeightingHook(num_classes=NC, n_sigma=2,
                                                momentum=0.99)
    state = C.softmatch_init(NC)
    for t in range(K):
        probs = _probs(rs, B, NC)
        m_ref = hook.masking(alg, torch.tensor(probs), softmax_x_ulb=False)
        state, m_jax = C.softmatch_mask(state, jnp.asarray(probs),
                                        n_sigma=2.0, momentum=0.99)
        np.testing.assert_allclose(np.asarray(m_jax), m_ref.numpy(),
                                   atol=1e-5, err_msg=f"mask @t={t}")
        np.testing.assert_allclose(float(state.prob_max_mu_t),
                                   float(hook.prob_max_mu_t), atol=1e-6)
        np.testing.assert_allclose(float(state.prob_max_var_t),
                                   float(hook.prob_max_var_t), atol=1e-6)


# ---------------------------------------------------------------------------
# Rewarder / Generator / EMARewarder
# ---------------------------------------------------------------------------

FDIM, LDIM = 48, 100


def _flax_rewarder(seed=0):
    from semireward_tpu.algorithms.semireward import Rewarder
    rew = Rewarder(label_dim=LDIM, label_embedding_dim=128, feature_dim=FDIM)
    params = rew.init(jax.random.PRNGKey(seed),
                      jnp.zeros((2, FDIM)), jnp.zeros((2,), jnp.int32))["params"]
    return rew, params


def _graft_rewarder(tmod, params):
    """flax params -> torch state_dict (Linear weights transpose)."""
    p = jax.tree_util.tree_map(np.asarray, params)
    sd = {"label_embedding.weight": p["label_embedding"]["embedding"]}
    for lin in ("feature_fc", "cross_attention_fc", "mlp_fc1", "mlp_fc2",
                "ffn_fc1", "ffn_fc2"):
        sd[lin + ".weight"] = p[lin]["kernel"].T
        sd[lin + ".bias"] = p[lin]["bias"]
    for ln in ("feature_norm", "label_norm"):
        sd[ln + ".weight"] = p[ln]["scale"]
        sd[ln + ".bias"] = p[ln]["bias"]
    tmod.load_state_dict({k: torch.tensor(np.ascontiguousarray(v))
                          for k, v in sd.items()})
    return tmod


def test_rewarder_forward_matches_reference_source(ref, rs):
    rew, params = _flax_rewarder()
    tmod = _graft_rewarder(ref.semireward.Rewarder(LDIM, 128, FDIM), params)
    feats = rs.randn(16, FDIM).astype(np.float32)
    labels = rs.randint(0, LDIM, 16)
    with torch.no_grad():
        r_ref = tmod(torch.tensor(feats), torch.tensor(labels)).numpy()
    r_jax = np.asarray(rew.apply({"params": params}, jnp.asarray(feats),
                                 jnp.asarray(labels, jnp.int32)))
    np.testing.assert_allclose(r_jax, r_ref, atol=1e-6)


def test_rewarder_adam_training_lockstep(ref, rs):
    """K optimizer steps of the reference's two-backward accumulation
    (srflexmatch.py:183-208: MSE(reward,1) + MSE(reward,target), one Adam
    step) against our summed-loss grad — parameter trajectories match."""
    from semireward_tpu.core.optim import build_adam
    import optax

    rew, params = _flax_rewarder()
    tmod = _graft_rewarder(ref.semireward.Rewarder(LDIM, 128, FDIM), params)
    topt = torch.optim.Adam(tmod.parameters(), lr=5e-4)
    adam = build_adam(5e-4)
    opt_state = adam.init(params)
    criterion = torch.nn.MSELoss()

    def jax_step(params, opt_state, feats, labels, target):
        def loss_fn(p):
            reward = rew.apply({"params": p}, feats, labels)
            return (jnp.mean((reward - 1.0) ** 2)
                    + jnp.mean((reward - target) ** 2))
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = adam.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    jstep = jax.jit(jax_step)
    for t in range(8):
        feats = rs.randn(16, FDIM).astype(np.float32)
        labels = rs.randint(0, LDIM, 16)
        target = rs.rand(16, 1).astype(np.float32)

        reward = tmod(torch.tensor(feats), torch.tensor(labels))
        gen_loss = criterion(reward, torch.ones_like(reward))
        rew_loss = criterion(reward, torch.tensor(target))
        topt.zero_grad()
        gen_loss.backward(retain_graph=True)
        rew_loss.backward()
        topt.step()

        params, opt_state = jstep(params, opt_state, jnp.asarray(feats),
                                  jnp.asarray(labels, jnp.int32),
                                  jnp.asarray(target))
        got = np.asarray(params["ffn_fc2"]["kernel"]).T
        want = tmod.ffn_fc2.weight.detach().numpy()
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"ffn_fc2 diverged @t={t}")
    # whole-tree check after K steps
    p = jax.tree_util.tree_map(np.asarray, params)
    np.testing.assert_allclose(p["feature_fc"]["kernel"].T,
                               tmod.feature_fc.weight.detach().numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(p["label_embedding"]["embedding"],
                               tmod.label_embedding.weight.detach().numpy(),
                               atol=2e-5)


def test_ema_rewarder_shadow_lockstep(ref, rs):
    """k reference forwards (each runs update_ema, semireward.py:94-127)
    with constant params == our decay^k folding."""
    _, params = _flax_rewarder()
    tmod = _graft_rewarder(ref.semireward.EMARewarder(LDIM, 128, FDIM,
                                                      ema_decay=0.9), params)
    tmod.initialize_ema()  # re-snapshot AFTER grafting
    # perturb the shadow so e0 != p (otherwise the EMA is a fixed point)
    with torch.no_grad():
        for name, _ in tmod.named_parameters():
            tmod.ema_params[name].data.add_(0.1)
    e0 = {n: p.data.clone() for n, p in tmod.ema_params.items()}

    k = 5
    feats = torch.tensor(rs.randn(8, FDIM).astype(np.float32))
    labels = torch.tensor(rs.randint(0, LDIM, 8))
    with torch.no_grad():
        for _ in range(k):
            tmod(feats, labels)

    d_k = 0.9 ** k
    for name, param in tmod.named_parameters():
        want = e0[name] * d_k + (1 - d_k) * param.data
        np.testing.assert_allclose(tmod.ema_params[name].data.numpy(),
                                   want.numpy(), atol=1e-6,
                                   err_msg=f"EMA folding wrong for {name}")


def test_generator_forward_and_long_gradient_block(ref, rs):
    """Generator forward parity + the reference's ``.long()`` cast really
    does block all gradients to the generator (srflexmatch.py:158-208), so
    our never-updating gen_params are faithful."""
    from semireward_tpu.algorithms.semireward import Generator
    gen = Generator(feature_dim=FDIM)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((2, FDIM)))["params"]
    p = jax.tree_util.tree_map(np.asarray, params)
    tgen = ref.semireward.Generator(FDIM)
    sd = {}
    for i in range(4):  # flax fc0..fc3 <-> torch fc_layers.{0,2,4,6}
        sd[f"fc_layers.{2 * i}.weight"] = torch.tensor(
            np.ascontiguousarray(p[f"fc{i}"]["kernel"].T))
        sd[f"fc_layers.{2 * i}.bias"] = torch.tensor(p[f"fc{i}"]["bias"])
    tgen.load_state_dict(sd)

    feats = rs.randn(16, FDIM).astype(np.float32)
    with torch.no_grad():
        g_ref = tgen(torch.tensor(feats)).numpy()
    g_jax = np.asarray(gen.apply({"params": params}, jnp.asarray(feats)))
    np.testing.assert_allclose(g_jax, g_ref, atol=1e-6)

    # reference stage-1 generator step: loss flows only through .long()
    trew = ref.semireward.Rewarder(LDIM, 128, FDIM)
    gopt = torch.optim.Adam(tgen.parameters(), lr=5e-4)
    before = [q.detach().clone() for q in tgen.parameters()]
    generated_label = tgen(torch.tensor(feats)).long()  # gradient dies here
    reward = trew(torch.tensor(feats), generated_label.squeeze(1))
    generator_loss = torch.nn.MSELoss()(reward, torch.ones_like(reward))
    gopt.zero_grad()
    generator_loss.backward(retain_graph=True)
    gopt.step()
    for q, b in zip(tgen.parameters(), before):
        assert torch.equal(q.detach(), b), \
            "generator params moved — .long() did NOT block the gradient?!"
    assert all(q.grad is None or torch.all(q.grad == 0)
               for q in tgen.parameters())


def test_helper_functions_against_reference_source(ref, rs):
    from semireward_tpu.algorithms.semireward import (cosine_similarity_n,
                                                      label_dim)
    x = rs.randn(16, 10).astype(np.float32)
    y = rs.randn(16, 10).astype(np.float32)
    want = ref.semireward.cosine_similarity_n(torch.tensor(x),
                                              torch.tensor(y)).numpy()
    got = np.asarray(cosine_similarity_n(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert label_dim(4) == ref.semireward.label_dim(4) == 100
    assert label_dim(250) == ref.semireward.label_dim(250) == 250
