"""SemiReward (ICLR 2024, https://arxiv.org/abs/2310.03013) — TPU-native.

Rebuild of reference semilearn/algorithms/semireward/semireward.py plus the
five sr* algorithm variants (srpseudolabel / srfixmatch / srflexmatch /
srfreematch / srsoftmatch). The reference copy-pastes the protocol into five
classes; here ONE wrapper combinator (:class:`SemiRewardWrapper`) composes
with any registered base algorithm — behavior identical, flagged as a
structural deviation.

Semantics preserved exactly (cited against srflexmatch/srflexmatch.py):
- Rewarder with the reference's batch-dim "cross-attention" (a softmax over
  the concat of feature and label-embedding rows, semireward.py:60-62).
- Two-stage protocol keyed on ``start_timing`` (train_step:147-208):
  stage 1 trains rewarder on labeled data every step; stage 2 filters the
  unlabeled loss by ``reward >= mean(reward)`` (mask2) and trains the
  rewarder every ``N_k`` steps on the current batch snapshot.
- ``generator_loss.backward()`` in the reference can reach no generator
  parameter — the generator output passes through ``.long()``
  (srflexmatch.py:158-162), a non-differentiable cast — so the generator's
  Adam step is a no-op forever. We reproduce that: generator params are
  carried, used for forward scoring targets, and never updated.
- ``max_reward`` tracking: the reference updates max_reward FIRST and then
  gates the snapshot on ``reward > max_reward`` (srflexmatch.py:170-172),
  which is always False — the snapshot is simply the current batch. We use
  the current batch directly.

Deviation for speed (documented, loss-equivalent): the reference's
``data_generator`` re-runs the FULL backbone forward ``sr_decay()`` (8-53)
times per stage-2 step and keeps only the LAST loss (srflexmatch.py:72-104).
With a deterministic forward those logits equal the main forward's, so we
reuse them (``sr_reforward=1``). The loop's only real side effect — repeated
masking-hook state updates (FreeMatch/SoftMatch EMAs) — IS reproduced via a
``lax.fori_loop`` over the cheap mask-update alone.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import consistency_loss
from semireward_tpu.core.optim import build_adam
from semireward_tpu.core.train_state import SRState
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx

from semireward_tpu.models.initializers import (
    torch_kernel_init as torch_linear_init, torch_bias_init)


def label_dim(x: int, default_dim: int = 100) -> int:
    """reference semireward.py:147-148."""
    return int(max(default_dim, x))


def cosine_similarity_n(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity mapped to [0,1], shape [B,1]
    (reference semireward.py:130-139)."""
    eps = 1e-8
    num = jnp.sum(x * y, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(x, axis=-1), eps) * jnp.maximum(
        jnp.linalg.norm(y, axis=-1), eps)
    cos = num / den
    return ((cos + 1.0) / 2.0).reshape(x.shape[0], 1)


def add_gaussian_noise(rng, x, mean=0.0, std=1.0):
    """reference semireward.py:142-145."""
    return x + jax.random.normal(rng, x.shape, x.dtype) * std + mean


class Generator(nn.Module):
    """Fake-label generator MLP (reference semireward.py:6-24).
    Output passes through a final ReLU; callers cast to int for a label."""

    feature_dim: int = 384

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32)
        for i, h in enumerate((256, 128, 64, 1)):
            x = nn.Dense(h, kernel_init=torch_linear_init,
                         bias_init=torch_bias_init, name=f"fc{i}")(x)
            if h != 1:
                x = nn.relu(x)
        return nn.relu(x)


class Rewarder(nn.Module):
    """Pseudo-label reward model (reference semireward.py:27-72).

    The "cross-attention" is faithful to the reference's unusual form: a
    softmax over the BATCH-dim concat of projected features and label
    embeddings, weighted-summed to a single 128-vector that is broadcast-added
    to the label embeddings.

    ``per_sample=True`` (beyond-reference, opt-in via ``cfg.sr_per_sample``):
    the same layers re-read as the per-sample cross-attention the SemiReward
    paper describes — for each sample the softmax runs over ITS OWN
    (feature, label-embedding) token pair instead of the batch concat, so
    the reward depends on the sample's feature, not only its label value.
    Parameter tree and shapes are identical to the faithful mode (the
    attention axis is the only change); see DEVIATIONS.md and
    docs/quality.md for why the faithful form can only filter per LABEL.
    """

    label_dim: int
    label_embedding_dim: int = 128
    feature_dim: int = 384
    per_sample: bool = False

    @nn.compact
    def __call__(self, features, label_indices):
        features = features.astype(jnp.float32)
        label_indices = jnp.clip(label_indices.astype(jnp.int32), 0,
                                 self.label_dim - 1)
        f = nn.Dense(128, kernel_init=torch_linear_init,
                     bias_init=torch_bias_init, name="feature_fc")(features)
        f = nn.LayerNorm(epsilon=1e-5, name="feature_norm")(f)
        emb = nn.Embed(self.label_dim, self.label_embedding_dim,
                       embedding_init=nn.initializers.normal(1.0),
                       name="label_embedding")(label_indices)
        emb = nn.LayerNorm(epsilon=1e-5, name="label_norm")(emb)

        if self.per_sample:
            pair = jnp.stack([f, emb], axis=1)                        # [B,2,128]
            w = jax.nn.softmax(
                nn.Dense(1, kernel_init=torch_linear_init,
                         bias_init=torch_bias_init,
                         name="cross_attention_fc")(pair), axis=1)    # [B,2,1]
            ctx = jnp.sum(w * pair, axis=1)                           # [B,128]
        else:
            cat = jnp.concatenate([f, emb], axis=0)                   # [2B,128]
            w = jax.nn.softmax(
                nn.Dense(1, kernel_init=torch_linear_init,
                         bias_init=torch_bias_init,
                         name="cross_attention_fc")(cat), axis=0)     # [2B,1]
            ctx = jnp.sum(w * cat, axis=0)[None, :]                   # [1,128]

        h = ctx + emb                                                 # [B,128]
        h = nn.relu(nn.Dense(256, kernel_init=torch_linear_init,
                             bias_init=torch_bias_init, name="mlp_fc1")(h))
        h = nn.Dense(128, kernel_init=torch_linear_init,
                     bias_init=torch_bias_init, name="mlp_fc2")(h)
        h = nn.relu(nn.Dense(64, kernel_init=torch_linear_init,
                             bias_init=torch_bias_init, name="ffn_fc1")(h))
        return jax.nn.sigmoid(
            nn.Dense(1, kernel_init=torch_linear_init,
                     bias_init=torch_bias_init, name="ffn_fc2")(h))  # [B,1]


SR_DEFAULTS = {
    "start_timing": 20000, "feature_dim": 384, "sr_lr": 0.0005, "N_k": 10,
    "sr_ema": True, "sr_ema_m": 0.999,
}


def _check_sr_mode(cfg):
    if cfg.sr_per_sample and cfg.is_regression:
        raise ValueError(
            "sr_per_sample trains on one-hot class agreement; regression "
            "tasks keep the faithful (reference) rewarder mode")


def init_sr_state(cfg, rng) -> SRState:
    _check_sr_mode(cfg)
    ldim = label_dim(cfg.num_classes)
    rewarder = Rewarder(label_dim=ldim, label_embedding_dim=128,
                        feature_dim=cfg.feature_dim,
                        per_sample=cfg.sr_per_sample)
    generator = Generator(feature_dim=cfg.feature_dim)
    k1, k2 = jax.random.split(rng)
    fdummy = jnp.zeros((2, cfg.feature_dim), jnp.float32)
    ldummy = jnp.zeros((2,), jnp.int32)
    rew_params = rewarder.init(k1, fdummy, ldummy)["params"]
    gen_params = generator.init(k2, fdummy)["params"]
    adam = build_adam(cfg.sr_lr)
    return SRState(
        rewarder_params=rew_params,
        rewarder_opt=adam.init(rew_params),
        rewarder_ema_params=(jax.tree_util.tree_map(jnp.copy, rew_params)
                             if cfg.sr_ema else None),
        gen_params=gen_params,
        gen_opt=adam.init(gen_params),
        max_reward=jnp.asarray(-jnp.inf, jnp.float32),
    )


def score_pseudo_labels(cfg, sr_state: SRState, feats, labels):
    """Standalone reward scoring (the SemiReward inference primitive):
    returns (rewards [B,1], keep_mask [B]) with the reference's
    reward >= mean(reward) filter (srflexmatch.py:99-101). Jit-safe."""
    ldim = label_dim(cfg.num_classes)
    rewarder = Rewarder(label_dim=ldim, label_embedding_dim=128,
                        feature_dim=cfg.feature_dim,
                        per_sample=cfg.sr_per_sample)
    reward = rewarder.apply({"params": sr_state.rewarder_params}, feats,
                            labels)
    keep = (reward >= reward.mean()).squeeze(-1).astype(jnp.float32)
    return reward, keep


def sr_decay(step, num_train_iter: int, max_sampling_time: int = 8):
    """reference algorithmbase.py:177-183 — int(max(8, 1 + T/it))."""
    it = jnp.maximum(step.astype(jnp.float32), 1.0)
    return jnp.maximum(
        jnp.asarray(max_sampling_time, jnp.int32),
        (1.0 + num_train_iter / it).astype(jnp.int32),
    )


class SemiRewardWrapper(Algorithm):
    """Composable SR combinator. ``BASE_CLS`` set by the registered variants."""

    BASE_CLS: type = None
    DEFAULTS: Dict[str, Any] = {}
    HAS_SR = True

    def __init__(self, cfg, data_info=None):
        super().__init__(cfg, data_info)
        _check_sr_mode(cfg)
        self.base = self.BASE_CLS(cfg, data_info)
        self.BATCH_KEYS = tuple(dict.fromkeys(self.base.BATCH_KEYS + ("idx_ulb",)))
        ldim = label_dim(cfg.num_classes)
        self.rewarder = Rewarder(label_dim=ldim, label_embedding_dim=128,
                                 feature_dim=cfg.feature_dim,
                                 per_sample=cfg.sr_per_sample)
        self.generator = Generator(feature_dim=cfg.feature_dim)
        self.adam = build_adam(cfg.sr_lr)

    # ---- state ------------------------------------------------------------
    def init_state(self):
        return self.base.init_state()

    def init_sr(self, rng) -> SRState:
        return init_sr_state(self.cfg, rng)

    # ---- helpers ------------------------------------------------------------
    def _remask(self, algo_state, probs_w, idx_ulb):
        """Re-apply the base algorithm's masking hook exactly as the
        reference ``data_generator`` does each loop iteration."""
        name = self.base.NAME
        cfg = self.cfg
        if name in ("fixmatch", "defixmatch"):
            return algo_state, C.fixed_threshold_mask(probs_w, cfg.p_cutoff)
        if name == "pseudolabel":
            return algo_state, C.fixed_threshold_mask(probs_w, cfg.p_cutoff)
        if name == "flexmatch":
            return C.flex_mask(algo_state, probs_w, idx_ulb, cfg.p_cutoff,
                               cfg.thresh_warmup)
        if name == "freematch":
            return C.free_mask(algo_state, probs_w, momentum=cfg.ema_p,
                               use_quantile=cfg.use_quantile,
                               clip_thresh=cfg.clip_thresh)
        if name == "softmatch":
            # reference srsoftmatch data_generator re-calls ONLY the
            # SoftMatchWeightingHook (not dist-align), srsoftmatch.py:84-90
            g, mask = C.softmatch_mask(algo_state.gaussian, probs_w,
                                       n_sigma=cfg.n_sigma, momentum=cfg.ema_p,
                                       per_class=cfg.per_class)
            return algo_state._replace(gaussian=g), mask
        # custom base algorithms: honor their own remask() when defined,
        # otherwise default to the stateless fixed-threshold filter (the
        # fixmatch-family behavior) so `_make_sr_variant` composes with any
        # registered algorithm (docs/tutorial.md §2)
        custom = getattr(self.base, "remask", None)
        if custom is not None:
            return custom(algo_state, probs_w, idx_ulb)
        return algo_state, C.fixed_threshold_mask(probs_w, cfg.p_cutoff)

    def _remask_is_stateful(self) -> bool:
        return self.base.NAME in ("freematch", "softmatch")

    # ---- loss ------------------------------------------------------------
    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        base_out = self.base.loss(ctx)
        sr: SRState = ctx.sr_state
        fwd = base_out.fwd
        probs_w = C.compute_prob(fwd.logits_x_ulb_w)
        idx_ulb = ctx.batch.get("idx_ulb")
        pl = base_out.pseudo_label
        pl_int = (pl if pl.dtype in (jnp.int32, jnp.int64)
                  else jnp.argmax(pl, axis=-1)).astype(jnp.int32)

        def with_reward(operand):
            algo_state, unsup0 = operand
            n_ref = int(cfg.extra.get("sr_reforward", 1))
            logits_s, feats_w = fwd.logits_x_ulb_s, fwd.feats_x_ulb_w
            if n_ref > 1:
                # --- ref-equivalent mode (bench.py --ref-equivalent) ---
                # Execute the reference data_generator's FULL redundant
                # device work (srflexmatch.py:72-104): n_ref backbone
                # re-forwards on the whole batch, each with its own masking
                # -hook call and rewarder scoring, keeping only the LAST
                # iteration's outputs for the loss. n_ref-1 iterations run
                # primal-only under stop_gradient (the reference backprops
                # only through the last graph); the final re-forward runs
                # outside the loop and IS differentiated. The loop body
                # multiplies x by (1 + i*1e-45) — numerically exact, but
                # induction-variable-dependent so while-loop invariant code
                # motion cannot hoist the forwards; the final forward's
                # input carries a ~1e-45 data dependency on the loop result
                # so dead-code elimination cannot drop it.
                b = ctx.batch

                def refwd(x_s):
                    return C.ssl_forward(
                        ctx.apply_fn, ctx.params, ctx.batch_stats,
                        b["x_lb"], b["x_ulb_w"], x_s, ctx.rng,
                        train=True, use_cat=cfg.use_cat, stop_grad_w=True)

                # modality-aware identity perturbations (x_ulb_s is a dict
                # of int32 token ids for NLP): float leaves take the
                # 1e-45 scale; int leaves add an induction-variable- or
                # eps-dependent exact zero (min(i,0) / (eps*0).astype —
                # neither foldable without cross-iteration range analysis
                # or fastmath, which XLA doesn't apply)
                def _loop_perturb(x, i):
                    if jnp.issubdtype(x.dtype, jnp.floating):
                        return x * (1.0 + i.astype(jnp.float32) * 1e-45)
                    return x + jnp.minimum(i, 0).astype(x.dtype)

                def _final_perturb(x, eps):
                    if jnp.issubdtype(x.dtype, jnp.floating):
                        return x + eps * 1e-45
                    # NaN-safe exact zero: if a diverged run makes eps
                    # non-finite, NaN*0 = NaN and the int cast would turn
                    # token ids into garbage — sanitize first
                    safe = jnp.where(jnp.isfinite(eps), eps, 0.0)
                    return x + (safe * 0.0).astype(x.dtype)

                def body(i, carry):
                    st, _mask, _eps = carry
                    f_i = refwd(jax.tree_util.tree_map(
                        lambda x: _loop_perturb(x, i), b["x_ulb_s"]))
                    probs_i = C.compute_prob(f_i.logits_x_ulb_w)
                    st, mask_i = self._remask(st, probs_i, idx_ulb)
                    r_i = self.rewarder.apply({"params": sr.rewarder_params},
                                              f_i.feats_x_ulb_w, pl_int)
                    eps = (r_i.mean()
                           + f_i.logits_x_ulb_s.mean()).astype(jnp.float32)
                    return (st, mask_i, eps)

                st0, m0 = self._remask(algo_state, probs_w, idx_ulb)
                algo_state, mask_dg, eps = jax.tree_util.tree_map(
                    jax.lax.stop_gradient,
                    jax.lax.fori_loop(0, n_ref - 1, body,
                                      (st0, m0, jnp.float32(0.0))))
                f_last = refwd(jax.tree_util.tree_map(
                    lambda x: _final_perturb(x, eps), b["x_ulb_s"]))
                logits_s, feats_w = f_last.logits_x_ulb_s, f_last.feats_x_ulb_w
            elif self._remask_is_stateful():
                # replicate the sr_decay()-iteration masking-state side
                # effect alone (the loss-equivalent fast path — see module
                # docstring)
                n = sr_decay(ctx.step, cfg.num_train_iter, cfg.sr_max_sampling)

                def body(_, carry):
                    st, _mask = carry
                    return self._remask(st, probs_w, idx_ulb)

                st0, m0 = self._remask(algo_state, probs_w, idx_ulb)
                algo_state, mask_dg = jax.lax.fori_loop(1, n, body, (st0, m0))
            else:
                algo_state, mask_dg = self._remask(algo_state, probs_w, idx_ulb)
            reward = self.rewarder.apply(
                {"params": jax.lax.stop_gradient(sr.rewarder_params)},
                jax.lax.stop_gradient(feats_w), pl_int)
            mask2 = (reward >= reward.mean()).squeeze(-1).astype(jnp.float32)
            # strong-view logits; pseudolabel variant has no strong view and
            # reuses its ulb logits (fwd.logits_x_ulb_s aliases them there)
            lname = "l1" if (self.base.NAME == "pseudolabel" and cfg.is_regression) else "ce"
            unsup = consistency_loss(logits_s, pl, lname,
                                     mask=mask_dg, mask2=mask2)
            return unsup, algo_state, mask2.mean()

        def without_reward(operand):
            algo_state, unsup0 = operand
            return unsup0, algo_state, jnp.asarray(1.0, jnp.float32)

        unsup, new_algo_state, sr_keep = jax.lax.cond(
            ctx.step > cfg.start_timing, with_reward, without_reward,
            (base_out.new_algo_state, base_out.unsup_loss))

        total = (base_out.total_loss
                 + base_out.unsup_weight * (unsup - base_out.unsup_loss))
        metrics = dict(base_out.metrics)
        metrics.update(total_loss=total, unsup_loss=unsup,
                       sr_keep_ratio=sr_keep)
        return base_out._replace(
            total_loss=total, unsup_loss=unsup,
            new_algo_state=new_algo_state, metrics=metrics)

    # ---- SR online training (runs after the model grad step) --------------
    def sr_update(self, sr: SRState, out: LossOut, batch, step, rng) -> Tuple[SRState, Dict]:
        cfg = self.cfg
        C_cls = cfg.num_classes
        ldim = label_dim(C_cls)
        fwd = out.fwd
        feats_lb = jax.lax.stop_gradient(fwd.feats_x_lb).astype(jnp.float32)
        feats_u = jax.lax.stop_gradient(fwd.feats_x_ulb_w).astype(jnp.float32)
        pl = out.pseudo_label
        pl_int = (pl if pl.dtype in (jnp.int32, jnp.int64)
                  else jnp.argmax(pl, axis=-1)).astype(jnp.int32)
        y_lb = batch["y_lb"].astype(jnp.int32)

        def rew_loss_fn(rew_params, feats, labels, target):
            reward = self.rewarder.apply({"params": rew_params}, feats, labels)
            gen_loss = jnp.mean((reward - 1.0) ** 2)
            rew_loss = jnp.mean((reward - target) ** 2)
            # two separate backwards ACCUMULATE into the rewarder params
            # before one optimizer step (srflexmatch.py:186-208)
            return gen_loss + rew_loss, (gen_loss, rew_loss, reward.mean())

        def gen_labels(feats):
            g = self.generator.apply({"params": sr.gen_params}, feats)
            return jnp.clip(g.astype(jnp.int32), 0, ldim - 1).squeeze(-1)

        def train_rewarder(feats, labels, target, sr_in: SRState) -> SRState:
            grads, _aux = jax.grad(rew_loss_fn, has_aux=True)(
                sr_in.rewarder_params, feats, labels, target)
            updates, new_opt = self.adam.update(grads, sr_in.rewarder_opt,
                                                sr_in.rewarder_params)
            new_params = optax.apply_updates(sr_in.rewarder_params, updates)
            # generator Adam step is a guaranteed no-op (grads unreachable
            # through the .long() cast) — params stay put, faithfully.
            return sr_in.replace(rewarder_params=new_params,
                                 rewarder_opt=new_opt)

        # ---- stage 1: every step on labeled data (srflexmatch.py:194-208)
        def stage1(sr_in: SRState) -> SRState:
            glab = gen_labels(feats_lb)
            onehot_dim = C_cls if not cfg.is_regression else int(cfg.extra.get("range", 100))
            target = cosine_similarity_n(
                jax.nn.one_hot(jnp.clip(glab, 0, onehot_dim - 1), onehot_dim),
                jax.nn.one_hot(jnp.clip(y_lb.reshape(glab.shape), 0, onehot_dim - 1), onehot_dim))
            return train_rewarder(feats_lb, glab, target, sr_in)

        # ---- stage 2: track max reward; train every N_k steps
        # (srflexmatch.py:163-193). One scaffold serves both modes: the
        # reward_mean/max_reward bookkeeping and the N_k cadence are
        # identical — only the train fn differs (nk_train vs ps_train).
        def make_stage2(train_fn):
            def stage2(sr_in: SRState) -> SRState:
                reward_mean = self.rewarder.apply(
                    {"params": sr_in.rewarder_params}, feats_u, pl_int).mean()
                new_max = jnp.maximum(sr_in.max_reward, reward_mean)
                do_train = jnp.logical_and(step % cfg.N_k == 0,
                                           step > cfg.start_timing)
                return jax.lax.cond(
                    do_train,
                    lambda s: train_fn(s).replace(
                        max_reward=jnp.asarray(-jnp.inf, jnp.float32)),
                    lambda s: s.replace(max_reward=new_max),
                    sr_in.replace(max_reward=new_max))
            return stage2

        def nk_train(s: SRState) -> SRState:
            glab = gen_labels(feats_u)
            target = cosine_similarity_n(
                jax.nn.one_hot(glab, C_cls),
                jax.nn.one_hot(jnp.clip(pl_int, 0, C_cls - 1), C_cls))
            return train_rewarder(feats_u, glab, target, s)

        # ---- beyond-reference per-sample mode (cfg.sr_per_sample) --------
        # The faithful protocol above trains the rewarder only on
        # (features, FROZEN-generator-label) pairs, so the label embeddings
        # it must rank at filter time are never visited (docs/quality.md,
        # DEVIATIONS.md 15c). This mode keeps the two-stage cadence and the
        # max_reward bookkeeping but trains on the LABELED batch with real
        # candidate labels: the true label (target 1) and a uniform random
        # label (target cos(onehot(c), onehot(y)) = 0.5 unless c == y), and
        # drops the gen_loss reward->1 pull that would fight the negative
        # candidates. Classification-only (guarded at init).
        def ps_train(sr_in: SRState) -> SRState:
            rand = jax.random.randint(jax.random.fold_in(rng, 7),
                                      y_lb.shape, 0, C_cls)
            feats2 = jnp.concatenate([feats_lb, feats_lb], axis=0)
            cands = jnp.concatenate([y_lb, rand], axis=0)
            refs = jnp.concatenate([y_lb, y_lb], axis=0)
            target = cosine_similarity_n(jax.nn.one_hot(cands, C_cls),
                                         jax.nn.one_hot(refs, C_cls))

            def loss_fn(rew_params):
                r = self.rewarder.apply({"params": rew_params}, feats2,
                                        cands)
                return jnp.mean((r - target) ** 2)

            grads = jax.grad(loss_fn)(sr_in.rewarder_params)
            updates, new_opt = self.adam.update(grads, sr_in.rewarder_opt,
                                                sr_in.rewarder_params)
            return sr_in.replace(
                rewarder_params=optax.apply_updates(sr_in.rewarder_params,
                                                    updates),
                rewarder_opt=new_opt)

        s1, s2 = ((ps_train, make_stage2(ps_train)) if cfg.sr_per_sample
                  else (stage1, make_stage2(nk_train)))
        new_sr = jax.lax.cond(
            step > 0,
            lambda s: jax.lax.cond(step >= cfg.start_timing, s2, s1, s),
            lambda s: s,
            sr,
        )

        # EMARewarder shadow: updated once per rewarder FORWARD
        # (semireward.py:94-127); k forwards with constant params fold into
        # one decay**k application.
        if cfg.sr_ema and sr.rewarder_ema_params is not None:
            d = cfg.sr_ema_m
            n_dg = sr_decay(step, cfg.num_train_iter, cfg.sr_max_sampling)
            k = ((step > 0).astype(jnp.int32)
                 + (step >= cfg.start_timing).astype(jnp.int32)
                 + jnp.where(step > cfg.start_timing, n_dg, 0)
                 + jnp.logical_and(step % cfg.N_k == 0,
                                   step > cfg.start_timing).astype(jnp.int32))
            dk = jnp.power(jnp.asarray(d, jnp.float32), k.astype(jnp.float32))
            ema = jax.tree_util.tree_map(
                lambda e, p: e * dk + (1.0 - dk) * p,
                sr.rewarder_ema_params, new_sr.rewarder_params)
            new_sr = new_sr.replace(rewarder_ema_params=ema)

        return new_sr, {"max_reward": new_sr.max_reward}


def _make_sr_variant(name: str, base_name: str):
    base_cls = ALGORITHMS.get(base_name)

    class _SR(SemiRewardWrapper):
        NAME = name
        BASE_CLS = base_cls
        DEFAULTS = {**getattr(base_cls, "DEFAULTS", {}), **SR_DEFAULTS}

    _SR.__name__ = f"SR_{base_cls.__name__}"
    ALGORITHMS.register(_SR, name=name)
    return _SR


SRPseudoLabel = _make_sr_variant("srpseudolabel", "pseudolabel")
SRFixMatch = _make_sr_variant("srfixmatch", "fixmatch")
SRFlexMatch = _make_sr_variant("srflexmatch", "flexmatch")
SRFreeMatch = _make_sr_variant("srfreematch", "freematch")
SRSoftMatch = _make_sr_variant("srsoftmatch", "softmatch")
