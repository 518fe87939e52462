"""CoSSL (https://arxiv.org/abs/2112.04564) — co-learning with a
Tail-Feature-Enhanced (TFE) teacher classifier.

TPU rebuild of reference semilearn/imb_algorithms/cossl/{cossl.py,utils.py}:
a second classifier head trained on mixup'd features from a class-balanced
labeled stream and an unlabeled stream (tail classes mix more:
p_c = (max_cnt - cnt_c)/max_cnt, lam ~ U(max_lam, 1)); evaluation switches
to the teacher head after ``cossl_warm_epoch``.

Both reference training quirks are reproduced:
- the teacher head is DOUBLE-stepped — by the main optimizer and by a
  dedicated SGD(cossl_tfe_warm_lr, momentum, cossl_tfe_warm_wd) over the
  same gradients once epoch >= warm_epoch (cossl.py:50-75
  CoSSLParamUpdateHook steps tfe_optimizer right after optimizer.step());
  see ``post_param_update``.
- the teacher's warm-start (``classifier_warmup``, cossl/utils.py — a
  balanced-classifier fit from EMA features at the warm-epoch boundary) is
  implemented in ``on_epoch_end``.

The class-balanced TFE labeled stream comes from the loader's weighted
extra-stream support (reference get_weighted_sampler, cossl.py:150-160).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from semireward_tpu.registry import IMB_ALGORITHMS
from semireward_tpu.core.losses import ce_loss as _ce
from semireward_tpu.imb.base import ImbAlgorithm
from semireward_tpu.models.initializers import torch_kernel_init, torch_bias_init


class CoSSLNet(nn.Module):
    """backbone + TFE teacher classifier (cossl.py:20-48)."""

    backbone: nn.Module
    num_classes: int

    def setup(self):
        self.teacher_classifier = nn.Dense(
            self.num_classes, kernel_init=torch_kernel_init,
            bias_init=torch_bias_init, dtype=jnp.float32,
            param_dtype=jnp.float32)

    def __call__(self, x, train: bool = True, only_fc: bool = False,
                 only_feat: bool = False, **kw):
        if only_fc or only_feat:
            return self.backbone(x, train=train, only_fc=only_fc,
                                 only_feat=only_feat, **kw)
        res = self.backbone(x, train=train, **kw)
        res["logits_tfe"] = self.teacher_classifier(res["feat"])
        return res

    def teacher(self, feat):
        return self.teacher_classifier(feat)


@IMB_ALGORITHMS.register("cossl")
class CoSSL(ImbAlgorithm):
    NAME = "cossl"
    DEFAULTS = {"cossl_max_lam": 0.6, "cossl_tfe_augment": "strong",
                "cossl_tfe_u_ratio": 1, "cossl_warm_epoch": 0,
                "cossl_tfe_warm_epoch": 1, "cossl_tfe_warm_lr": 0.02,
                "cossl_tfe_warm_ema_decay": 0.999, "cossl_tfe_warm_wd": 5e-4,
                "cossl_tfe_warm_bs": 64}
    # extra raw streams the loader must provide: (balanced labeled, ulb)
    EXTRA_STREAMS = ("tfe_lb", "tfe_ulb")

    def __init__(self, cfg, data_info=None, base_cls=None):
        super().__init__(cfg, data_info, base_cls)
        x = cfg.extra
        self.max_lam = float(x.get("cossl_max_lam", 0.6))
        self.tfe_augment = str(x.get("cossl_tfe_augment", "strong"))
        self.tfe_u_ratio = int(x.get("cossl_tfe_u_ratio", 1))
        self.warm_epoch = int(x.get("cossl_warm_epoch", 0))
        cnt = self.lb_class_counts()
        # mixup_prob[c] = (max - cnt_c)/max (cossl.py:95-97)
        self.mixup_prob = jnp.asarray((cnt.max() - cnt) / cnt.max(),
                                      jnp.float32)
        self.BATCH_KEYS = tuple(dict.fromkeys(
            self.BATCH_KEYS + ("x_tfe_lb", "y_tfe_lb", "x_tfe_ulb")))

    def wrap_model(self, model):
        # head input width for the dedicated-SGD momentum buffers (wrap_model
        # always precedes init_train_state)
        self._num_features = int(getattr(
            model, "num_features",
            self.data_info.get("num_features", self.cfg.feature_dim)))
        return CoSSLNet(backbone=self.base.wrap_model(model),
                        num_classes=self.cfg.num_classes)

    # ---- dedicated teacher SGD (reference cossl.py:50-75,124) --------------
    def init_imb_state(self):
        nf = int(getattr(self, "_num_features",
                         self.data_info.get("num_features",
                                            self.cfg.feature_dim)))
        C_ = self.cfg.num_classes
        # torch-SGD momentum buffers for the teacher head
        return {"tfe_momentum": {"kernel": jnp.zeros((nf, C_), jnp.float32),
                                 "bias": jnp.zeros((C_,), jnp.float32)}}

    def post_param_update(self, params, grads, algo_state, step):
        """Second optimizer step on the teacher head over the SAME grads the
        main optimizer consumed (the reference calls tfe_optimizer.step()
        right after optimizer.step() without re-deriving grads, once
        epoch >= warm_epoch). torch-SGD semantics: d = g + wd*p;
        buf = mu*buf + d; nesterov: d = d + mu*buf; p -= lr*d."""
        cfg = self.cfg
        base_state, imb_state = algo_state
        lr = float(cfg.extra.get("cossl_tfe_warm_lr", 0.02))
        wd = float(cfg.extra.get("cossl_tfe_warm_wd", 5e-4))
        mu = float(cfg.momentum)
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        active = (step // num_iter_per_epoch) >= self.warm_epoch

        head = params["teacher_classifier"]
        g = grads["teacher_classifier"]
        buf = imb_state["tfe_momentum"]

        def upd(p, g, b):
            d = g.astype(jnp.float32) + wd * p
            nb = mu * b + d
            d = d + mu * nb  # nesterov (reference get_optimizer default)
            return jnp.where(active, p - lr * d, p), jnp.where(active, nb, b)

        new_head, new_buf = {}, {}
        for k in head:
            new_head[k], new_buf[k] = upd(head[k], g[k], buf[k])
        new_params = dict(params)
        new_params["teacher_classifier"] = new_head
        return new_params, (base_state, {**imb_state,
                                         "tfe_momentum": new_buf})

    def eval_out_key(self, step: int) -> str:
        num_iter_per_epoch = max(self.cfg.num_train_iter
                                 // max(self.cfg.epoch, 1), 1)
        epoch = step // num_iter_per_epoch
        return "logits_tfe" if epoch >= self.warm_epoch else "logits"

    # ---- teacher warm-start (reference cossl/utils.py:65-121
    # classifier_warmup + TFE:124-230) ---------------------------------------
    def on_epoch_end(self, trainer, state):
        cfg = self.cfg
        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        epoch = int(state.step) // num_iter_per_epoch
        if epoch != self.warm_epoch or getattr(self, "_warmed", False):
            return state
        self._warmed = True
        trainer.logger.info("CoSSL: TFE classifier warm-up")
        import jax as _jax
        import optax as _optax
        from semireward_tpu.data.augment import randaugment, weak_augment, normalize

        spec = trainer.aug_spec
        ema = state.ema_params
        bs = int(cfg.extra.get("cossl_tfe_warm_bs", 64))

        def feats_logits(params, x):
            v = {"params": params}
            if state.batch_stats:
                v["batch_stats"] = state.batch_stats
            out = trainer.model.apply(v, x, train=False)
            return out["feat"], out["logits"]

        jfl = _jax.jit(feats_logits)
        jweak = _jax.jit(lambda k, x: weak_augment(k, x, spec))
        jstrong = _jax.jit(lambda k, x: randaugment(k, x, spec))

        def run(dataset_x, strong=False, seed=0):
            feats, logits = [], []
            key = _jax.random.PRNGKey(seed)
            for s in range(0, len(dataset_x), bs):
                xb = np.asarray(dataset_x[s:s + bs])
                pad = bs - len(xb)
                if pad:
                    xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
                key, k = _jax.random.split(key)
                xv = (jstrong if strong else jweak)(k, jnp.asarray(xb))
                f, lg = jfl(ema, xv)
                feats.append(np.asarray(f)[: bs - pad or bs])
                logits.append(np.asarray(lg)[: bs - pad or bs])
            return np.concatenate(feats), np.concatenate(logits)

        lb = trainer.bundle.train_lb
        ulb = trainer.bundle.train_ulb
        lb_feats, lb_logits = run(lb.data, strong=(self.tfe_augment == "strong"))
        ulb_feats, _ = run(ulb.data, strong=True, seed=1)
        _, ulb_logits = run(ulb.data, strong=False, seed=2)

        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        lb_probs = softmax(lb_logits)
        ulb_probs = softmax(ulb_logits)
        y_lb = np.asarray(lb.targets, np.int64)
        C_ = cfg.num_classes
        cnt = np.bincount(y_lb, minlength=C_)

        rs = np.random.RandomState(cfg.seed + 13)
        feats_aug, tgt_aug = [lb_feats], [np.eye(C_)[y_lb]]
        for c in range(C_):
            need = cnt.max() - cnt[c]
            if need <= 0:
                continue
            cur = lb_feats[y_lb == c]
            if len(cur) == 0:
                continue
            other_f = np.concatenate([lb_feats[y_lb != c], ulb_feats])
            other_p = np.concatenate([lb_probs[y_lb != c], ulb_probs])[:, c]
            order = np.argsort(-other_p)
            other_f = other_f[order]
            a_idx = rs.choice(len(cur), need, replace=True)
            b_idx = np.arange(min(need, len(other_f)))
            lam = rs.beta(0.75, 0.75, size=len(b_idx))[:, None]
            mixed = lam * cur[a_idx[: len(b_idx)]] + (1 - lam) * other_f[b_idx]
            feats_aug.append(mixed)
            t = np.zeros((len(b_idx), C_)); t[:, c] = 1
            tgt_aug.append(t)
        F = np.concatenate(feats_aug).astype(np.float32)
        T = np.concatenate(tgt_aug).astype(np.float32)

        # train the teacher head on the balanced feature set
        # (classifier_train, Adam lr 1e-3, tfe_warm_epoch epochs)
        head = {k: np.asarray(v) for k, v in
                state.params["teacher_classifier"].items()}
        head = {k: jnp.asarray(v) for k, v in head.items()}
        adam = _optax.adam(1e-3)
        opt = adam.init(head)

        def head_step(head, opt, xb, tb):
            def loss_fn(h):
                lg = xb @ h["kernel"] + h["bias"]
                logp = _jax.nn.log_softmax(lg, axis=-1)
                return -(tb * logp).sum(-1).mean()

            g = _jax.grad(loss_fn)(head)
            up, opt = adam.update(g, opt, head)
            return _optax.apply_updates(head, up), opt

        jhead = _jax.jit(head_step)
        n_epochs = int(cfg.extra.get("cossl_tfe_warm_epoch", 1))
        for ep in range(n_epochs):
            perm = rs.permutation(len(F))
            for s in range(0, len(F) - bs + 1, bs):
                idx = perm[s:s + bs]
                head, opt = jhead(head, opt, jnp.asarray(F[idx]),
                                  jnp.asarray(T[idx]))

        new_params = dict(state.params)
        new_params["teacher_classifier"] = {k: jnp.asarray(v)
                                            for k, v in head.items()}
        new_ema = dict(state.ema_params)
        # distinct buffers: params and ema are both donated by the jitted
        # step — sharing one array would be a double-donation
        new_ema["teacher_classifier"] = {k: jnp.array(v, copy=True)
                                         for k, v in head.items()}
        trainer.logger.info("CoSSL: teacher head warm-start done "
                            f"({len(F)} balanced features)")
        return state.replace(params=new_params, ema_params=new_ema)

    def post_loss(self, out, imb_state, ctx):
        cfg = self.cfg
        b = ctx.batch
        if "x_tfe_lb" not in b:
            return out
        variables = {"params": ctx.params}
        if ctx.batch_stats:
            variables["batch_stats"] = ctx.batch_stats

        # EMA-model features for the TFE streams (cossl.py:219-226)
        teacher_params = (ctx.ema_params if ctx.ema_params is not None
                          else ctx.params)
        tvars = {"params": teacher_params}
        if ctx.batch_stats:
            tvars["batch_stats"] = ctx.batch_stats
        feat_x = jax.lax.stop_gradient(ctx.apply_fn(
            tvars, b["x_tfe_lb"], train=False, only_feat=True))
        feat_u = jax.lax.stop_gradient(ctx.apply_fn(
            tvars, b["x_tfe_ulb"], train=False, only_feat=True))
        y_x = b["y_tfe_lb"].astype(jnp.int32)
        n = y_x.shape[0]
        feat_u = feat_u[:n]

        k1, k2 = jax.random.split(jax.random.fold_in(ctx.rng, 77))
        do_mix = jax.random.uniform(k1, (n,)) < self.mixup_prob[y_x]
        lam = jax.random.uniform(k2, (n, 1), minval=self.max_lam, maxval=1.0)
        mixed = jnp.where(do_mix[:, None], lam * feat_x + (1 - lam) * feat_u,
                          feat_x)

        teacher_logits = ctx.apply_fn(variables, mixed, method="teacher")
        teacher_loss = _ce(teacher_logits, y_x, reduction="mean")

        num_iter_per_epoch = max(cfg.num_train_iter // max(cfg.epoch, 1), 1)
        active = (ctx.step // num_iter_per_epoch) >= self.warm_epoch
        term = jnp.where(active, teacher_loss, 0.0)
        return self._add_loss(out, term, "tea_loss", teacher_loss)
