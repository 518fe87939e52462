"""VAT — Virtual Adversarial Training (https://arxiv.org/abs/1704.03976).

TPU rebuild of reference semilearn/algorithms/vat/vat.py:15-145. The power
iteration's ``delta_kl.backward(); d = d.grad`` becomes an explicit
``jax.grad`` through the perturbation — no Variable/zero_grad machinery.
BN is frozen for all unlabeled forwards (Bn_Controller semantics). The NLP
embedding-perturbation path (vat_embed) lands with the BERT port.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from semireward_tpu.registry import ALGORITHMS
from semireward_tpu.core.losses import ce_loss
from semireward_tpu.algorithms import common as C
from semireward_tpu.algorithms.base import Algorithm, LossOut, StepCtx


def _l2_normalize(d):
    axes = tuple(range(1, d.ndim))
    return d / (jnp.sqrt(jnp.sum(d**2, axis=axes, keepdims=True)) + 1e-16)


def kl_div_with_logit(q_logit, p_logit):
    """reference vat.py:125-134."""
    q = jax.nn.softmax(q_logit, axis=1)
    logq = jax.nn.log_softmax(q_logit, axis=1)
    logp = jax.nn.log_softmax(p_logit, axis=1)
    return ((q * logq).sum(1) - (q * logp).sum(1)).mean()


def entropy_loss(ul_y):
    p = jax.nn.softmax(ul_y, axis=1)
    return -(p * jax.nn.log_softmax(ul_y, axis=1)).sum(1).mean()


@ALGORITHMS.register("vat")
class VAT(Algorithm):
    NAME = "vat"
    DEFAULTS = {"ent_loss_ratio": 0.06, "vat_eps": 6.0, "vat_embed": False,
                "unsup_warm_up": 0.4}
    BATCH_KEYS = ("x_lb", "y_lb", "x_ulb_w")

    def loss(self, ctx: StepCtx) -> LossOut:
        cfg = self.cfg
        b = ctx.batch
        variables = {"params": ctx.params}
        has_bn = bool(ctx.batch_stats)
        if has_bn:
            variables["batch_stats"] = ctx.batch_stats
        k_lb, k_ulb, k_d, k_adv = jax.random.split(ctx.rng, 4)

        def fwd(x, key, update_bn):
            if has_bn:
                out, st = ctx.apply_fn(variables, x, train=True,
                                       rngs={"dropout": key},
                                       mutable=["batch_stats"])
                return out, (st if update_bn else {})
            return ctx.apply_fn(variables, x, train=True,
                                rngs={"dropout": key}), {}

        outs_lb, new_state = fwd(b["x_lb"], k_lb, True)
        sup_loss = self.ce_loss(outs_lb["logits"], b["y_lb"], reduction="mean")

        x_ulb = b["x_ulb_w"]
        if cfg.vat_embed and isinstance(x_ulb, dict):
            # NLP path (vat.py:52-58, 85-89, 106-108): perturb the word
            # embeddings instead of the input
            def fwd_embed(embeds, key):
                inp = {"attention_mask": x_ulb["attention_mask"],
                       "input_ids": x_ulb["input_ids"],
                       "inputs_embeds": embeds}
                o = ctx.apply_fn(variables, inp, train=True,
                                 rngs={"dropout": key})
                return o

            outs_ulb = ctx.apply_fn(variables, x_ulb, train=True,
                                    rngs={"dropout": k_ulb},
                                    return_embed=True)
            ul_embed = jax.lax.stop_gradient(outs_ulb["embed"])
            ul_y = jax.lax.stop_gradient(outs_ulb["logits"])
            d = jax.random.normal(k_d, ul_embed.shape, jnp.float32)
            d = 1e-6 * _l2_normalize(d)

            def kl_of_perturb(dd):
                out = fwd_embed(ul_embed + dd, k_adv)
                return kl_div_with_logit(ul_y, out["logits"])

            grad_d = jax.grad(kl_of_perturb)(d)
            r_adv = cfg.vat_eps * _l2_normalize(grad_d)
            out_adv = fwd_embed(ul_embed + jax.lax.stop_gradient(r_adv), k_adv)
        else:
            outs_ulb, _ = fwd(x_ulb, k_ulb, False)  # BN frozen
            ul_y = jax.lax.stop_gradient(outs_ulb["logits"])

            # --- power iteration (vat.py:79-101, num_iters=1, xi=1e-6) -----
            d = jax.random.normal(k_d, x_ulb.shape, jnp.float32)
            d = 1e-6 * _l2_normalize(d)

            def kl_of_perturb(dd):
                out, _ = fwd(x_ulb + dd, k_adv, False)
                return kl_div_with_logit(ul_y, out["logits"])

            grad_d = jax.grad(kl_of_perturb)(d)
            r_adv = cfg.vat_eps * _l2_normalize(grad_d)

            out_adv, _ = fwd(x_ulb + jax.lax.stop_gradient(r_adv), k_adv, False)
        unsup_loss = kl_div_with_logit(ul_y, out_adv["logits"])
        loss_entmin = entropy_loss(outs_ulb["logits"])

        warm = self.unsup_warmup_factor(ctx.step)
        extra = cfg.ent_loss_ratio * loss_entmin
        fwd_out = C.ForwardOut(outs_lb["logits"], outs_ulb["logits"],
                               out_adv["logits"], outs_lb["feat"],
                               outs_ulb["feat"], outs_ulb["feat"], new_state)
        return self.pack(sup_loss=sup_loss, unsup_loss=unsup_loss, fwd=fwd_out,
                         new_algo_state=ctx.algo_state, warmup=warm,
                         extra_loss=extra,
                         metrics={"loss_entmin": loss_entmin})
