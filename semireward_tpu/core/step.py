"""Build the single jitted train step and the initial TrainState.

This replaces the reference's {train_step + ParamUpdateHook + EMAHook +
masking hooks + SR optimizers} pipeline (core/algorithmbase.py:346-375,
core/hooks/param_update.py:15-45, core/hooks/ema.py:14-24): everything that
touches device data per iteration compiles into ONE XLA program taking and
donating the TrainState. Gradient cross-replica reduction is not written
anywhere — under jit with a batch sharded on the 'data' mesh axis, XLA
inserts the psum where the batch axis contracts (the scaling-book recipe).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from semireward_tpu.algorithms.base import Algorithm, StepCtx
from semireward_tpu.core.train_state import TrainState, tree_ema
from semireward_tpu.core import optim as optim_lib
from semireward_tpu.utils import prng


def init_train_state(cfg, alg: Algorithm, model, rng,
                     sample_input: jnp.ndarray,
                     tx: Optional[optax.GradientTransformation] = None,
                     builder=None
                     ) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize params/EMA/optimizer/algo/SR state.

    ``sample_input``: one input example batch (shape/dtype only) for
    model.init. ``builder`` (optional): the net-builder function, consulted
    for layer-decay grouping metadata (layer_id_fn / num_layers).
    """
    k_init, k_sr, k_run = jax.random.split(rng, 3)
    variables = model.init({"params": k_init, "dropout": k_init},
                           sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if tx is None:
        layer_id_fn = getattr(builder, "layer_id_fn", None)
        num_layers = getattr(builder, "num_layers", 0)
        tx = optim_lib.build_optimizer(
            params,
            optim_name=cfg.optim,
            lr=cfg.lr,
            momentum=cfg.momentum,
            weight_decay=cfg.weight_decay,
            layer_decay=cfg.layer_decay,
            num_training_steps=cfg.num_train_iter,
            num_warmup_steps=cfg.num_warmup_iter,
            clip_grad=cfg.grad_clip,
            layer_id_fn=layer_id_fn,
            num_layers=num_layers,
            flat=bool(cfg.extra.get("flat_optimizer", False)),
        )

    sr = alg.init_sr(k_sr) if getattr(alg, "HAS_SR", False) else None
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
        opt_state=tx.init(params),
        algo=alg.init_state(),
        sr=sr,
        rng=k_run,
    )
    return state, tx


def make_train_step(cfg, alg: Algorithm, model,
                    tx: optax.GradientTransformation,
                    axis_name: Optional[str] = None) -> Callable:
    """Returns pure ``train_step(state, batch) -> (state, metrics)``.

    ``axis_name`` is only needed under shard_map; the default pjit path needs
    no explicit collectives.
    """
    bf16_grads = bool(cfg.extra.get("bf16_grads", False))

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = prng.step_key(state.rng, state.step)

        def loss_fn(params):
            ctx = StepCtx(
                apply_fn=model.apply,
                params=params,
                batch_stats=state.batch_stats,
                batch=batch,
                algo_state=state.algo,
                rng=rng,
                step=state.step,
                ema_params=state.ema_params,
                sr_state=state.sr,
            )
            out = alg.loss(ctx)
            return out.total_loss, out

        if bf16_grads:
            # A/B arm (VERDICT r5 ask #3): differentiate wrt a bf16 COPY of
            # the params so every cotangent — incl. the BN dgamma/dbeta and
            # conv dW reductions over [B,H,W,C] activations — stays bf16
            # end-to-end, with f32 restored only at the optimizer boundary
            # (grads are param-sized, so the convert is ~free). Bench-only
            # knob, off by default: the model already computes in bf16, so
            # this changes only the reduce/accumulate dtype of grads.
            pb = jax.tree_util.tree_map(
                lambda x: (x.astype(jnp.bfloat16)
                           if x.dtype == jnp.float32 else x), state.params)
            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(pb)
            grads = jax.tree_util.tree_map(
                lambda g, p: g.astype(p.dtype), grads, state.params)
        else:
            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_algo = out.new_algo_state
        # optional second optimizer over the same grads (CoSSL's dedicated
        # teacher SGD, reference cossl.py:50-75 CoSSLParamUpdateHook steps
        # tfe_optimizer after the main optimizer on the same .grad buffers)
        if hasattr(alg, "post_param_update"):
            new_params, new_algo = alg.post_param_update(
                new_params, grads, new_algo, state.step)
        # EMA of the post-step params (reference EMAHook, hooks/ema.py:14-24)
        new_ema = tree_ema(state.ema_params, new_params, cfg.ema_m)
        new_bs = (out.new_batch_stats if out.new_batch_stats is not None
                  else state.batch_stats)

        metrics = {k: v for k, v in out.metrics.items()}
        new_sr = state.sr
        if getattr(alg, "HAS_SR", False):
            new_sr, sr_metrics = alg.sr_update(state.sr, out, batch,
                                               state.step, rng)
            metrics.update(sr_metrics)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            ema_params=new_ema,
            opt_state=new_opt,
            algo=new_algo,
            sr=new_sr,
        )
        return new_state, metrics

    return train_step


# (the eval forward lives in Trainer.evaluate — it additionally handles
# out_key dispatch and CV normalization; a second exported eval-step helper
# here drifted from it and was removed)
