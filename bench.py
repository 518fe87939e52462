#!/usr/bin/env python
"""Throughput benchmark — prints ONE JSON line.

Metric: SSL steps/sec/chip for the headline USB config (CIFAR-100-shaped
data, ViT-S/2-32, FlexMatch + SemiReward) in the expensive stage-2 regime
(reward scoring + filtering active), with on-device RandAugment, exactly the
per-step work the reference does at config
config/SemiReward/usb_cv/flexmatch/flexmatch_cifar100_200_0.yaml (bs=8,
uratio=1, AdamW lr 5e-4) — except the reference also re-forwards the
backbone sr_decay() times per step for a loss it throws away
(srflexmatch.py:72-104), which we don't (documented loss-equivalent
deviation).

``vs_baseline`` is null: the reference publishes no throughput numbers
(BASELINE.md) and no CUDA GPU exists in this environment to measure it.
Also reports reward scorings/sec as a secondary metric in the JSON extras.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # persistent compile cache: the first bench invocation pays the XLA
    # compile; subsequent driver runs hit the cache
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import semireward_tpu  # noqa: F401
    from semireward_tpu.config import get_config
    from semireward_tpu.core.trainer import Trainer
    from semireward_tpu.data.datasets import get_dataset

    # headline config shapes (reference YAML above): bs=8, uratio=1, ViT-S/2-32
    cfg = get_config(dict(
        algorithm="srflexmatch", net="vit_small_patch2_32",
        dataset="synthetic", num_classes=100, num_labels=200,
        batch_size=8, uratio=1, eval_batch_size=16, img_size=32,
        crop_ratio=0.875, optim="AdamW", lr=5e-4, layer_decay=0.5,
        weight_decay=5e-4, ema_m=0.0, T=0.5, p_cutoff=0.95,
        num_train_iter=204800, num_eval_iter=1 << 30, num_log_iter=1 << 30,
        start_timing=0,  # force stage 2 (reward filtering) immediately
        N_k=10, feature_dim=384, sr_ema=False,
        seed=0, save_name="bench", mesh_shape=(-1,),
    ))
    cfg.extra["synthetic_train"] = 2048

    trainer = Trainer(cfg)
    # start past start_timing so every timed step runs the SR stage-2 path
    trainer.state = trainer.state.replace(step=jnp.asarray(100, jnp.int32))

    from semireward_tpu.data.loader import SSLLoader
    loader = SSLLoader(trainer.bundle, cfg.batch_size, cfg.ulb_batch_size,
                       seed=0)
    batches = [trainer._put_batch(next(loader)) for _ in range(8)]

    # warmup/compile
    state = trainer.state
    for i in range(3):
        state, m = trainer._jit_step(state, batches[i % len(batches)])
    jax.block_until_ready(m["total_loss"])

    n_steps = 200
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = trainer._jit_step(state, batches[i % len(batches)])
    jax.block_until_ready(m["total_loss"])
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    steps_per_sec_per_chip = n_steps / dt / n_chips
    # stage 2 scores the ulb batch once per step (+1 mean scoring in sr_update)
    rewards_per_sec = steps_per_sec_per_chip * cfg.ulb_batch_size * 2

    print(json.dumps({
        "metric": "SSL steps/sec/chip (CIFAR-100 ViT-S FlexMatch+SR, stage-2)",
        "value": round(steps_per_sec_per_chip, 3),
        "unit": "steps/s/chip",
        "vs_baseline": None,
        "extras": {
            "reward_scorings_per_sec": round(rewards_per_sec, 1),
            "n_chips": n_chips,
            "batch_size": cfg.batch_size,
            "uratio": cfg.uratio,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
