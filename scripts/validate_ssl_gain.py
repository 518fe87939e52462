#!/usr/bin/env python
"""SSL sanity validation: FixMatch with unlabeled data must beat the
labeled-only baseline on the same label budget (the core SSL contract).
Runs on whatever accelerator jax sees; synthetic data, a few minutes.

Usage: python scripts/validate_ssl_gain.py [--iters 800] [--labels 8]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def run(algorithm: str, iters: int, labels: int, seed: int = 0,
        lambda_u: float = 1.0):
    import jax.numpy as jnp
    from semireward_tpu.config import get_config
    from semireward_tpu.core.trainer import Trainer

    cfg = get_config(dict(
        algorithm=algorithm, ulb_loss_ratio=lambda_u,
        net="wrn_28_2", dataset="synthetic",
        num_classes=4, num_labels=labels, batch_size=8, uratio=4,
        eval_batch_size=64, img_size=32, num_train_iter=iters,
        num_eval_iter=iters, num_log_iter=max(iters // 4, 1),
        optim="SGD", lr=0.03, ema_m=0.0, p_cutoff=0.95, seed=seed,
        save_dir="/tmp/ssl_gain", save_name=f"{algorithm}_{seed}",
        mesh_shape=(-1,)))
    # color ops would scramble color-defined blob classes — use the
    # no-color RandAugment variant (a reference feature, medmnist.py:891)
    cfg.extra.update(synthetic_train=2048, synthetic_test=512,
                     bn_momentum=0.9, synthetic_noise=110,
                     randaug_no_color=True)
    tr = Trainer(cfg)
    res = tr.train()
    return res["eval/top-1-acc"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=800)
    p.add_argument("--labels", type=int, default=8)
    p.add_argument("--seeds", type=int, default=1)
    args = p.parse_args()

    sup, ssl = [], []
    for s in range(args.seeds):
        # labeled-only baseline: same algorithm/schedule with the unlabeled
        # loss zeroed (the reference's 'fullysupervised' uses ALL labels —
        # an upper bound, not the baseline)
        sup.append(run("fixmatch", args.iters, args.labels, s, lambda_u=0.0))
        ssl.append(run("fixmatch", args.iters, args.labels, s, lambda_u=1.0))
    out = {"supervised_acc": sup, "fixmatch_acc": ssl,
           "gain": sum(ssl) / len(ssl) - sum(sup) / len(sup)}
    print(json.dumps(out))
    assert out["gain"] > -0.02, "SSL should not hurt"


if __name__ == "__main__":
    main()
