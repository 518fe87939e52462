#!/usr/bin/env python
"""Config-corpus generator.

Rebuild of the reference's five scripts/config_generator_*.py (which emit
the 1,158 YAML corpus). One generator covers all suites; emitted YAMLs use
the reference key names and load through semireward_tpu.config.from_yaml
unchanged.

Usage: python scripts/config_generator.py --suite usb_cv --out config/
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import yaml

SR_ALGS = ["srpseudolabel", "srfixmatch", "srflexmatch", "srfreematch",
           "srsoftmatch"]
BASE_ALGS = ["pseudolabel", "pimodel", "meanteacher", "vat", "mixmatch",
             "remixmatch", "uda", "fixmatch", "dash", "flexmatch", "adamatch",
             "crmatch", "comatch", "simmatch", "freematch", "softmatch",
             "defixmatch", "fullysupervised"]

SUITES = {
    # suite: (datasets -> (num_classes, img_size, net, label counts), optim)
    "classic_cv": {
        "net": "wrn_28_2", "optim": "SGD", "lr": 0.03, "weight_decay": 5e-4,
        "layer_decay": 1.0, "num_train_iter": 1 << 20, "num_eval_iter": 5120,
        "batch_size": 64, "uratio": 7, "use_pretrain": False, "ema_m": 0.999,
        "datasets": {
            "cifar10": (10, 32, [40, 250, 4000]),
            "cifar100": (100, 32, [400, 2500, 10000]),
            "svhn": (10, 32, [40, 1000]),
            "stl10": (10, 96, [40, 1000]),
        },
    },
    "usb_cv": {
        "net": "vit_small_patch2_32", "optim": "AdamW", "lr": 5e-4,
        "weight_decay": 5e-4, "layer_decay": 0.5,
        "num_train_iter": 204800, "num_eval_iter": 2048, "batch_size": 8,
        "uratio": 1, "use_pretrain": True, "ema_m": 0.0,
        "datasets": {
            "cifar100": (100, 32, [200, 400]),
            "stl10": (10, 96, [40, 100]),
            "eurosat": (10, 32, [20, 40]),
            "tissuemnist": (8, 32, [80, 400]),
        },
    },
    "usb_nlp": {
        "net": "bert_base_uncased", "optim": "AdamW", "lr": 5e-5,
        "weight_decay": 1e-4, "layer_decay": 0.65,
        "num_train_iter": 102400, "num_eval_iter": 2048, "batch_size": 4,
        "uratio": 1, "use_pretrain": True, "ema_m": 0.0,
        "datasets": {
            "aclImdb": (2, 0, [20, 100]),
            "ag_news": (4, 0, [40, 200]),
            "amazon_review": (5, 0, [250, 1000]),
            "yahoo_answers": (10, 0, [500, 2000]),
            "yelp_review": (5, 0, [250, 1000]),
        },
    },
    # pod-scale stretch (BASELINE.json configs[4]): ImageNet-1k ViT-B
    # FreeMatch+SemiReward over a 2-D (data, fsdp) mesh
    "imagenet_stretch": {
        "net": "vit_base_patch16_224", "optim": "AdamW", "lr": 1e-3,
        "weight_decay": 0.05, "layer_decay": 0.75,
        "num_train_iter": 1 << 20, "num_eval_iter": 10240, "batch_size": 256,
        "uratio": 1, "use_pretrain": False, "ema_m": 0.999,
        "datasets": {
            "imagenet": (1000, 224, [100000]),
        },
        "extra": {"mesh_shape": (-1, 4), "mesh_axes": ("data", "fsdp"),
                  "gradient_checkpointing": True},
    },
    "usb_audio": {
        "net": "hubert_base", "optim": "AdamW", "lr": 5e-5,
        "weight_decay": 1e-4, "layer_decay": 0.75,
        "num_train_iter": 102400, "num_eval_iter": 2048, "batch_size": 8,
        "uratio": 1, "use_pretrain": True, "ema_m": 0.0,
        "datasets": {
            "gtzan": (10, 0, [100, 400]),
            "urbansound8k": (10, 0, [100, 400]),
            "fsdnoisy": (10, 0, [1773]),
            "superbks": (10, 0, [50, 100]),
            "esc50": (50, 0, [250, 500]),
        },
    },
}

SR_EXTRA = {"start_timing": 20000, "feature_dim": 384, "sr_lr": 0.0005,
            "N_k": 10, "sr_ema": False, "sr_ema_m": 0.99}


def create_configuration(suite: str, alg: str, dataset: str, num_labels: int,
                         seed: int, out_dir: str):
    sp = SUITES[suite]
    C_, img, _ = sp["datasets"][dataset]
    name = f"{alg}_{dataset}_{num_labels}_{seed}"
    cfg = {
        "algorithm": alg,
        "save_dir": f"./saved_models/{suite}/",
        "save_name": name,
        "resume": True,
        "load_path": f"./saved_models/{suite}/{name}/latest_model.ckpt",
        "overwrite": True,
        "epoch": max(sp["num_train_iter"] // 1024, 1),
        "num_train_iter": sp["num_train_iter"],
        "num_eval_iter": sp["num_eval_iter"],
        "num_log_iter": 256,
        "batch_size": sp["batch_size"],
        "eval_batch_size": 16,
        "num_labels": num_labels,
        "uratio": sp["uratio"],
        "ema_m": sp["ema_m"],
        "img_size": img or 32,
        "crop_ratio": 0.875,
        "optim": sp["optim"],
        "lr": sp["lr"],
        "layer_decay": sp["layer_decay"],
        "momentum": 0.9,
        "weight_decay": sp["weight_decay"],
        "amp": False,
        "clip": 0.0,
        "use_cat": True,
        "net": sp["net"],
        "data_dir": "./data",
        "dataset": dataset,
        "num_classes": C_,
        "seed": seed,
        "use_pretrain": sp["use_pretrain"],
    }
    cfg.update(sp.get("extra", {}))
    if alg.startswith("sr"):
        extra = dict(SR_EXTRA)
        if suite in ("usb_nlp", "usb_audio"):
            extra["start_timing"] = 10000
            extra["feature_dim"] = 768
        cfg.update(extra)
    path = os.path.join(out_dir, suite, alg)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name + ".yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="all",
                   choices=["all"] + list(SUITES))
    p.add_argument("--out", default="config")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--sr_only", action="store_true")
    args = p.parse_args()

    suites = list(SUITES) if args.suite == "all" else [args.suite]
    n = 0
    for suite in suites:
        algs = SR_ALGS if args.sr_only else (BASE_ALGS + SR_ALGS)
        for alg in algs:
            for ds, (_, _, label_counts) in SUITES[suite]["datasets"].items():
                for nl in label_counts:
                    for seed in range(args.seeds):
                        create_configuration(suite, alg, ds, nl, seed, args.out)
                        n += 1
    print(f"wrote {n} configs under {args.out}/")


if __name__ == "__main__":
    main()
