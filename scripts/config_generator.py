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

# classic_cv_imb (reference config/classic_cv_imb/, 284 YAMLs): long-tailed
# splits as (num_labels, lb_imb_ratio, ulb_num_labels, ulb_imb_ratio).
# A negative ulb gamma means the unlabeled tail is reversed.
IMB_SETTINGS = {
    "cifar10": [(500, 100, 4000, 100), (500, 100, 4000, -100),
                (500, 150, 4000, 150), (1500, 100, 3000, 100),
                (1500, 100, 3000, -100), (1500, 150, 3000, 150)],
    "cifar100": [(150, 10, 300, 10), (150, 10, 300, -10),
                 (150, 15, 300, 15)],
    "stl10": [(150, 10, None, 1.0), (150, 20, None, 1.0)],
    "imagenet127": [(12810, 286, None, 286), (128101, 286, None, 286)],
}
IMB_NUM_CLASSES = {"cifar10": 10, "cifar100": 100, "stl10": 10,
                   "imagenet127": 127}
IMB_BASE_ALGS = ["fixmatch", "remixmatch", "supervised"]
# Wrapper availability mirrors the reference corpus (adsh/tras: fixmatch
# only; supervised: no wrappers; 'simis' appears in the reference's config
# tree but has NO implementation under semilearn/imb_algorithms/ — omitted).
IMB_WRAPPERS = [None, "abc", "adsh", "cossl", "crest", "crest+", "darp",
                "daso", "debiaspl", "saw", "tras"]
FIXMATCH_ONLY_WRAPPERS = {"adsh", "tras"}


def create_imb_configuration(base_alg: str, imb: "str | None", dataset: str,
                             setting, seed: int, out_dir: str):
    nl, lb_gamma, ulb_n, ulb_gamma = setting
    on_imagenet = dataset == "imagenet127"
    dir_name = base_alg if imb is None else f"{base_alg}_{imb}"
    name = (f"{dir_name}_{dataset}_lb{nl}_{lb_gamma}"
            f"_ulb{ulb_n if ulb_n is not None else 'None'}_{ulb_gamma}_{seed}")
    cfg = {
        "algorithm": base_alg,
        "save_dir": "./saved_models/classic_cv_imb",
        "save_name": name,
        "resume": True,
        "load_path": f"./saved_models/classic_cv_imb/{name}/latest_model.ckpt",
        "overwrite": True,
        "epoch": 200 if on_imagenet else 256,
        "num_train_iter": 500000 if on_imagenet else 262144,
        "num_eval_iter": 1024,
        "num_log_iter": 256,
        "num_labels": nl,
        "batch_size": 256 if on_imagenet else 64,
        "eval_batch_size": 256,
        "uratio": 2,
        "ema_m": 0.999,
        "crop_ratio": 0.875,
        "img_size": 112 if on_imagenet else (96 if dataset == "stl10" else 32),
        "optim": "SGD",
        "lr": 0.1 if on_imagenet else 0.03,
        "momentum": 0.9,
        "weight_decay": 1e-4 if on_imagenet else 5e-4,
        "layer_decay": 1.0,
        "amp": False,
        "clip": 0.0,
        "use_cat": True,
        "net": "resnet50" if on_imagenet else "wrn_28_2",
        "data_dir": "./data",
        "dataset": dataset,
        "num_classes": IMB_NUM_CLASSES[dataset],
        "seed": seed,
        "use_pretrain": False,
        "include_lb_to_ulb": False,
        "lb_imb_ratio": lb_gamma,
        "ulb_imb_ratio": ulb_gamma,
        "ulb_num_labels": ulb_n,
    }
    if imb is not None:
        cfg["imb_algorithm"] = imb
        # emit the wrapper's hyperparameters explicitly, as the reference
        # YAMLs do; values come from the implementation's DEFAULTS
        from semireward_tpu.registry import IMB_ALGORITHMS
        imb_cls = IMB_ALGORITHMS.get(imb)
        cfg.update(getattr(imb_cls, "DEFAULTS", {}))
    path = os.path.join(out_dir, "classic_cv_imb", dir_name)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name + ".yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return cfg


def create_configuration(suite: str, alg: str, dataset: str, num_labels: int,
                         seed: int, out_dir: str):
    sp = SUITES[suite]
    C_, img, _ = sp["datasets"][dataset]
    # SemiReward variants live under config/SemiReward/<suite>/<base>/ and
    # keep the BASE algorithm's file name, exactly like the reference
    # (config/SemiReward/usb_cv/flexmatch/flexmatch_cifar100_200_0.yaml has
    # `algorithm: srflexmatch` inside).
    is_sr = alg.startswith("sr")
    file_alg = alg[2:] if is_sr else alg
    name = f"{file_alg}_{dataset}_{num_labels}_{seed}"
    # ... but save_name keeps the sr prefix (reference convention)
    save_name = f"{alg}_{dataset}_{num_labels}_{seed}"
    cfg = {
        "algorithm": alg,
        "save_dir": f"./saved_models/{suite}/",
        "save_name": save_name,
        "resume": True,
        "load_path": f"./saved_models/{suite}/{save_name}/latest_model.ckpt",
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
    if is_sr:
        extra = dict(SR_EXTRA)
        if suite in ("usb_nlp", "usb_audio"):
            extra["start_timing"] = 10000
            extra["feature_dim"] = 768
        cfg.update(extra)
        path = os.path.join(out_dir, "SemiReward", suite, file_alg)
    else:
        path = os.path.join(out_dir, suite, alg)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name + ".yaml"), "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="all",
                   choices=["all", "classic_cv_imb"] + list(SUITES))
    p.add_argument("--out", default="config")
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--sr_only", action="store_true")
    args = p.parse_args()

    if args.suite == "all":
        suites = list(SUITES) + ["classic_cv_imb"]
    else:
        suites = [args.suite]
    n = 0
    for suite in suites:
        if suite == "classic_cv_imb":
            if args.sr_only:
                continue
            for base_alg in IMB_BASE_ALGS:
                wrappers = [None] if base_alg == "supervised" else [
                    w for w in IMB_WRAPPERS
                    if w is None or base_alg == "fixmatch"
                    or w not in FIXMATCH_ONLY_WRAPPERS]
                for imb in wrappers:
                    for ds, settings in IMB_SETTINGS.items():
                        for setting in settings:
                            for seed in range(args.seeds):
                                create_imb_configuration(
                                    base_alg, imb, ds, setting, seed, args.out)
                                n += 1
            continue
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
