#!/usr/bin/env python
"""Training CLI — reference-compatible entry point.

``python train.py --c config/foo.yaml [--key value ...]`` mirrors the
reference train.py:29-269 (argparse defaults -> YAML overwrite -> CLI
overrides, per-algorithm defaults injected). The torch-era multi-process
spawn/NCCL bootstrap (train.py:272-431) has no TPU counterpart: parallelism
is a jax.sharding.Mesh inside one process per host.
"""
from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="semireward_tpu trainer")
    p.add_argument("--c", "--config", dest="config", type=str, default=None,
                   help="YAML config (reference key names accepted)")
    p.add_argument("--resume", action="store_true", default=None)
    args, unknown = p.parse_known_args(argv)

    overrides = {}
    key = None
    for tok in unknown:
        if tok.startswith("--"):
            if "=" in tok:
                k, v = tok[2:].split("=", 1)
                overrides[k] = v
            else:
                key = tok[2:]
        elif key is not None:
            overrides[key] = tok
            key = None
    if args.resume is not None:
        overrides["resume"] = args.resume
    return args.config, overrides


def main(argv=None):
    config_path, overrides = parse_args(argv)
    from semireward_tpu import config as config_lib
    from semireward_tpu.core.trainer import Trainer
    from semireward_tpu.utils.logging import get_logger

    if config_path:
        cfg = config_lib.from_yaml(config_path, overrides)
    else:
        cfg = config_lib.from_dict(overrides)

    save_path = os.path.join(cfg.save_dir, cfg.save_name)
    logger = get_logger(cfg.save_name, save_path)
    logger.info(f"algorithm={cfg.algorithm} net={cfg.net} dataset={cfg.dataset} "
                f"num_labels={cfg.num_labels} iters={cfg.num_train_iter}")

    trainer = Trainer(cfg, logger=logger)
    if cfg.resume and cfg.load_path and os.path.exists(
            cfg.load_path.replace(".pth", ".ckpt")):
        try:
            trainer.load(cfg.load_path.replace(".pth", ".ckpt"))
        except Exception as e:  # reference degrades to fresh start (train.py:406-413)
            logger.warning(f"resume failed ({e}); fresh start")

    results = trainer.train()
    for k, v in sorted(results.items()):
        logger.info(f"{k}: {v}")

    # reference train.py:427-429 runs an optional post-train finetune stage;
    # no built-in algorithm defines one (dead in the reference too), but
    # Trainer subclasses providing finetune() get the same call site.
    if hasattr(trainer, "finetune"):
        logger.info("Finetune stage")
        trainer.finetune()
    return results


if __name__ == "__main__":
    main()
