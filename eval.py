#!/usr/bin/env python
"""Offline evaluation CLI (reference eval.py:12-98): load a checkpoint's EMA
weights, run feature+fc forward over the eval split, print metrics."""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--load_path", type=str, required=True)
    p.add_argument("--dataset", type=str, default="cifar10")
    p.add_argument("--data_dir", type=str, default="./data")
    p.add_argument("--net", type=str, default="wrn_28_2")
    p.add_argument("--num_classes", type=int, default=10)
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--crop_ratio", type=float, default=0.875)
    # NLP / audio modality geometry (reference eval.py:33-35)
    p.add_argument("--max_length", type=int, default=512)
    p.add_argument("--max_length_seconds", type=float, default=4.0)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--use_train_model", action="store_true",
                   help="evaluate raw params instead of the EMA shadow")
    args = p.parse_args(argv)

    import semireward_tpu  # noqa: F401
    from semireward_tpu.config import get_config
    from semireward_tpu.core.trainer import Trainer

    # algorithm-agnostic like the reference (eval.py:39-48 loads only the
    # ema_model weights): graft params/ema/batch_stats from a checkpoint
    # written by ANY algorithm, ignoring its optimizer/algo/SR state
    cfg = get_config(dict(
        algorithm="fixmatch", net=args.net, dataset=args.dataset,
        data_dir=args.data_dir, num_classes=args.num_classes,
        num_labels=args.num_classes, img_size=args.img_size,
        crop_ratio=args.crop_ratio, max_length=args.max_length,
        max_length_seconds=args.max_length_seconds,
        sample_rate=args.sample_rate,
        eval_batch_size=args.batch_size, num_train_iter=1, num_eval_iter=1,
        save_name="eval"))
    tr = Trainer(cfg, use_mesh=False)
    tr.load_weights(args.load_path)
    tr.eval_use_ema = not args.use_train_model
    metrics = tr.evaluate()
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v:.4f}")
    print(f"Test Accuracy: {metrics['top-1-acc']:.4f}")
    return metrics


if __name__ == "__main__":
    main()
