#!/usr/bin/env python
"""Evidence run for the beyond-reference ``sr_per_sample`` mode.

Repeats docs/quality.md's two SemiReward noise experiments (identical
parameters to scripts/golden_quality.py) with ``cfg.sr_per_sample=True``:

- 40% uniform pseudo-label noise: the faithful architecture can only act
  per LABEL, so uniform noise gives it no signal (measured gains +0.03 to
  +0.14 track the downweighting control). Per-sample scoring CAN separate
  corrupted pairs by their features.
- class-conditional noise (classes [0,1] corrupted, shift 3): the direct
  per-label filter test the faithful training signal provably fails
  (keep rates do not track per-label pair accuracy; docs/quality.md).

Writes QUALITY_r03_sr_per_sample.json next to the other QUALITY files.

Usage: python scripts/sr_per_sample_eval.py [--seeds 0 1 2] [--iters 500]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--out", default="QUALITY_r03_sr_per_sample.json")
    args = p.parse_args()

    from semireward_tpu.validation import sr_noise_experiment

    report = {"iters": args.iters, "mode": "sr_per_sample", "seeds": {}}
    for seed in args.seeds:
        uni = sr_noise_experiment(noise_frac=0.4, iters=args.iters,
                                  start_timing=120, seed=seed,
                                  sr_per_sample=True)
        print(f"[ps] uniform @s{seed}: {json.dumps(uni, default=float)}",
              flush=True)
        cc = sr_noise_experiment(noise_frac=1.0, classes=(0, 1), shift=3,
                                 iters=args.iters, start_timing=120,
                                 seed=seed, sr_per_sample=True)
        print(f"[ps] class-cond @s{seed}: {json.dumps(cc, default=float)}",
              flush=True)
        report["seeds"][str(seed)] = {"uniform_noise": uni,
                                      "class_conditional_noise": cc}
        with open(args.out, "w") as f:  # checkpoint after each seed
            json.dump(report, f, indent=1, default=float)
    print(f"[ps] wrote {args.out}")


if __name__ == "__main__":
    main()
