#!/usr/bin/env python
"""Log aggregator (reference scripts/average_log.py:12-60): scrape log.txt
files for best/top-1 accuracy curves, average the last 1/20/50 evals across
seeds."""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import re

import numpy as np

BEST_RE = re.compile(r"best (\d+\.\d+)|BEST_EVAL_ACC: (\d+\.\d+)")
ACC_RE = re.compile(r"top-1-acc[=:]\s*(\d+\.\d+)")


def parse_log(path: str):
    best, accs = None, []
    with open(path) as f:
        for line in f:
            m = ACC_RE.search(line)
            if m:
                accs.append(float(m.group(1)))
            b = BEST_RE.search(line)
            if b:
                best = float(b.group(1) or b.group(2))
    return best, accs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="./saved_models")
    p.add_argument("--run_prefix", required=True,
                   help="e.g. fixmatch_cifar10_40 (seeds appended)")
    p.add_argument("--seeds", type=int, default=3)
    args = p.parse_args()

    bests, last1, last20, last50 = [], [], [], []
    for seed in range(args.seeds):
        path = os.path.join(args.save_dir, f"{args.run_prefix}_{seed}",
                            "log.txt")
        if not os.path.isfile(path):
            print(f"missing: {path}")
            continue
        best, accs = parse_log(path)
        if best is not None:
            bests.append(best)
        if accs:
            last1.append(accs[-1])
            last20.append(np.mean(accs[-20:]))
            last50.append(np.mean(accs[-50:]))

    def report(name, xs):
        if xs:
            print(f"{name}: {np.mean(xs)*100:.2f} +- {np.std(xs)*100:.2f} "
                  f"(n={len(xs)})")

    report("best", bests)
    report("last-1", last1)
    report("last-20 avg", last20)
    report("last-50 avg", last50)


if __name__ == "__main__":
    main()
