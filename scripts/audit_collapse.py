#!/usr/bin/env python
"""Audit the round-2 seed-2 collapses (VERDICT r2 item 3): freematch and
defixmatch fell to chance (0.27 / 0.256) at seed 2 on the round-2 golden
task while other seeds were fine. Rerun those exact configurations with a
dense metrics cadence and summarize the loss/util_ratio/threshold traces,
so the collapse is either (a) traced to a bug, or (b) documented as the
faithful instability mechanism with evidence.

Writes QUALITY_r03_collapse_audit.json and prints a trace table.
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def trace_of(save_dir, save_name):
    path = _os.path.join(save_dir, save_name, "metrics.jsonl")
    rows = []
    with open(path) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def summarize(rows, keys):
    out = []
    for r in rows:
        if "train/total_loss" not in r:
            continue
        pick = {"step": r.get("step")}
        for k in keys:
            if f"train/{k}" in r:
                pick[k] = r[f"train/{k}"]
        out.append(pick)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--algs", default="freematch,defixmatch")
    p.add_argument("--task", choices=["r2", "orbit"], default="r2",
                   help="r2 = the round-2 golden task the collapses were "
                        "observed on; orbit = the round-3 benchmark "
                        "(freematch's seed-2 dip)")
    args = p.parse_args()

    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from semireward_tpu.validation import run_golden

    task_kw = (dict(dataset="synthetic", num_classes=4, labels=8, noise=110)
               if args.task == "r2" else {})
    report = {"seed": args.seed, "iters": args.iters,
              "task": ("round-2 golden (synthetic 4-class, noise 110, "
                       "8 labels)" if args.task == "r2"
                       else "round-3 orbit benchmark")}
    for alg in args.algs.split(","):
        save_dir = f"/tmp/srt_audit_{alg}_{args.seed}_{args.task}"
        # the audited operating point, dense logging
        out = run_golden(alg, iters=args.iters, seed=args.seed,
                         save_dir=save_dir, num_log_iter=10,
                         num_eval_iter=max(args.iters // 3, 1), **task_kw)
        rows = trace_of(save_dir, f"{alg}_{args.seed}_1.0")
        keys = ["total_loss", "sup_loss", "unsup_loss", "util_ratio",
                "time_p", "max_prob_mean", "ent_loss",
                "anti_unsup_loss", "util_ratio_lb"]
        tr = summarize(rows, keys)
        report[alg] = {"final_acc": out["acc"], "trace": tr}
        print(f"\n=== {alg} @seed{args.seed}: final acc {out['acc']:.3f} ===")
        for row in tr:
            print(json.dumps(row, default=float))

    out_name = ("QUALITY_r03_collapse_audit.json" if args.task == "r2"
                else "QUALITY_r03_collapse_audit_orbit.json")
    with open(out_name, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(f"wrote {out_name}")


if __name__ == "__main__":
    main()
