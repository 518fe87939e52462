#!/usr/bin/env python
"""Long-horizon SemiReward run at the REFERENCE cadence (VERDICT r3 #5).

Runs srflexmatch on the synthetic-orbit benchmark for >=25k iterations
with the reference hyperparameters start_timing=20000, N_k=10
(config/SemiReward/usb_cv/flexmatch/flexmatch_cifar100_200_0.yaml:55-61)
so the run crosses the genuine stage-1 -> stage-2 boundary on-chip, and
records the reward / keep-rate / util_ratio trajectories around it from
the run's metrics.jsonl.

Writes QUALITY_r<round>_long_horizon.json at the repo root.

Round-5 extension (VERDICT r5 ask #5): ``--per-sample --class-noise`` runs
the same reference-cadence horizon with the beyond-reference per-sample
rewarder under class-conditional pseudo-label noise (classes (0,1) shifted
by 3 — the filter the faithful batch-collapsed architecture provably cannot
express, docs/quality.md), recording keep-rate-on-polluted vs
keep-rate-on-clean trajectories across the stage-1/2 boundary.

Usage: python scripts/sr_long_horizon.py [--round 4] [--iters 25600]
       python scripts/sr_long_horizon.py --round 5 --per-sample \
           --class-noise --seed 0
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, default=4)
    p.add_argument("--iters", type=int, default=25600)
    p.add_argument("--start-timing", type=int, default=20000)
    p.add_argument("--n-k", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--per-sample", action="store_true",
                   help="sr_per_sample=True (beyond-reference per-sample "
                        "rewarder)")
    p.add_argument("--class-noise", action="store_true",
                   help="class-conditional pseudo-label noise: classes "
                        "(0,1) shifted by 3 (docs/quality.md protocol)")
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

    from semireward_tpu.validation import golden_config, make_noisy_flexmatch
    from semireward_tpu.core.trainer import Trainer

    t0 = time.time()
    # unique per-variant dir + fresh metrics.jsonl: metrics sinks APPEND,
    # and a stale trajectory from a previous run in the same dir would
    # silently pollute the extracted windows
    save_dir = (f"/tmp/srt_long_horizon_r{args.round}"
                + ("_ps" if args.per_sample else "")
                + ("_cc" if args.class_noise else ""))
    extra_cfg = {}
    alg_factory = None
    if args.per_sample:
        extra_cfg["sr_per_sample"] = True
    if args.class_noise:
        _, SRNoisy = make_noisy_flexmatch(1.0, classes=(0, 1), shift=3)
        alg_factory = lambda c, d: SRNoisy(c, d)  # noqa: E731
    cfg = golden_config(
        "srflexmatch", iters=args.iters, seed=args.seed,
        start_timing=args.start_timing, N_k=args.n_k,
        save_dir=save_dir,
        # trajectory resolution: a metrics row every 100 steps; evals at
        # quarter points so accuracy brackets the boundary
        num_log_iter=100, num_eval_iter=args.iters // 4, **extra_cfg)
    stale = _os.path.join(save_dir, cfg.save_name, "metrics.jsonl")
    if _os.path.exists(stale):
        _os.remove(stale)
    tr = Trainer(cfg, use_mesh=False, alg_factory=alg_factory)
    print(f"[{time.time()-t0:6.1f}s] trainer built "
          f"(device={jax.devices()[0].device_kind}); training "
          f"{args.iters} iters, stage-2 from {args.start_timing}",
          file=_sys.stderr)
    res = tr.train()
    dt = time.time() - t0
    print(f"[{dt:6.1f}s] done: {res.get('eval/top-1-acc')}",
          file=_sys.stderr)

    # trajectory from metrics.jsonl
    rows = []
    mpath = _os.path.join(save_dir, cfg.save_name, "metrics.jsonl")
    with open(mpath) as f:
        for line in f:
            r = json.loads(line)
            if "train/util_ratio" in r or "train/sr_keep_ratio" in r:
                rows.append({
                    "step": r.get("step"),
                    "util_ratio": r.get("train/util_ratio"),
                    "sr_keep_ratio": r.get("train/sr_keep_ratio"),
                    "sr_keep_polluted": r.get("train/sr_keep_polluted"),
                    "sr_keep_clean": r.get("train/sr_keep_clean"),
                    "max_reward": r.get("train/max_reward"),
                    "total_loss": r.get("train/total_loss"),
                    "steps_per_sec": r.get("train/steps_per_sec"),
                })

    st = args.start_timing

    def window(lo, hi):
        sel = [r for r in rows if lo <= (r["step"] or 0) < hi]
        if not sel:
            return None
        keys = ("util_ratio", "sr_keep_ratio", "sr_keep_polluted",
                "sr_keep_clean", "max_reward", "total_loss")
        return {k: round(sum(float(r[k]) for r in sel if r[k] is not None)
                         / max(sum(1 for r in sel if r[k] is not None), 1), 4)
                for k in keys
                if any(r[k] is not None for r in sel)}

    variant = ("sr_per_sample " if args.per_sample else "") + \
              ("class-noise " if args.class_noise else "")
    report = {
        "task": (f"synthetic_orbit srflexmatch {variant}".strip()
                 + ", reference cadence"),
        "reference_anchor":
            "config/SemiReward/usb_cv/flexmatch/flexmatch_cifar100_200_0"
            ".yaml:55-61 (start_timing=20000, N_k=10)",
        "iters": args.iters, "start_timing": st, "N_k": args.n_k,
        "seed": args.seed, "device": str(jax.devices()[0]),
        "wall_seconds": round(dt, 1),
        "final": {k: v for k, v in res.items() if k.startswith("eval/")},
        "stage1_late_window": window(st - 2000, st),
        "boundary_window": window(st, st + 2000),
        "stage2_late_window": window(args.iters - 2000, args.iters),
        "n_trajectory_rows": len(rows),
        "trajectory_every_100_steps": rows[::5],  # thinned for the artifact
    }
    suffix = ""
    if args.per_sample or args.class_noise:
        suffix = ("_per_sample" if args.per_sample else "") + \
                 ("_ccnoise" if args.class_noise else "") + \
                 f"_s{args.seed}"
    out = f"QUALITY_r{args.round:02d}_long_horizon{suffix}.json"
    with open(_os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), out), "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
