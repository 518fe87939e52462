#!/usr/bin/env python
"""Calibrate the golden benchmark (VERDICT r2 item 1): sweep the
synthetic_orbit task and print per-(alg, seed, iters) accuracies as JSON
lines, so the golden-tier bounds are derived from measurements.

Target operating point: labeled-only ~0.55-0.65, fixmatch-class gain
+0.15-0.25, stable across seeds.

Usage:
  python scripts/calibrate_golden.py --iters 400,1000 --seeds 0,1 \
      --algs baseline,fixmatch,flexmatch [--noise 40] [--t_lab 0.10]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default="400,1000")
    p.add_argument("--seeds", default="0,1")
    p.add_argument("--algs", default="baseline,fixmatch,flexmatch")
    p.add_argument("--noise", type=int, default=40)
    p.add_argument("--rot_lab", type=float, default=10.0)
    p.add_argument("--rot_max", type=float, default=90.0)
    p.add_argument("--labels", type=int, default=24)
    p.add_argument("--num_classes", type=int, default=6)
    p.add_argument("--dataset", default="synthetic_orbit")
    p.add_argument("--class_sim", default="0.0",
                   help="comma list of synthetic_class_sim values "
                        "(dataset=synthetic)")
    p.add_argument("--proto_scale", type=int, default=0,
                   help="kxk low-frequency prototype grid (dataset=synthetic)")
    p.add_argument("--out", default="")
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

    rows = []
    for sim in [float(x) for x in args.class_sim.split(",")]:
        for iters in [int(x) for x in args.iters.split(",")]:
            for seed in [int(x) for x in args.seeds.split(",")]:
                for alg in args.algs.split(","):
                    name = "fixmatch" if alg == "baseline" else alg
                    lam = 0.0 if alg == "baseline" else 1.0
                    out = run_golden(
                        name, iters=iters, seed=seed, lambda_u=lam,
                        labels=args.labels, num_classes=args.num_classes,
                        noise=args.noise, dataset=args.dataset,
                        orbit_rot_lab=args.rot_lab,
                        orbit_rot_max=args.rot_max,
                        synthetic_class_sim=sim,
                        synthetic_proto_scale=args.proto_scale)
                    row = dict(alg=alg, seed=seed, iters=iters,
                               noise=args.noise, class_sim=sim,
                               rot_lab=args.rot_lab, rot_max=args.rot_max,
                               proto_scale=args.proto_scale,
                               dataset=args.dataset, acc=out["acc"])
                    rows.append(row)
                    print(json.dumps(row, default=float), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1, default=float)


if __name__ == "__main__":
    main()
