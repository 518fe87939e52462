#!/usr/bin/env python
"""Produce the golden-learning QUALITY report (accuracy evidence for every
algorithm family — the distilled version of the reference's benchmark-CSV
contract, results/README.md:3).

Runs on whatever accelerator jax sees (a few minutes per run on TPU).
Writes QUALITY_r<round>.json at the repo root and docs/quality.md.

Usage: python scripts/golden_quality.py [--round 2] [--iters 300]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


THRESHOLD_FAMILIES = ["fixmatch", "flexmatch", "freematch", "softmatch",
                      "uda", "adamatch", "dash"]
# the consistency / mixing / net-wrapper families (everything else in the
# ALGORITHMS registry that trains on unlabeled data)
EXTRA_FAMILIES = ["pseudolabel", "meanteacher", "pimodel", "vat", "mixmatch",
                  "remixmatch", "comatch", "simmatch", "crmatch", "defixmatch"]
IMB_METHODS = ["saw", "debiaspl", "abc"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, default=3)
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--sr_iters", type=int, default=500)
    p.add_argument("--imb_iters", type=int, default=400)
    p.add_argument("--skip_imb", action="store_true")
    p.add_argument("--skip_extra", action="store_true",
                   help="skip the consistency/net-wrapper families")
    p.add_argument("--only_extra", action="store_true",
                   help="run ONLY the extra families and merge them into an "
                        "existing QUALITY_r<round>.json")
    p.add_argument("--seed", type=int, default=0,
                   help="data/init seed; a non-zero seed writes "
                        "QUALITY_r<round>_seed<seed>.json (robustness check) "
                        "and leaves docs/quality.md untouched")
    p.add_argument("--tier", default="base", choices=["base", "hard"],
                   help="golden tier (validation.golden_config): 'hard' "
                        "runs the un-saturated 8-class/160-degree orbit "
                        "(VERDICT r5 ask #6) and writes "
                        "QUALITY_r<round>_hard[_seedN].json; family sweep "
                        "only (the SR-noise/imb sections stay on the base "
                        "tier they were calibrated on)")
    p.add_argument("--save_dir", default=None,
                   help="run_golden save_dir override — lets two sweeps "
                        "(e.g. a TPU run and a CPU insurance run under "
                        "JAX_PLATFORMS=cpu) coexist without sharing "
                        "/tmp/srt_golden run dirs")
    args = p.parse_args()

    # persistent XLA compile cache (same dir bench.py uses): re-sweeps with
    # identical programs (e.g. other seeds) skip the remote compiles
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from semireward_tpu.validation import (imb_gain, run_golden,
                                           sr_noise_experiment)

    suffix = ("_hard" if args.tier == "hard" else "") + (
        f"_seed{args.seed}" if args.seed else "")
    out_path = f"QUALITY_r{args.round:02d}{suffix}.json"
    if args.only_extra:
        with open(out_path) as f:
            report = json.load(f)
        sup = report["labeled_only_acc"]
        _run_extra(report, sup, args, run_golden)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, default=float)
        print(f"updated {out_path}")
        if not args.seed:  # seed runs never touch docs/quality.md
            _write_md(report, args.round)
        return

    report = {"iters": args.iters, "seed": args.seed, "tier": args.tier}

    _sd = {"save_dir": args.save_dir} if args.save_dir else {}

    # 1) shared labeled-only baseline + every thresholding family
    sup = run_golden("fixmatch", iters=args.iters, lambda_u=0.0,
                     seed=args.seed, tier=args.tier, **_sd)["acc"]
    report["labeled_only_acc"] = sup
    fam = {}
    for alg in THRESHOLD_FAMILIES:
        acc = run_golden(alg, iters=args.iters, lambda_u=1.0,
                         seed=args.seed, tier=args.tier, **_sd)["acc"]
        fam[alg] = {"ssl_acc": acc, "gain_vs_labeled_only": acc - sup}
        print(f"[golden] {alg}: {acc:.4f} (labeled-only {sup:.4f})")
    report["thresholding_families"] = fam

    # 1b) the remaining families (consistency / mixing / net-wrapper)
    if not args.skip_extra:
        _run_extra(report, sup, args, run_golden)
    if args.tier == "hard":
        # hard tier = family sweep only; the SR-noise + imb protocols are
        # calibrated on the base tier and keep their own artifacts
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, default=float)
        print(f"wrote {out_path}")
        return

    # 2) SemiReward under pseudo-label noise + the downweighting control
    sr = sr_noise_experiment(noise_frac=0.4, iters=args.sr_iters,
                             start_timing=120, seed=args.seed)
    # control: same noisy flexmatch with lambda_u set to SR's MEASURED
    # count-weighted keep rate from the run above — distinguishes "reward
    # selects good labels" from "reward filter merely downweights the
    # unsup loss" (a hardcoded 0.33 would misattribute the two whenever
    # the run's keep rate drifts from it)
    import numpy as _np
    _keep = _np.asarray(sr["per_label_keep_rate"], float)
    _cnt = _np.asarray(sr["per_label_count"], float)
    lam = float((_keep * _cnt).sum() / max(_cnt.sum(), 1.0))
    sr["control_lambda_u"] = lam
    from semireward_tpu.validation import make_noisy_flexmatch
    NoisyFlex, _ = make_noisy_flexmatch(0.4)
    ctrl = run_golden("flexmatch", alg_factory=lambda c, d: NoisyFlex(c, d),
                      iters=args.sr_iters, lambda_u=lam,
                      seed=args.seed)["acc"]
    sr["control_downweighted_acc"] = ctrl
    report["semireward_noise"] = sr
    print(f"[golden] sr noise: {json.dumps(sr, default=float)}")

    # 2b) CLASS-CONDITIONAL noise (VERDICT r2 item 2): only pseudo-labels
    # from 2 of the 6 classes are corrupted, so K label values carry
    # polluted pairs — the per-LABEL filter the Rewarder architecture can
    # actually express (DEVIATIONS.md 15b) gets a signal it can act on.
    cc = sr_noise_experiment(noise_frac=1.0, classes=(0, 1), shift=3,
                             iters=args.sr_iters, start_timing=120,
                             seed=args.seed)
    report["semireward_class_noise"] = cc
    print(f"[golden] sr class-noise: {json.dumps(cc, default=float)}")

    # 3) imbalanced tier
    if not args.skip_imb:
        imb = {}
        for m in IMB_METHODS:
            out = imb_gain(m, gamma=10.0, iters=args.imb_iters,
                           seed=args.seed)
            imb[m] = out
            print(f"[golden] imb {m}: {json.dumps(out, default=float)}")
        report["imbalanced"] = imb

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(f"wrote {out_path}")

    if not args.seed:
        _write_md(report, args.round)


def _run_extra(report, sup, args, run_golden):
    fam = report.setdefault("other_families", {})
    _sd = ({"save_dir": args.save_dir}
           if getattr(args, "save_dir", None) else {})
    for alg in EXTRA_FAMILIES:
        try:
            acc = run_golden(alg, iters=args.iters, lambda_u=1.0,
                             seed=args.seed,
                             tier=getattr(args, "tier", "base"), **_sd)["acc"]
        except Exception as e:  # keep the sweep going, record the failure
            print(f"[golden] {alg}: FAILED {e}")
            fam[alg] = {"error": str(e)[:200]}
            continue
        fam[alg] = {"ssl_acc": acc, "gain_vs_labeled_only": acc - sup}
        print(f"[golden] {alg}: {acc:.4f} (labeled-only {sup:.4f})")


def _seed_section(report, rnd):
    """Cross-seed robustness table over THIS round's QUALITY seed-file
    siblings (the reference reports its own tables as mean±std over 3
    seeds). Round-scoped on purpose: earlier rounds ran a different
    benchmark task, so their seed files are not comparable columns."""
    import glob
    import statistics
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    sibs = sorted(glob.glob(
        _os.path.join(root, f"QUALITY_r{rnd:02d}_seed*.json")))
    sibs = [s for s in sibs if "probe" not in s]
    if not sibs:
        return []
    alts = [json.load(open(s)) for s in sibs]
    # never double-count the report itself if it IS a seed file, and never
    # mix horizons: a sibling produced with a different --iters is a
    # different experiment (curriculum families are known to flip sign
    # between 300 and 1000 iters), not another seed column
    alts = [a for a in alts if a.get("seed") != report.get("seed")
            and a.get("iters") == report.get("iters")]
    reports = [report] + alts
    seeds = [r["seed"] for r in reports]
    lines = ["", "## Seed robustness",
             "",
             f"The sweep across seeds {seeds} (labeled-only baselines "
             + ", ".join(f"{r['labeled_only_acc']:.3f}" for r in reports)
             + "):",
             "",
             "| algorithm | " + " | ".join(f"gain @s{s}" for s in seeds)
             + " | mean ± std |", "|---|" + "---|" * (len(seeds) + 1)]

    def fams(r):
        return {**r.get("thresholding_families", {}),
                **r.get("other_families", {})}

    per = [fams(r) for r in reports]
    neg_all, pos_all = [], []
    for algn, r in per[0].items():
        gains = [p.get(algn, {}).get("gain_vs_labeled_only") for p in per]
        if any(g is None for g in gains):
            continue
        mu = statistics.mean(gains)
        sd = statistics.stdev(gains) if len(gains) > 1 else 0.0
        lines.append(f"| {algn} | "
                     + " | ".join(f"{g:+.3f}" for g in gains)
                     + f" | {mu:+.3f} ± {sd:.3f} |")
        if all(g < 0 for g in gains):
            neg_all.append(algn)
        if all(g > 0 for g in gains):
            pos_all.append(algn)
    summary = ""
    if pos_all:
        summary += (f"{len(pos_all)} families gain at EVERY seed "
                    f"({', '.join(pos_all)}). ")
    if neg_all:
        summary += (f"Only {', '.join(neg_all)} trail at every seed "
                    f"(see the short-horizon caveat above). ")
    srs = [r for r in reports if "semireward_noise" in r]
    if srs:
        summary += ("SemiReward noise recovery per seed: "
                    + ", ".join(
                        f"{r['semireward_noise'].get('sr_gain', float('nan')):+.3f}"
                        f" @s{r.get('seed', '?')} (noisy base "
                        f"{r['semireward_noise'].get('noisy_flexmatch_acc', float('nan')):.2f})"
                        for r in srs) + ".")
        ctrls = [r for r in srs
                 if "control_downweighted_acc" in r["semireward_noise"]]
        if ctrls:
            summary += (" Against the static-downweighting control SR is "
                        + ", ".join(
                            f"{r['semireward_noise']['sr_noisy_flexmatch_acc'] - r['semireward_noise']['control_downweighted_acc']:+.3f}"
                            f" @s{r.get('seed', '?')}" for r in ctrls) + ".")
    ccs = [r for r in reports if "semireward_class_noise" in r]
    if ccs:
        summary += (" Class-conditional noise (the per-label filter test, "
                    "see DEVIATIONS.md 15c): gain "
                    + ", ".join(
                        f"{r['semireward_class_noise'].get('sr_gain', float('nan')):+.3f}"
                        f" @s{r.get('seed', '?')}" for r in ccs) + ".")
    if summary:
        lines += ["", summary]
    return lines


def _sr_section(report):
    """SemiReward evidence, stated at the level the architecture supports.

    Mechanism (reference semireward.py:60-71, DEVIATIONS.md 15b): the
    Rewarder collapses each batch to ONE shared context vector; the
    per-sample reward is MLP(context + label_embedding[label]), so samples
    sharing a pseudo-label get identical rewards — the reward >= mean
    filter is a per-LABEL selector. The probes below are class-level
    accordingly (a per-sample 'separation' probe cannot measure anything
    this architecture can express)."""
    lines = []
    sr = report.get("semireward_noise")
    if sr:
        ctrl = sr.get("control_downweighted_acc", float("nan"))
        lines += [
            "",
            f"## SemiReward under {sr.get('noise_frac', 0.4):.0%} uniform "
            "pseudo-label noise",
            "",
            f"- noisy flexmatch: **{sr['noisy_flexmatch_acc']:.4f}**",
            f"- SR-filtered noisy flexmatch: "
            f"**{sr['sr_noisy_flexmatch_acc']:.4f}** "
            f"(gain {sr['sr_gain']:+.4f})",
            f"- control (noisy flexmatch, unsup loss statically "
            f"downweighted to SR's keep rate): {ctrl:.4f}",
            f"- rank correlation of per-label mean reward vs per-label "
            f"pair accuracy: Spearman "
            f"{sr.get('spearman_reward_vs_accuracy', float('nan')):+.3f}"
            f" (tie-corrected average ranks over occupied labels, "
            f"validation.py:_spearman)",
            "",
            "Mechanism note (VERDICT r2 item 2): the reference Rewarder "
            "computes ONE batch-shared context vector; per-sample reward = "
            "MLP(context + label_embedding[label]) "
            "(semireward.py:60-71), so two samples with the same pseudo-"
            "label in a batch get IDENTICAL rewards — the filter selects "
            "per LABEL, not per sample. Under UNIFORM noise every label "
            "value is equally polluted, so there is no per-label signal "
            "for the filter to find; any recovery here comes from "
            "batch-to-batch reward fluctuations plus the loss "
            "downweighting, which is why the control sits close to SR. "
            "The class-conditional experiment below is the filter the "
            "architecture CAN express.",
        ]
    cc = report.get("semireward_class_noise")
    if cc:
        lines += [
            "",
            f"## SemiReward under CLASS-CONDITIONAL noise "
            f"(classes {cc.get('corrupt_classes')} corrupted, shift "
            f"{cc.get('shift')})",
            "",
            f"- noisy flexmatch: **{cc['noisy_flexmatch_acc']:.4f}**",
            f"- SR-filtered noisy flexmatch: "
            f"**{cc['sr_noisy_flexmatch_acc']:.4f}** "
            f"(gain {cc['sr_gain']:+.4f})",
            f"- keep rate on POLLUTED label values "
            f"(labels {cc.get('polluted_labels')}): "
            f"**{cc.get('keep_rate_polluted_labels', float('nan')):.3f}** "
            f"vs CLEAN labels "
            f"**{cc.get('keep_rate_clean_labels', float('nan')):.3f}**",
            f"- per-label keep rates: "
            + ", ".join(f"{k:.2f}" for k in cc.get("per_label_keep_rate", [])),
            f"- Spearman(per-label reward, per-label pair accuracy): "
            f"{cc.get('spearman_reward_vs_accuracy', float('nan')):+.3f}",
            "",
            "Here only K of C pseudo-label values carry corrupted pairs — "
            "a per-label filter could suppress exactly those labels. The "
            "keep-rate split above is the direct test, and the filter "
            "FAILS it: kept labels do not track per-label pair accuracy. "
            "That is the faithful consequence of the reference's training "
            "signal (DEVIATIONS.md 15c): in both stages the rewarder only "
            "ever trains on (features, FROZEN-generator-label) pairs "
            "(srflexmatch.py:157-209; the generator's gradients are "
            "blocked forever by the .long() cast), so the label "
            "embeddings it must rank at filter time — the real "
            "pseudo-labels — are never visited by training, and its "
            "ranking over them is incidental. The architecture could "
            "express a per-label filter; the training signal cannot "
            "learn one.",
        ]
    return lines


def _collapse_section():
    """Trace-backed audit of the round-2 seed-2 collapses (VERDICT r2
    item 3), from scripts/audit_collapse.py output. Both mechanisms are
    FAITHFUL reference behavior, verified against the reference source."""
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    path = _os.path.join(root, "QUALITY_r03_collapse_audit.json")
    if not _os.path.exists(path):
        return []
    d = json.load(open(path))
    seed = d.get("seed", 2)
    lines = ["", f"## Collapse audits (round-2 task, seed {seed})",
             "",
             f"The round-2 golden task showed freematch and defixmatch at "
             f"chance (4 classes) at seed {seed} only. Reruns with dense "
             f"loss/threshold traces ({path.rsplit('/', 1)[-1]}, "
             f"{d['iters']} iters):"]
    fm = d.get("freematch")
    if fm:
        tr = fm["trace"]
        full = sum(1 for r in tr if r.get("util_ratio") == 1.0)
        lines += [
            "",
            f"**freematch** (final acc {fm['final_acc']:.3f}): util_ratio "
            f"is 1.0 at {full}/{len(tr)} logged steps — from the FIRST "
            f"step. The reference initializes the self-adaptive threshold "
            f"time_p at 1/C (freematch/utils.py:19-21, time_p = "
            f"p_model.mean() with p_model = ones(C)/C) and masks at "
            f"max_probs >= time_p * mod[class] with mod <= 1 "
            f"(utils.py:65); a C-way max-softmax is always >= 1/C, so at "
            f"init EVERY unlabeled sample trains at full weight while the "
            f"model is still at chance (trace: max_prob_mean "
            f"{tr[0].get('max_prob_mean', float('nan')):.2f} at step "
            f"{tr[0]['step']}). time_p rises only "
            f"{tr[0].get('time_p', float('nan')):.3f} -> "
            f"{tr[-1].get('time_p', float('nan')):.3f} over "
            f"{d['iters']} iters at the reference's 0.999 EMA — the "
            f"threshold never clears the confidence floor, so the run is "
            f"full-weight self-training from scratch; at this seed the "
            f"confirmation bias locks in before the 8 labels establish "
            f"signal (sup_loss {tr[0].get('sup_loss', float('nan')):.2f} "
            f"-> {tr[-1].get('sup_loss', float('nan')):.2f} while "
            f"unsup_loss stays {tr[-1].get('unsup_loss', float('nan')):.2f}"
            f"). A masking bug would show util_ratio detached from the "
            f"threshold; the trace shows the threshold doing exactly what "
            f"the reference formula says. The SAT update itself is "
            f"torch-parity-tested (tests/test_thresholding.py).",
        ]
    dfx = d.get("defixmatch")
    if dfx:
        tr = dfx["trace"]
        act = next((r["step"] for r in tr
                    if r.get("util_ratio_lb", 0) > 0), None)
        max_lb = max((r.get("util_ratio_lb", 0) for r in tr), default=0)
        max_u = max((r.get("util_ratio", 0) for r in tr), default=0)
        min_t = min((r.get("total_loss", 0) for r in tr), default=0)
        lines += [
            "",
            f"**defixmatch** (final acc {dfx['final_acc']:.3f}): the "
            f"reference total is sup + lambda*(unsup - anti_unsup) "
            f"(defixmatch.py:116) where the anti term is the model's own "
            f"pseudo-labels applied to LABELED strong views — gradient "
            f"ASCENT on that CE. In the trace the positive unlabeled "
            f"branch never activates (util_ratio <= {max_u:.2f}; no "
            f"unlabeled sample clears p_cutoff=0.95 on this hard seed) "
            f"while the anti branch does (util_ratio_lb first > 0 at step "
            f"{act}, peaking {max_lb:.2f}): once the model grows "
            f"confident on the labeled data it is fitting, the subtracted "
            f"term un-learns those same labels (total_loss goes negative, "
            f"min {min_t:.2f}; sup_loss never converges). With real "
            f"unlabeled headroom the positive branch dominates and the "
            f"subtraction is the intended bias correction — on the "
            f"round-3 orbit benchmark defixmatch GAINS at every seed "
            f"(+0.078/+0.098/+0.168). Faithful instability, not a bug.",
        ]
    opath = _os.path.join(root, "QUALITY_r03_collapse_audit_orbit.json")
    if _os.path.exists(opath):
        od = json.load(open(opath))
        fm2 = od.get("freematch")
        if fm2:
            tr = fm2["trace"]
            full = sum(1 for r in tr if r.get("util_ratio") == 1.0)
            obase = od.get("labeled_only_acc", 0.754)
            lines += [
                "",
                f"**freematch on the round-3 orbit task** (seed "
                f"{od.get('seed', 2)}, "
                f"{od['iters']} iters, final acc {fm2['final_acc']:.3f} "
                f"vs {obase:.3f} labeled-only): same cold-start signature — "
                f"util_ratio 1.0 at {full}/{len(tr)} logged steps, time_p "
                f"{tr[0].get('time_p', float('nan')):.3f} -> "
                f"{tr[-1].get('time_p', float('nan')):.3f} — but with 6 "
                f"classes and orbit headroom the run lands far above "
                f"chance; the -0.08 dip at this one seed is the same "
                f"full-weight-from-step-one dynamic, milder.",
            ]
    return lines


def _preserved_blocks():
    """Hand-maintained analysis blocks in docs/quality.md (between
    `<!-- BEGIN HAND-MAINTAINED -->` / `<!-- END HAND-MAINTAINED -->`
    markers, e.g. the per-sample-mode section whose numbers come from
    QUALITY_r03_sr_per_sample.json rather than this sweep) survive
    regeneration verbatim instead of being silently dropped."""
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "docs", "quality.md")
    if not _os.path.exists(path):
        return []
    out, keeping = [], False
    for line in open(path).read().splitlines():
        if line.strip() == "<!-- BEGIN HAND-MAINTAINED -->":
            keeping = True
        if keeping:
            out.append(line)
        if line.strip() == "<!-- END HAND-MAINTAINED -->":
            keeping = False
    return ([""] + out) if out else []


def _write_md(report, rnd):
    lines = [
        "# Golden-learning quality report",
        "",
        "Evidence that the algorithms *learn* (the distilled form of the",
        "reference's benchmark-reproduction contract). Task: the 6-class",
        "rotation-orbit benchmark (`make_synthetic_orbit` — labeled data",
        "covers only small rotation angles; unlabeled/eval cover the full",
        "range, so the labeled-only ceiling is structural and SSL gains",
        f"have headroom at every seed). {report['iters']} train iters, "
        f"seed {report['seed']};",
        "produced by `python scripts/golden_quality.py`.",
        "",
        f"Labeled-only baseline (same label budget): "
        f"**{report['labeled_only_acc']:.4f}**",
        "",
        "| algorithm | SSL acc | gain vs labeled-only |",
        "|---|---|---|",
    ]
    for alg, r in report["thresholding_families"].items():
        lines.append(f"| {alg} | {r['ssl_acc']:.4f} | "
                     f"{r['gain_vs_labeled_only']:+.4f} |")
    if report.get("other_families"):
        lines += ["", "## Consistency / mixing / net-wrapper families", "",
                  "| algorithm | SSL acc | gain vs labeled-only |",
                  "|---|---|---|"]
        for alg, r in report["other_families"].items():
            if "error" in r:
                lines.append(f"| {alg} | run failed | — |")
            else:
                lines.append(f"| {alg} | {r['ssl_acc']:.4f} | "
                             f"{r['gain_vs_labeled_only']:+.4f} |")
        lines += ["",
                  "Caveat: the table is evidence that every family trains "
                  "end-to-end AND extracts signal from unlabeled data on "
                  "this benchmark — not a ranking. Relative ordering at "
                  "1000 synthetic iters does not predict the reference's "
                  "2^20-iteration CIFAR ordering (e.g. crmatch's rotation "
                  "head, pure noise on the old rotation-invariant blob "
                  "task, is perfectly aligned with the orbit task's "
                  "rotation structure and now tops the table)."]
    if report["thresholding_families"].get("adamatch", {}).get(
            "gain_vs_labeled_only", 0) < 0:
        lines += ["", "adamatch trails the baseline at this horizon: its "
                  "relative threshold starts near zero (0.95 x mean lb "
                  "confidence at init), so early pseudo-labels train at full "
                  "weight — faithful reference behavior (parity-tested), "
                  "costly on short runs."]
    lines += _sr_section(report)
    lines += _preserved_blocks()
    if "imbalanced" in report:
        lines += ["", "## Imbalanced tier (γ=10 long-tailed split)", "",
                  "| method | base balanced-acc | +method | gain |",
                  "|---|---|---|---|"]
        for m, r in report["imbalanced"].items():
            lines.append(
                f"| {m} over {r['base']} | {r['base_balanced_acc']:.4f} | "
                f"{r['imb_balanced_acc']:.4f} | {r['gain']:+.4f} |")
    lines += _seed_section(report, rnd)
    lines += _collapse_section()
    os_path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "docs", "quality.md")
    with open(os_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os_path}")


if __name__ == "__main__":
    main()
