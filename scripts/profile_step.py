#!/usr/bin/env python
"""Profile the headline bench step: capture an XLA trace of N steps and
print a per-category time breakdown (the NOTES_DEV.md trace-parsing recipe,
automated). TPU-only; writes nothing outside /tmp.

Usage: python scripts/profile_step.py [--steps 10] [--mode headline|large]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json


def categorize(name: str) -> str:
    n = name.lower()
    if "convert" in n and "reduce" in n:
        return "convert+reduce(f32 grad accum)"
    if "conv" in n and "convert" not in n:
        return "conv"
    if ("dot" in n or "matmul" in n) and "sort" not in n:
        return "matmul"
    if n.startswith("copy") or ".copy" in n or "copy-start" in n \
            or "copy-done" in n:
        return "copy"
    if "reduce" in n:
        return "reduce"
    if "gather" in n or "scatter" in n or "dynamic-slice" in n \
            or "dynamic-update" in n:
        return "gather/scatter"
    if "fusion" in n:
        return "fusion(elementwise/mixed)"
    if "rng" in n or "bitcast" in n:
        return "rng/bitcast"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--mode", default="headline",
                   choices=["headline", "large", "nlp", "audio"])
    p.add_argument("--logdir", default="/tmp/srt_trace")
    # A/B arm flags forwarded to bench.build_trainer so a trace profiles
    # the SAME program the bench measured (memory rule: arms pin flags
    # explicitly both ways)
    p.add_argument("--flash-attn", action="store_true")
    p.add_argument("--use-cat", action="store_true", default=None)
    p.add_argument("--split-fwd", action="store_true")
    p.add_argument("--short-text", action="store_true")
    p.add_argument("--buckets", action="store_true")
    args = p.parse_args()
    if args.steps < 1:
        p.error("--steps must be >= 1")

    import jax

    # persistent compile cache (same dir bench.py uses): tracing the SAME
    # program the bench just measured must not pay the ~10-min remote
    # compile again
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import semireward_tpu  # noqa: F401
    from bench import build_trainer

    cfg, trainer = build_trainer(args.mode, flash=args.flash_attn,
                                 use_cat=args.use_cat,
                                 split_fwd=args.split_fwd,
                                 short_text=args.short_text,
                                 buckets=args.buckets)
    trainer.state = trainer.state.replace(step=jnp.asarray(100, jnp.int32))
    loader = trainer._make_loader()  # modality-aware (CV / NLP / audio)
    batches = [trainer._put_batch(next(loader)) for _ in range(8)]
    state = trainer.state
    for i in range(3):
        state, m = trainer._jit_step(state, batches[i % len(batches)])
    _ = float(m["total_loss"])  # value fetch — block_until_ready can
    # return before execution completes on this runtime (see bench.py)

    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        state, m = trainer._jit_step(state, batches[i % len(batches)])
    _ = float(m["total_loss"])
    jax.profiler.stop_trace()

    files = glob.glob(args.logdir + "/plugins/profile/*/*.trace.json.gz")
    assert files, f"no trace under {args.logdir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find the TPU device pid
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    tpu_pids = [pid for pid, name in pids.items()
                if "TPU" in name and "pjrt" not in name.lower()]
    # keep only the "XLA Ops" thread track: the same pid also carries
    # "XLA Modules" (whole-program umbrella events) and "Steps" (numbered
    # region markers) tracks, which double-count every op into "other"
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in tpu_pids
               and "XLA Ops" in e.get("args", {}).get("name", "")}
    assert op_tids, (
        "no 'XLA Ops' device thread track in the trace — CPU backend, or "
        "an XLA profiler version renamed the track; an all-zero breakdown "
        "would be meaningless")
    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_count = collections.Counter()
    long_names = {}
    n_ev = 0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        by_cat[categorize(name)] += dur
        by_op[name] += dur
        op_count[name] += 1
        ln = e.get("args", {}).get("long_name", "")
        if ln and name not in long_names:
            long_names[name] = ln
        n_ev += 1
    total = sum(by_cat.values())
    print(f"\n=== {n_ev} device ops over {args.steps} steps — "
          f"{total / args.steps / 1e3:.2f} ms/step ===")
    for cat, dur in by_cat.most_common():
        print(f"{dur / args.steps / 1e3:8.3f} ms/step  {cat}")
    print("\ntop 20 ops:")
    for name, dur in by_op.most_common(20):
        ln = long_names.get(name, "")
        cnt = op_count[name] / args.steps
        print(f"{dur / args.steps / 1e3:8.3f} ms/step x{cnt:5.1f}/step  "
              f"{name[:60]}  {ln[:140]}")
    # per-category top ops: the aggregate rows above say WHERE time goes,
    # these say WHAT it is (esp. the 'other'/'fusion' catch-alls)
    for cat, _ in by_cat.most_common():
        print(f"\ntop 5 in [{cat}]:")
        rows = sorted(((d, n) for n, d in by_op.items()
                       if categorize(n) == cat), reverse=True)[:5]
        for d, n in rows:
            ln = long_names.get(n, "")
            print(f"{d / args.steps / 1e3:8.3f} ms/step "
                  f"x{op_count[n] / args.steps:5.1f}/step  {n[:50]}  "
                  f"{ln[:120]}")


if __name__ == "__main__":
    main()
