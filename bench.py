#!/usr/bin/env python
"""Throughput benchmark — prints ONE JSON line.

Metric: SSL steps/sec/chip for the headline USB config (CIFAR-100-shaped
data, ViT-S/2-32, FlexMatch + SemiReward) in the expensive stage-2 regime
(reward scoring + filtering active), with on-device RandAugment, exactly the
per-step work the reference does at config
config/SemiReward/usb_cv/flexmatch/flexmatch_cifar100_200_0.yaml (bs=8,
uratio=1, AdamW lr 5e-4) — except the reference also re-forwards the
backbone sr_decay() times per step for a loss it throws away
(srflexmatch.py:72-104), which we don't (documented loss-equivalent
deviation).

``vs_baseline``: the reference publishes no throughput numbers and no CUDA
GPU exists here, so the ratio is a SAME-HARDWARE algorithmic estimate
(BASELINE.md "Throughput baseline arithmetic"): the reference's per-step
device work = our measured step + sr_decay() extra backbone forwards, both
measured on this chip. It deliberately EXCLUDES the reference's per-step
host syncs (4+ .item()s) and python-loop overhead, so it is a lower bound
on the true speedup.

Extras report MFU (analytic transformer FLOPs over the chip's peak) and a
DIRECTLY measured reward_scorings_per_sec (standalone jitted
score_pseudo_labels), replacing round 1's arithmetic-on-step-rate.

``--mode large`` benches the reference's classic_cv geometry
(bs=64, uratio=7, WRN-28-2 FixMatch) instead of the headline config.
"""
from __future__ import annotations

import argparse
import json
import os
import time

_PROC_T0 = time.perf_counter()  # anchor the time budget at process start

import jax
import jax.numpy as jnp
import numpy as np


# bf16 peak FLOP/s per chip (public specs); MFU is null on unknown chips.
# v5e is 197 TFLOP/s bf16 (394 is its INT8 TOPS figure — rounds 1-3
# mistakenly used it, understating every reported MFU by 2x).
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12, "v5 lite": 197e12, "v5litepod": 197e12,
    "v5p": 459e12,
    "v6e": 918e12, "trillium": 918e12,
}


def chip_peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_FLOPS.items():
        if key in kind:
            return val
    return None


def vit_step_flops(params: int, tokens: int, images: int, hidden: int,
                   layers: int, images_bwd: int | None = None) -> float:
    """Analytic FLOPs per optimizer step for a ViT/transformer:
    dense ~= 2*P*N fwd + 4*P*N bwd per image, attention ~= 6*N^2*H fwd +
    12*N^2*H bwd per layer per image (scores + AV). ``images_bwd`` <
    ``images`` models the use_cat=False geometry, where the weak ulb view
    is a stop-gradient forward (the reference's NLP/audio suites): those
    images pay fwd only."""
    if images_bwd is None:
        images_bwd = images
    dense = 2.0 * params * tokens * images + 4.0 * params * tokens * images_bwd
    attn_unit = tokens * tokens * hidden * layers
    attn = 6.0 * attn_unit * images + 12.0 * attn_unit * images_bwd
    return dense + attn


def wrn_step_flops(fwd_flops_per_image: float, images: int,
                   images_bwd: int | None = None) -> float:
    if images_bwd is None:
        images_bwd = images
    return fwd_flops_per_image * (images + 2.0 * images_bwd)  # bwd ~= 2x fwd


def build_trainer(mode: str, flat: bool = False, sr_reforward: int = 1,
                  sr_ema: bool = False, fused=None, flash: bool = False,
                  use_cat: bool | None = None, split_fwd: bool = False,
                  short_text: bool = False, buckets: bool = False,
                  bf16_grads: bool = False):
    from semireward_tpu.config import get_config
    from semireward_tpu.core.trainer import Trainer

    if mode == "nlp":
        # usb_nlp SemiReward geometry (reference config/SemiReward/usb_nlp/
        # flexmatch/flexmatch_ag_news_40_0.yaml: srflexmatch, BERT-base,
        # bs=8, uratio=1, max_length 512, AdamW lr 5e-5 layer_decay 0.65,
        # feature_dim 768, N_k 10), forced into stage 2 (start_timing=0) so
        # the reward-scoring path is in the measured step like the headline.
        # Data is a deterministic synthetic JSON corpus (zero-egress host);
        # the tokenizer falls back to the hash tokenizer — identical shapes
        # and device work to the real corpus.
        import os as _os

        root = "/tmp/bench_nlp_data"
        # --short-text: an ag_news-like length distribution (4 classes,
        # lognormal word counts, median ~40 / mean ~48 / p99 ~140 tokens,
        # clipped at 250 — the reference trains ag_news at max_length 512,
        # config/usb_nlp/*/..._ag_news_*.yaml) instead of the fixed
        # 40-100-word corpus. This is the arm where the reference's
        # dynamic per-batch padding (nlp_collactor.py:49-126) pays ~10x
        # fewer FLOPs than a fixed L512 pad — and where our static length
        # buckets (data/nlp.py, DEVIATIONS #33) must match that economics.
        ds_name = "synthnlp_short" if short_text else "synthnlp"
        base = _os.path.join(root, ds_name)
        if not _os.path.exists(_os.path.join(base, "_complete")):
            # marker written LAST: an interrupted generation regenerates
            # instead of leaving a truncated corpus every later run trusts
            import json as _json

            _os.makedirs(base, exist_ok=True)
            rs = np.random.RandomState(0)
            words = [f"w{i}" for i in range(400)]
            for split, count in (("train", 300), ("dev", 32), ("test", 32)):
                d = {}
                for i in range(count):
                    y = int(rs.randint(4))
                    if short_text:
                        n = min(int(8 + rs.lognormal(np.log(32.0), 0.55)),
                                250)
                    else:
                        n = 40 + 20 * y
                    text = " ".join(rs.choice(words, n))
                    d[str(i)] = {"ori": text, "aug_0": text + " a",
                                 "aug_1": text + " b", "label": y}
                with open(_os.path.join(base, f"{split}.json"), "w") as f:
                    _json.dump(d, f)
            open(_os.path.join(base, "_complete"), "w").close()
        cfg = get_config(dict(
            algorithm="srflexmatch", net="bert_base_uncased",
            dataset=ds_name, num_classes=4, num_labels=40, batch_size=8,
            uratio=1, eval_batch_size=16, max_length=512, optim="AdamW",
            lr=5e-5, layer_decay=0.65, weight_decay=5e-4, ema_m=0.0, T=0.5,
            p_cutoff=0.95, num_train_iter=102400, num_eval_iter=1 << 30,
            num_log_iter=1 << 30, start_timing=0, N_k=10, feature_dim=768,
            sr_ema=sr_ema, data_dir=root, seed=0,
            # reference yaml sets use_cat: False for the NLP suite —
            # that's the parity geometry; --use-cat measures the fused
            # single-forward variant (loss-equivalent for stat-free nets)
            use_cat=False if use_cat is None else use_cat,
            save_name="bench_nlp", mesh_shape=(-1,)))
        # Pin the length-bucket policy EXPLICITLY both ways (the trainer
        # default is now "auto", DEVIATIONS #33): the no-bucket arm keeps
        # round-4's fixed-L512 comparability, the bucket arm pads each
        # batch to the smallest static bucket that fits.
        cfg.extra["length_buckets"] = "auto" if buckets else False
    elif mode == "audio":
        # usb_audio SemiReward geometry (reference config/SemiReward/
        # usb_audio/flexmatch/flexmatch_urbansound8k_100_0.yaml: srflexmatch,
        # HuBERT-base, bs=8, uratio=1, 4.0 s @ 16 kHz, AdamW lr 5e-5
        # layer_decay 0.75, feature_dim 768, N_k 10), forced into stage 2.
        # Synthetic pkl corpus; identical shapes/device work to the real one.
        import os as _os
        import pickle as _pickle

        root = "/tmp/bench_audio_data"
        base = _os.path.join(root, "synthaudio")
        if not _os.path.exists(_os.path.join(base, "_complete")):
            _os.makedirs(base, exist_ok=True)
            rs = np.random.RandomState(0)
            for split, count in (("train", 300), ("dev", 32), ("test", 32)):
                rows = [(rs.randn(16000 + int(rs.randint(48000))
                                  ).astype(np.float32) * 0.1,
                         int(rs.randint(10))) for _ in range(count)]
                with open(_os.path.join(base, f"{split}.pkl"), "wb") as f:
                    _pickle.dump(rows, f)
            open(_os.path.join(base, "_complete"), "w").close()
        cfg = get_config(dict(
            algorithm="srflexmatch", net="hubert_base", dataset="synthaudio",
            num_classes=10, num_labels=100, batch_size=8, uratio=1,
            eval_batch_size=16, optim="AdamW", lr=5e-5, layer_decay=0.75,
            weight_decay=2e-5, ema_m=0.0, T=0.5, p_cutoff=0.95,
            num_train_iter=102400, num_eval_iter=1 << 30,
            num_log_iter=1 << 30, start_timing=0, N_k=10, feature_dim=768,
            sr_ema=sr_ema, data_dir=root, seed=0,
            use_cat=False if use_cat is None else use_cat,
            save_name="bench_audio", mesh_shape=(-1,)))
    elif mode == "large":
        # classic_cv geometry (reference fixmatch_cifar10_40.yaml family):
        # bs=64, uratio=7, WRN-28-2, SGD — the large-batch MXU-friendly case
        cfg = get_config(dict(
            algorithm="fixmatch", net="wrn_28_2", dataset="synthetic",
            num_classes=10, num_labels=40, batch_size=64, uratio=7,
            eval_batch_size=64, img_size=32, crop_ratio=0.875,
            optim="SGD", lr=0.03, weight_decay=5e-4, ema_m=0.0,
            T=0.5, p_cutoff=0.95, num_train_iter=1 << 20,
            num_eval_iter=1 << 30, num_log_iter=1 << 30,
            seed=0, save_name="bench_large", mesh_shape=(-1,)))
    else:
        # headline USB config (reference flexmatch_cifar100_200_0.yaml)
        cfg = get_config(dict(
            algorithm="srflexmatch", net="vit_small_patch2_32",
            dataset="synthetic", num_classes=100, num_labels=200,
            batch_size=8, uratio=1, eval_batch_size=16, img_size=32,
            crop_ratio=0.875, optim="AdamW", lr=5e-4, layer_decay=0.5,
            weight_decay=5e-4, ema_m=0.0, T=0.5, p_cutoff=0.95,
            num_train_iter=204800, num_eval_iter=1 << 30,
            num_log_iter=1 << 30,
            start_timing=0,  # force stage 2 (reward filtering) immediately
            N_k=10, feature_dim=384, sr_ema=sr_ema,
            seed=0, save_name="bench", mesh_shape=(-1,)))
    cfg.extra["synthetic_train"] = 2048
    if split_fwd:
        # loss-equivalent split forward (algorithms/base.py): the weak ulb
        # view runs forward-only on stat-free nets — A/B arm for the
        # headline ViT geometry, which the reference runs use_cat=True
        cfg.extra["auto_split_forward"] = True
    if flat:
        cfg.extra["flat_optimizer"] = True
    if fused is not None:
        # force the single-launch pallas MLP on/off (ops/fused_mlp.py) —
        # A/B for the fc2-bound fusion pair identified in the round-2
        # trace work. Default (None) = the Trainer's auto rule: fused on
        # a single TPU chip for ViT nets (measured +17%, NOTES_DEV r3).
        cfg.extra["use_fused_mlp"] = fused
    # Pallas flash attention in the training step (ops/attention.py): for
    # BERT/HuBERT the kernel handles the key padding bias and the p=0.1
    # prob dropout in-kernel. Pinned EXPLICITLY both ways: the trainer's
    # measurement-set default (core/trainer.py: auto-on for BERT at
    # N>=384 on TPU) would otherwise flip the no-flash A/B arm silently.
    cfg.extra["use_flash_attention"] = bool(flash)
    if bf16_grads:
        # A/B arm (VERDICT r5 ask #3): bf16 cotangents end-to-end, f32
        # restored only at the optimizer boundary (core/step.py)
        cfg.extra["bf16_grads"] = True
    if sr_reforward > 1:
        # ref-equivalent mode: restore the reference's redundant device
        # work (sr_decay() full backbone re-forwards per stage-2 step,
        # srflexmatch.py:72-104) inside our own step — see
        # algorithms/semireward.py with_reward
        cfg.extra["sr_reforward"] = sr_reforward
    return cfg, Trainer(cfg)


def measure_steps(trainer, cfg, n_steps=200, host_fetch=False,
                  seq_lens=None, host_counter_n=0):
    """``host_fetch=True`` additionally blocks on 4 metric scalars every
    step — the reference's per-step ``log_dict`` ``.item()`` syncs
    (srflexmatch.py:213-216) — for the ref-equivalent measurement.
    ``seq_lens`` (a list) receives the padded token length of each of the
    cycled batches — under length buckets (DEVIATIONS #33) batches differ
    in length, and the FLOPs accounting must use the lengths actually
    executed, not cfg.max_length.
    ``host_counter_n`` > 0 additionally emulates FlexMatch's per-step
    host curriculum pass (flexmatch/utils.py:277-315: pull the
    ulb-dataset-sized selected_label tensor to host and run
    collections.Counter over its list) — a device->host transfer of n
    int32s + a Python Counter loop per step."""
    import collections

    n_steps = int(os.environ.get("BENCH_N_STEPS", n_steps))

    trainer.state = trainer.state.replace(step=jnp.asarray(100, jnp.int32))
    loader = trainer._make_loader()  # modality-aware (CV / NLP / audio)
    batches = [trainer._put_batch(next(loader)) for _ in range(8)]
    if seq_lens is not None:
        for b in batches:
            v = b.get("x_ulb_w", b.get("x_lb"))
            if isinstance(v, dict) and "input_ids" in v:
                seq_lens.append(int(v["input_ids"].shape[-1]))
    state = trainer.state
    for i in range(3):
        state, m = trainer._jit_step(state, batches[i % len(batches)])
    _ = float(m["total_loss"])  # NOT block_until_ready: on this remote
    # runtime block_until_ready can return before execution completes
    # (measured: 200 BERT steps "blocked" in 0.0 s while the chip ran for
    # another ~25 s) — only a value fetch truly synchronizes
    counter_src = None
    if host_counter_n:
        # ulb-dataset-sized int32 device tensor, re-derived per step from
        # a live metric so each iteration really pays the device->host
        # transfer (a constant would be fetched once and cached)
        counter_src = jax.jit(lambda v: jnp.broadcast_to(
            v.astype(jnp.int32), (host_counter_n,)))
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, m = trainer._jit_step(state, batches[i % len(batches)])
        if host_fetch:
            _ = (float(m["sup_loss"]), float(m["unsup_loss"]),
                 float(m["total_loss"]), float(m["util_ratio"]))
        if counter_src is not None:
            sel = np.asarray(counter_src(m["total_loss"]))
            _ = collections.Counter(sel.tolist())
    _ = float(m["total_loss"])
    # the original trainer.state buffers were donated — keep the live ones
    trainer.state = state
    return n_steps / (time.perf_counter() - t0)


def measure_vit_fwd(trainer, images: int, n: int = 50, chunks: int = 5):
    """Standalone backbone forward cost (feeds the vs_baseline estimate:
    the reference re-forwards the backbone sr_decay() times per step).
    Min over several timing chunks — single-chunk numbers on this runtime
    vary ~2x run to run (host/tunnel jitter), the min is stable."""
    x = jnp.zeros((images, 32, 32, 3), jnp.float32)

    def fwd(params, x):
        return trainer.model.apply({"params": params}, x,
                                   train=False)["logits"]

    jfwd = jax.jit(fwd)
    out = jfwd(trainer.state.params, x)
    _ = float(out[0, 0])  # value fetch, not block_until_ready (see above)
    best = float("inf")
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(n):
            out = jfwd(trainer.state.params, x)
        _ = float(out[0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def measure_reward_scoring(cfg, trainer, n: int = 200):
    """DIRECT measurement of score_pseudo_labels (round 1 reported
    arithmetic on the step rate — VERDICT r1 weak #6)."""
    from semireward_tpu.algorithms.semireward import score_pseudo_labels

    B = cfg.ulb_batch_size
    feats = jnp.zeros((B, cfg.feature_dim), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)
    jscore = jax.jit(lambda sr, f, l: score_pseudo_labels(cfg, sr, f, l))
    r, k = jscore(trainer.state.sr, feats, labels)
    _ = float(r.ravel()[0])  # value fetch, not block_until_ready (see above)
    best = float("inf")
    for _ in range(5):  # min over chunks: single-chunk numbers jitter ~2x
        t0 = time.perf_counter()
        for _ in range(n):
            r, k = jscore(trainer.state.sr, feats, labels)
        _ = float(r.ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return B / best


def _progress(t0: float, msg: str) -> None:
    """Stage marker on stderr (stdout carries only the one JSON line)."""
    import sys
    print(f"[bench +{time.perf_counter() - t0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["headline", "large", "nlp", "audio"],
                   default="headline")
    p.add_argument("--flat", action="store_true",
                   help="run the raveled-vector optimizer path")
    p.add_argument("--skip-ref-equivalent", action="store_true",
                   help="skip the measured ref-equivalent baseline run "
                        "(headline mode measures it by default)")
    p.add_argument("--sr-ema", action="store_true",
                   help="bench the EMARewarder scoring-path variant "
                        "(sr_ema=True, as some reference YAMLs configure)")
    p.add_argument("--fused", action="store_true", default=None,
                   help="force the pallas fused MLP (ops/fused_mlp.py) ON "
                        "(default: Trainer auto rule — on for single-chip "
                        "TPU ViT)")
    p.add_argument("--no-fused", dest="fused", action="store_false",
                   help="force the pallas fused MLP OFF (A/B baseline)")
    p.add_argument("--split-fwd", action="store_true",
                   help="enable auto_split_forward (weak view fwd-only on "
                        "stat-free nets; loss-equivalent A/B arm)")
    p.add_argument("--use-cat", action="store_true", default=None,
                   help="nlp/audio modes: force use_cat=True (one fused "
                        "concat forward) instead of the reference yaml's "
                        "use_cat: False three-forward geometry")
    p.add_argument("--flash-attn", action="store_true",
                   help="run the training step with Pallas flash attention "
                        "(in-kernel padding bias + prob dropout; the "
                        "long-seq BERT/HuBERT A/B arm)")
    p.add_argument("--short-text", action="store_true",
                   help="nlp mode: ag_news-like length distribution "
                        "(mean ~48 tokens, p99 ~140) instead of the fixed "
                        "40-100-word corpus — the realistic arm for the "
                        "length-bucket economics (DEVIATIONS #33)")
    p.add_argument("--buckets", action="store_true",
                   help="nlp mode: enable static length buckets "
                        "(64/128/256/512); default pins the single "
                        "max_length bucket for round-4 comparability")
    p.add_argument("--bf16-grads", action="store_true",
                   help="A/B arm: bf16 cotangents end-to-end (core/"
                        "step.py bf16_grads), f32 only at the optimizer")
    args = p.parse_args()

    import os
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import semireward_tpu  # noqa: F401

    # Wall-clock budget: the driver runs bench.py under a hard timeout, and
    # through a slow tunnel the optional arms (measured ref-equivalent,
    # sr_ema) can push past it — which would lose the WHOLE JSON line.
    # When the budget would be blown, skip those arms and fall back to the
    # arithmetic vs_baseline so one valid line is always printed.
    t_start = _PROC_T0
    budget_s = float(os.environ.get("BENCH_TIME_BUDGET_S", "420"))

    _progress(t_start, "building trainer")
    cfg, trainer = build_trainer(args.mode, flat=args.flat,
                                 fused=args.fused, flash=args.flash_attn,
                                 use_cat=args.use_cat,
                                 split_fwd=args.split_fwd,
                                 short_text=args.short_text,
                                 buckets=args.buckets,
                                 bf16_grads=args.bf16_grads)
    _progress(t_start, "measuring step rate (compile on first step)")
    seq_lens: list = []
    steps_per_sec = measure_steps(trainer, cfg, seq_lens=seq_lens)
    _progress(t_start, f"step rate done: {steps_per_sec:.1f}/s")
    n_chips = jax.device_count()
    sps_chip = steps_per_sec / n_chips

    images = cfg.batch_size + 2 * cfg.ulb_batch_size
    # rows whose backward never executes: the stop-graded weak ulb view —
    # via the reference's own use_cat=False geometry (NLP/audio yamls) OR
    # the split-forward path (auto_split_forward engages only on stat-free
    # nets, algorithms/base.py:117; BN nets like WRN keep the full concat)
    has_bn = bool(jax.tree_util.tree_leaves(
        getattr(trainer.state, "batch_stats", None) or ()))
    split_on = bool(cfg.extra.get("auto_split_forward", False)) and not has_bn
    weak_fwd_only = (not cfg.use_cat) or split_on
    images_bwd = images - (cfg.ulb_batch_size if weak_fwd_only else 0)
    n_params = sum(x.size for x in
                   jax.tree_util.tree_leaves(trainer.state.params))
    if args.mode == "large":
        # WRN-28-2 fwd = 0.43 GFLOP/image at 32x32 (exact conv arithmetic:
        # 3 stages x ~141.6 MFLOP + stem/shortcuts)
        def _flops(ib):
            return wrn_step_flops(0.43e9, images, images_bwd=ib)
    elif args.mode == "nlp":
        # embedding-table lookups are not matmul FLOPs — exclude them
        mm_params = sum(
            x.size for p, x in jax.tree_util.tree_flatten_with_path(
                trainer.state.params)[0]
            if "embedding" not in jax.tree_util.keystr(p))

        # under length buckets the cycled batches differ in padded length:
        # average the analytic FLOPs over the lengths actually executed
        # (round-robin over the batch cycle = equal weights)
        lens = seq_lens or [cfg.max_length]

        def _flops(ib):
            return float(np.mean([
                vit_step_flops(mm_params, tokens=L, images=images,
                               hidden=768, layers=12, images_bwd=ib)
                for L in lens]))
    elif args.mode == "audio":
        # encoder fwd+bwd at N=199 frames (4.0 s / 16 kHz through the
        # stride-320 conv stack) + the FROZEN conv feature extractor
        # (fwd-only: stop_gradient, hubert.py): ~19.7 GFLOP/clip analytic
        mm_params = sum(
            x.size for p, x in jax.tree_util.tree_flatten_with_path(
                trainer.state.params)[0]
            if "feature_extractor" not in jax.tree_util.keystr(p))

        def _flops(ib):
            return vit_step_flops(mm_params, tokens=199, images=images,
                                  hidden=768, layers=12,
                                  images_bwd=ib) + 19.7e9 * images
    else:
        def _flops(ib):
            return vit_step_flops(n_params, tokens=257, images=images,
                                  hidden=384, layers=12, images_bwd=ib)
    # EXECUTED FLOPs are the mfu/model_flops_per_step basis in every mode;
    # the full-concat equivalent (the reference's semantics: every view
    # through the backward) is kept as a separate extra for round-to-round
    # comparability.
    flops_step = _flops(images_bwd)
    flops_full = _flops(images)
    peak = chip_peak_flops()
    mfu = (sps_chip * flops_step / peak) if peak else None

    extras = {
        "n_chips": n_chips,
        "batch_size": cfg.batch_size,
        "uratio": cfg.uratio,
        "images_per_step": images,
        "model_params": int(n_params),
        "model_flops_per_step": flops_step,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "model_flops_per_step_full_concat": flops_full,
        "mfu_vs_full_concat_flops": (
            round(sps_chip * flops_full / peak, 4) if peak else None),
        "device": str(jax.devices()[0]),
        "fused_mlp": bool(getattr(trainer.model, "use_fused_mlp", False)),
        "use_cat": bool(cfg.use_cat),
        "split_fwd": bool(cfg.extra.get("auto_split_forward", False)),
    }
    if args.mode == "nlp":
        extras["length_buckets"] = bool(args.buckets)
        extras["short_text"] = bool(args.short_text)
        extras["measured_batch_seq_lens"] = seq_lens
        if args.buckets and args.short_text:
            extras["bucket_note"] = (
                "both arms (measured + ref-equivalent) collate with the "
                "same static buckets; the reference's true dynamic padding "
                "(nlp_collactor.py:49-126) would pad both to the batch max "
                "instead — the quantization is symmetric, so the ratio is "
                "padding-policy-neutral while the absolute steps/s shows "
                "the bucket win over fixed-L512")

    vs_baseline = None
    if args.mode == "headline":
        _progress(t_start, "measuring reward scoring + backbone fwd")
        extras["reward_scorings_per_sec"] = round(
            measure_reward_scoring(cfg, trainer), 1)
        # same-hardware reference-cost estimate (BASELINE.md arithmetic):
        # ref step = our step + sr_decay()~8 extra backbone fwd's at the
        # ulb batch (srflexmatch.py:72-104), host syncs excluded
        fwd_s = measure_vit_fwd(trainer, cfg.ulb_batch_size)
        our_step_s = 1.0 / sps_chip
        ref_step_s = our_step_s + 8 * fwd_s
        vs_arith = round(ref_step_s / our_step_s, 3)
        extras["ref_step_estimate_ms"] = round(ref_step_s * 1e3, 2)
        extras["vit_fwd_ms"] = round(fwd_s * 1e3, 3)
        extras["vs_baseline_arithmetic"] = vs_arith
        vs_baseline = vs_arith

    if args.mode == "large" and not args.skip_ref_equivalent:
        # Measured ref-equivalent arm for the non-SR classic_cv suite
        # (VERDICT r5 ask #8). FixMatch's DEVICE work is already identical
        # to the reference's (same concat forward/backward; WRN has BN so
        # the split-forward path is inert) — what the reference adds is
        # PER-STEP HOST work: 4 log_dict .item() syncs (fixmatch.py's
        # tb_dict) plus, for the flexmatch family, the host curriculum
        # pass over the ulb-dataset-sized selected_label tensor
        # (flexmatch/utils.py:277-315). Both are emulated on OUR step:
        # host_fetch blocks on 4 metric scalars, host_counter_n transfers
        # an ulb-sized int32 vector and runs collections.Counter over it.
        # WAN-RTT caveat: through this remote tunnel each scalar fetch
        # pays WAN latency the reference's local .item() would not, so
        # the ratio is an upper bound on sync cost; the sync-free rate is
        # the same program (vs_baseline would be 1.0 by construction).
        n_ulb = int(cfg.extra.get("synthetic_train", 2048))
        ref_sync = measure_steps(trainer, cfg, n_steps=50,
                                 host_fetch=True) / n_chips
        ref_sync_counter = measure_steps(trainer, cfg, n_steps=50,
                                         host_fetch=True,
                                         host_counter_n=n_ulb) / n_chips
        extras["ref_equivalent_with_host_syncs_steps_per_sec"] = round(
            ref_sync, 3)
        extras["ref_equivalent_with_syncs_and_flexmatch_counter"] = round(
            ref_sync_counter, 3)
        extras["flexmatch_counter_n"] = n_ulb
        vs_baseline = round(sps_chip / ref_sync, 3)
        extras["vs_baseline_measured"] = vs_baseline
        extras["vs_baseline_note"] = (
            "MEASURED on-chip: this framework's async-logging step vs the "
            "same step paying the reference's per-step host work — 4 "
            ".item() syncs (fixmatch tb_dict); the flexmatch-family "
            "variant additionally pulls an ulb-dataset-sized (" +
            str(n_ulb) + " here; 50k on real CIFAR) selected_label vector "
            "and runs the host Counter pass (flexmatch/utils.py:277-315), "
            "reported separately. CAVEAT: each sync pays WAN RTT through "
            "this remote tunnel that the reference's local .item() would "
            "not — treat the ratio as the async-vs-sync design effect "
            "measured on THIS link, not a universal constant. The device "
            "work of the two arms is identical by design.")

    if args.mode in ("headline", "nlp", "audio"):
        # Reserve headroom for the arm itself: the measured ref-equivalent
        # run (fresh trainer compile + 150 timed steps) costs minutes, so a
        # run starting just under the budget would still blow the driver's
        # hard timeout and lose the JSON line. Estimate the arm from this
        # process's own measured work: a trainer build + 200-step measure
        # already happened, and the ref arm re-does both (compile cache
        # warm, 150 steps at ~9x the per-step device work).
        arm_estimate_s = float(os.environ.get(
            "BENCH_REF_ARM_ESTIMATE_S",
            str(min(180.0, (time.perf_counter() - t_start) * 1.5))))
        over_budget = (time.perf_counter() - t_start
                       > budget_s - arm_estimate_s)
        if over_budget and not args.skip_ref_equivalent:
            _progress(t_start,
                      f"time budget {budget_s:.0f}s exceeded — skipping the "
                      "measured ref-equivalent arm (arithmetic vs_baseline)")
        if not args.skip_ref_equivalent and not over_budget:
            # MEASURED baseline (VERDICT r2 item 4): run OUR OWN step with
            # the reference's redundant DEVICE work restored — sr_decay()=8
            # full backbone re-forwards per stage-2 step (the deviation is
            # loss-equivalent, so this is a config flag;
            # srflexmatch.py:72-104). The ratio of executed steps is the
            # measured speedup. Host syncs are measured SEPARATELY below
            # and excluded from the headline ratio: a float() here pays
            # tunnel RTT that the reference's local .item() does not, so
            # folding them in would overstate the ratio.
            del trainer  # free the chip before the second program
            trainer = None
            _progress(t_start, "measured ref-equivalent arm: building "
                               "sr_reforward=8 trainer")
            # forward the A/B flags: the baseline must differ from the
            # measured step ONLY by the restored reference work, or the
            # ratio conflates e.g. the fused-MLP effect with it
            cfg_r, trainer_r = build_trainer(args.mode, sr_reforward=8,
                                             flat=args.flat,
                                             fused=args.fused,
                                             flash=args.flash_attn,
                                             use_cat=args.use_cat,
                                             split_fwd=args.split_fwd,
                                             short_text=args.short_text,
                                             buckets=args.buckets)
            ref_sps = measure_steps(trainer_r, cfg_r, n_steps=100) / n_chips
            ref_sps_sync = measure_steps(trainer_r, cfg_r, n_steps=50,
                                         host_fetch=True) / n_chips
            del trainer_r
            vs_measured = round(sps_chip / ref_sps, 3)
            extras["ref_equivalent_steps_per_sec"] = round(ref_sps, 3)
            extras["ref_equivalent_with_host_syncs_steps_per_sec"] = round(
                ref_sps_sync, 3)
            extras["vs_baseline_measured"] = vs_measured
            vs_baseline = vs_measured
            extras["vs_baseline_note"] = (
                "MEASURED on-chip: this framework's step vs the same step "
                "with the reference's redundant DEVICE work executed (8 "
                "backbone re-forwards/step, srflexmatch.py:72-104). The "
                "reference's 4 per-step .item() host syncs are measured "
                "separately (ref_equivalent_with_host_syncs_steps_per_sec) "
                "but excluded from the ratio — through this remote tunnel "
                "a scalar fetch pays WAN RTT a local .item() would not. "
                "vs_baseline_arithmetic is the round-2 estimate kept for "
                "comparability")
        else:
            skip_why = (" [measured arm skipped: wall-clock budget "
                        f"{budget_s:.0f}s hit on a slow tunnel; see "
                        "BENCH_TIME_BUDGET_S]"
                        if over_budget and not args.skip_ref_equivalent
                        else " [measured arm skipped: "
                             "--skip-ref-equivalent]")
            if args.mode == "headline":
                extras["vs_baseline_note"] = (
                    "same-chip algorithmic estimate: ref = our step + 8 "
                    "re-forwards (BASELINE.md); excludes ref's per-step "
                    "host syncs -> lower bound on the true ratio" + skip_why)
            else:
                # nlp/audio have no arithmetic fallback (measure_vit_fwd is
                # headline-only), so vs_baseline stays null — say so rather
                # than describing an estimate that was never computed
                extras["vs_baseline_note"] = (
                    "vs_baseline null: no measured ref-equivalent arm ran "
                    "and no arithmetic fallback exists for this mode"
                    + skip_why)

        if args.sr_ema:
            if time.perf_counter() - t_start > budget_s:
                _progress(t_start,
                          f"time budget {budget_s:.0f}s exceeded — skipping "
                          "the --sr-ema arm")
                extras["sr_ema_note"] = "skipped: time budget"
            else:
                if trainer is not None:
                    del trainer  # free the chip (skip-ref-equivalent path)
                    trainer = None
                cfg_e, trainer_e = build_trainer(args.mode, sr_ema=True,
                                                 flat=args.flat,
                                                 fused=args.fused,
                                                 flash=args.flash_attn,
                                                 use_cat=args.use_cat)
                extras["sr_ema_steps_per_sec"] = round(
                    measure_steps(trainer_e, cfg_e) / n_chips, 3)
                del trainer_e

    metric = {
        "headline": "SSL steps/sec/chip (CIFAR-100 ViT-S FlexMatch+SR, stage-2)",
        "large": "SSL steps/sec/chip (classic_cv WRN-28-2 FixMatch, bs64 u7)",
        "nlp": ("SSL steps/sec/chip (usb_nlp BERT-base FlexMatch+SR "
                "stage-2, bs8 u1 "
                + ("ag_news-like buckets" if args.short_text else "L512")
                + ")"),
        "audio": "SSL steps/sec/chip (usb_audio HuBERT-base FlexMatch+SR stage-2, bs8 u1 4s)",
    }[args.mode]
    print(json.dumps({
        "metric": metric,
        "value": round(sps_chip, 3),
        "unit": "steps/s/chip",
        "vs_baseline": vs_baseline,
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
