#!/usr/bin/env python
"""JPEG-folder loader throughput vs chip demand (VERDICT r3 next #2).

Fabricates a JPEG corpus in the semi_aves list layout, then measures:
  - decode throughput of ``JPEGFolderDataset.gather`` (threaded pool vs
    forced-sequential), images/s at the usb_cv-224 and imagenet-224
    geometries;
  - the chip-demand line: images/s the training step consumes at a given
    measured step rate (``--steps-per-sec``, e.g. from BENCH extras), or a
    live-measured one with ``--live`` on a TPU;
  - end-to-end ``SSLLoader`` batches/s with the background
    ``PrefetchLoader`` (depth 2, the trainer default) vs without.

Prints one JSON line; paste the numbers into docs/benchmark.md.

Reference anchor: the reference feeds these sets through torch DataLoader
worker processes (semilearn/datasets/cv_datasets/imagenet.py:46-169); the
TPU-host analogue is the shared decode thread pool + prefetch thread
(semireward_tpu/data/cv_extra.py, data/loader.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def fabricate_corpus(root: str, n: int, side: int, quality: int = 85):
    """n JPEGs around `side` px (variable sizes like real photos)."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"img_{i:05d}.jpg")
        if not os.path.exists(p):
            h = side + int(rs.randint(-side // 4, side // 4))
            w = side + int(rs.randint(-side // 4, side // 4))
            # low-frequency content compresses like a natural photo
            small = rs.randint(0, 255, (h // 8, w // 8, 3), np.uint8)
            im = Image.fromarray(small).resize((w, h), Image.BILINEAR)
            im.save(p, quality=quality)
        paths.append(p)
    return paths


def measure_gather(ds, batch, n_batches, mode="default"):
    """mode: 'default' (what gather() really does — native JPEG decode
    when built, else PIL pool), 'pil_pool', or 'pil_seq' (PIL through a
    1-thread pool — the round-4 single-core baseline)."""
    import semireward_tpu.data.cv_extra as cx

    rs = np.random.RandomState(1)
    old_env = os.environ.get("SRT_DISABLE_NATIVE_JPEG")
    old_pool = cx._DECODE_POOL
    if mode in ("pil_pool", "pil_seq"):
        os.environ["SRT_DISABLE_NATIVE_JPEG"] = "1"
    if mode == "pil_seq":  # force the sequential path via a 1-thread pool
        from concurrent.futures import ThreadPoolExecutor

        cx._DECODE_POOL = ThreadPoolExecutor(max_workers=1)
    try:
        ds.gather(rs.randint(0, len(ds), batch))  # warm file cache
        t0 = time.perf_counter()
        for _ in range(n_batches):
            ds.gather(rs.randint(0, len(ds), batch))
        dt = time.perf_counter() - t0
    finally:
        if mode == "pil_seq":
            cx._DECODE_POOL.shutdown()
            cx._DECODE_POOL = old_pool
        if mode in ("pil_pool", "pil_seq"):
            if old_env is None:
                os.environ.pop("SRT_DISABLE_NATIVE_JPEG", None)
            else:
                os.environ["SRT_DISABLE_NATIVE_JPEG"] = old_env
    return batch * n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=256)
    ap.add_argument("--src-side", type=int, default=400,
                    help="fabricated source JPEG size (real-photo-ish)")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=48,
                    help="images/step: usb_cv bs16 u1 -> 48 @224 "
                         "(16 lb + 2*16 ulb)")
    ap.add_argument("--n-batches", type=int, default=20)
    ap.add_argument("--steps-per-sec", type=float, default=None,
                    help="measured train step rate for the demand line "
                         "(e.g. BENCH extras); demand = sps * batch")
    ap.add_argument("--live-imagenet-demand", action="store_true",
                    help="measure the ViT-B/16-224 FixMatch step rate on "
                         "the live accelerator (the imagenet/semi_aves/"
                         "food101 geometry) and derive the chip-demand "
                         "line from it")
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    from semireward_tpu.data.cv_extra import JPEGFolderDataset
    from semireward_tpu.data.datasets import ArrayDataset, SSLDataBundle
    from semireward_tpu.data.loader import PrefetchLoader, SSLLoader

    root = args.root or os.path.join(tempfile.gettempdir(),
                                     f"loaderbench_{args.src_side}")
    t0 = time.perf_counter()
    paths = fabricate_corpus(root, args.n_images, args.src_side)
    print(f"[{time.perf_counter()-t0:5.1f}s] corpus ready: "
          f"{len(paths)} JPEGs ~{args.src_side}px", file=sys.stderr)

    from semireward_tpu.data import _native

    ds = JPEGFolderDataset(paths, np.zeros(len(paths), np.int64),
                           img_size=args.img_size)
    seq_ips = measure_gather(ds, args.batch, args.n_batches, mode="pil_seq")
    print(f"[{time.perf_counter()-t0:5.1f}s] PIL sequential decode: "
          f"{seq_ips:.1f} img/s", file=sys.stderr)
    pool_ips = measure_gather(ds, args.batch, args.n_batches,
                              mode="pil_pool")
    print(f"[{time.perf_counter()-t0:5.1f}s] PIL pooled decode:     "
          f"{pool_ips:.1f} img/s", file=sys.stderr)
    native_ips = None
    if _native.jpeg_available():
        native_ips = measure_gather(ds, args.batch, args.n_batches,
                                    mode="default")
        print(f"[{time.perf_counter()-t0:5.1f}s] native decode:         "
              f"{native_ips:.1f} img/s", file=sys.stderr)
    best_ips = native_ips if native_ips else pool_ips

    # end-to-end loader batches/s: lb stream (in-RAM) + ulb stream (JPEG)
    lb = ArrayDataset(np.zeros((64, args.img_size, args.img_size, 3),
                               np.uint8), np.zeros(64, np.int64))
    bundle = SSLDataBundle(train_lb=lb, train_ulb=ds, eval=lb,
                           num_classes=1, mean=(0.5,) * 3, std=(0.5,) * 3)
    base = SSLLoader(bundle, 16, 16, seed=0)
    next(base)
    t1 = time.perf_counter()
    for _ in range(args.n_batches):
        next(base)
    base_bps = args.n_batches / (time.perf_counter() - t1)

    pf = PrefetchLoader(SSLLoader(bundle, 16, 16, seed=0), depth=2)
    next(pf)
    time.sleep(0.3)  # let the queue fill: steady-state, not cold-start
    t1 = time.perf_counter()
    for _ in range(args.n_batches):
        next(pf)
    pf_bps = args.n_batches / (time.perf_counter() - t1)
    pf.close()

    out = {
        "geometry": {"src_side": args.src_side, "img_size": args.img_size,
                     "batch": args.batch},
        "host_cpus": os.cpu_count(),
        "decode_seq_images_per_sec": round(seq_ips, 1),
        "decode_pool_images_per_sec": round(pool_ips, 1),
        "decode_native_images_per_sec": (
            round(native_ips, 1) if native_ips else None),
        "loader_batches_per_sec": round(base_bps, 2),
        "loader_prefetch_batches_per_sec": round(pf_bps, 2),
        "loader_images_per_sec": round(base_bps * 48, 1),
    }
    sps = args.steps_per_sec
    if args.live_imagenet_demand:
        import jax

        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(REPO_ROOT, ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        from semireward_tpu.config import get_config
        from semireward_tpu.core.trainer import Trainer

        cfg = get_config(dict(
            algorithm="fixmatch", net="vit_base_patch16_224",
            dataset="synthetic", num_classes=10, num_labels=40,
            batch_size=8, uratio=1, eval_batch_size=8, img_size=224,
            crop_ratio=0.875, optim="AdamW", lr=5e-5, layer_decay=0.65,
            ema_m=0.0, p_cutoff=0.95, num_train_iter=1 << 20,
            num_eval_iter=1 << 30, num_log_iter=1 << 30, seed=0,
            save_name="loaderbench_vitb", mesh_shape=(-1,)))
        cfg.extra["synthetic_train"] = 256
        tr = Trainer(cfg)
        import jax.numpy as jnp
        import time as _t

        tr.state = tr.state.replace(step=jnp.asarray(100, jnp.int32))
        ld = tr._make_loader()
        bs = [tr._put_batch(next(ld)) for _ in range(4)]
        st = tr.state
        for i in range(3):
            st, m = tr._jit_step(st, bs[i % 4])
        _ = float(m["total_loss"])
        t2 = _t.perf_counter()
        for i in range(30):
            st, m = tr._jit_step(st, bs[i % 4])
        _ = float(m["total_loss"])
        sps = 30 / (_t.perf_counter() - t2)
        out["vitb224_steps_per_sec"] = round(sps, 2)
        # demand uses the LIVE config's images/step (bs + 2*ulb), not the
        # --batch default
        args.batch = cfg.batch_size + 2 * cfg.ulb_batch_size
        print(f"[live] ViT-B/16-224 FixMatch step: {sps:.2f}/s "
              f"({args.batch} img/step)", file=sys.stderr)
    if sps:
        demand = sps * args.batch
        out["chip_demand_images_per_sec"] = round(demand, 1)
        # headroom uses what gather() REALLY does (native decode when
        # built — the r5 fix for LOADER_r04's 0.67), PIL pool otherwise
        out["loader_headroom_this_host"] = round(best_ips / demand, 2)
        out["loader_headroom_pil_only"] = round(pool_ips / demand, 2)
        # single-core hosts: project an 8-worker pool at linear scaling of
        # the measured per-core decode rate (both decoders thread across
        # images; the pool engages automatically on multi-core hosts)
        per_core = (native_ips or seq_ips)
        out["loader_headroom_8core_est"] = (
            round(per_core * 8 / demand, 2)
            if (os.cpu_count() or 1) == 1 else None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
