"""Dataset factories (CV, round 1: CIFAR/SVHN/STL-10 from local files +
synthetic for tests/bench).

Rebuild of reference semilearn/datasets/cv_datasets/*: the reference decodes
+ PIL-augments per sample in dataloader workers; here a dataset is raw
uint8 arrays in host RAM — augmentation runs on device (data/augment). In a
zero-egress environment torchvision downloads are impossible, so loaders
read pre-downloaded torchvision file layouts and fall back loudly.
"""
from __future__ import annotations

import math
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from semireward_tpu.registry import DATASETS
from semireward_tpu.data.split import split_ssl_data

# per-dataset normalization constants (reference cifar.py:16-21, svhn.py,
# stl10.py)
MEAN = {
    "cifar10": (0.485, 0.456, 0.406),
    "cifar100": tuple(x / 255 for x in (129.3, 124.1, 112.4)),
    "synthetic": (0.5, 0.5, 0.5),
}
STD = {
    "cifar10": (0.229, 0.224, 0.225),
    "cifar100": tuple(x / 255 for x in (68.2, 65.4, 70.4)),
    "synthetic": (0.25, 0.25, 0.25),
}
# svhn/stl10/eurosat/medmnist/imagenet constants live ONCE, in
# cv_extra.MEAN_STD (they were duplicated here and could drift)


@dataclass
class ArrayDataset:
    """Raw array dataset: images uint8 [N,H,W,C], integer (or float) targets."""

    data: np.ndarray
    targets: np.ndarray

    def __len__(self):
        return len(self.data)


@dataclass
class SSLDataBundle:
    train_lb: ArrayDataset
    train_ulb: ArrayDataset
    eval: ArrayDataset
    num_classes: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]

    @property
    def ulb_dest_len(self) -> int:
        return len(self.train_ulb)

    @property
    def lb_dest_len(self) -> int:
        return len(self.train_lb)


def _load_cifar10(data_dir: str):
    base = os.path.join(data_dir, "cifar10", "cifar-10-batches-py")
    if not os.path.isdir(base):
        base = os.path.join(data_dir, "cifar-10-batches-py")
    xs, ys = [], []
    for name in [f"data_batch_{i}" for i in range(1, 6)]:
        with open(os.path.join(base, name), "rb") as f:
            d = pickle.load(f, encoding="latin1")
        xs.append(d["data"])
        ys.extend(d["labels"])
    train = (np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1),
             np.asarray(ys, np.int64))
    with open(os.path.join(base, "test_batch"), "rb") as f:
        d = pickle.load(f, encoding="latin1")
    test = (np.asarray(d["data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1),
            np.asarray(d["labels"], np.int64))
    return train, test


def _load_cifar100(data_dir: str):
    base = os.path.join(data_dir, "cifar100", "cifar-100-python")
    if not os.path.isdir(base):
        base = os.path.join(data_dir, "cifar-100-python")
    out = []
    for name in ("train", "test"):
        with open(os.path.join(base, name), "rb") as f:
            d = pickle.load(f, encoding="latin1")
        out.append((np.asarray(d["data"]).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1),
                    np.asarray(d["fine_labels"], np.int64)))
    return out[0], out[1]


def make_synthetic(num_classes: int, img_size: int, n_train: int = 512,
                   n_test: int = 128, seed: int = 0, noise: int = 40,
                   class_sim: float = 0.0, proto_scale: int = 0):
    """Class-conditional gaussian-blob images — deterministic, learnable,
    no files needed. Used by tests and the throughput benchmark. ``noise``
    controls per-sample difficulty; ``class_sim`` in [0,1) mixes a SHARED
    global pattern into every class prototype (prototype = class_sim * G +
    (1 - class_sim) * P_c), compressing inter-class margins so clusters
    OVERLAP under the same noise — the golden-benchmark headroom knob
    (VERDICT r2 item 1): with few labels the labeled-only boundary is far
    from optimal while the unlabeled cluster density still defines the
    classes. ``proto_scale=k`` draws prototypes on a kxk grid upsampled to
    img_size — LOW-FREQUENCY patterns that survive RandAugment's geometric
    ops (a crop/rotation of an iid-pixel pattern is decorrelated from the
    prototype, so consistency training on a hard iid task optimizes pure
    noise; real images are low-frequency, and so must the golden task be).
    class_sim=0, proto_scale=0 reproduces the round-1/2 task
    byte-for-byte."""
    rs = np.random.RandomState(seed)
    # one shared set of class prototypes for BOTH splits (the whole point
    # of a learnable synthetic task)
    if proto_scale:
        rep = img_size // proto_scale
        small = rs.randint(0, 256, (num_classes, proto_scale, proto_scale, 3))
        base = np.repeat(np.repeat(small, rep, axis=1), rep, axis=2)
    else:
        base = rs.randint(0, 256, (num_classes, img_size, img_size, 3))
    if class_sim > 0.0:
        if proto_scale:
            gs = rs.randint(0, 256, (1, proto_scale, proto_scale, 3))
            rep = img_size // proto_scale
            g = np.repeat(np.repeat(gs, rep, axis=1), rep, axis=2)
        else:
            g = rs.randint(0, 256, (1, img_size, img_size, 3))
        base = np.clip(class_sim * g + (1.0 - class_sim) * base,
                       0, 255).astype(np.int64)

    def gen(n):
        y = rs.randint(0, num_classes, n)
        # noise=0 must be legal (clean-task probes): randint(low>=high)
        # raises. The asymmetric [-noise, noise) range is kept as-is —
        # committed round-2 QUALITY artifacts calibrated on this stream
        eps = (rs.randint(-noise, noise, (n, img_size, img_size, 3))
               if noise > 0 else 0)
        x = np.clip(base[y] + eps, 0, 255).astype(np.uint8)
        return x, y.astype(np.int64)

    return gen(n_train), gen(n_test)


def make_synthetic_orbit(num_classes: int, img_size: int, n_lb: int,
                         n_ulb: int = 2048, n_test: int = 512, seed: int = 0,
                         noise: int = 40, rot_lab: float = 10.0,
                         rot_max: float = 90.0, proto_scale: int = 4):
    """Rotation-orbit task with a STRUCTURAL coverage gap — the golden
    benchmark with headroom (VERDICT r2 item 1).

    Design (third iteration — see NOTES_DEV.md for the two negative
    results that shaped it):

    - **Classes are permutations of one shared palette.** Each class
      prototype arranges the SAME ``proto_scale**2`` block colors on a
      ``proto_scale x proto_scale`` grid (upsampled to ``img_size``), in a
      class-specific random order. Every pixelwise statistic — mean color,
      channel histograms, any GAP of a pointwise feature — is therefore
      IDENTICAL across classes: only the spatial arrangement carries the
      label, and arrangement is exactly what rotation scrambles. (The
      round-1/2 blob task was classifiable from color statistics alone,
      which is rotation-invariant and why its labeled-only baseline
      saturated.)
    - **Labeled samples are confined to rotation angles [0, rot_lab]**
      degrees; unlabeled and eval cover [0, rot_max]. A labeled-only
      model is correct only out to its generalization margin beyond
      rot_lab and near chance at large angles — a ceiling set by
      GEOMETRY, not sampling, so it is stable across seeds.
    - **Strong augmentation bridges the gap.** RandAugment's geometric
      ops (Rotate/Shear/Translate) map a confident unlabeled sample at
      angle a to views at a ± 30 deg; FixMatch-style consistency chains
      those overlapping windows outward from the labeled wedge through
      the dense unlabeled orbit. That is the textbook consistency-
      propagation mechanism the reference's benchmarks reward
      (results/classic_cv.csv) — and unlike cluster-interpolation designs,
      a rotated prototype never approaches ANOTHER class's manifold.

    The palette/arrangement geometry is FIXED (independent of ``seed``):
    seeds vary sampling, noise draws, and net init — like the reference's
    3-seed protocol, where the dataset is constant across seeds.
    """
    rs_geom = np.random.RandomState(1234)
    k = proto_scale
    # one shared palette; classes = random arrangements of it
    palette = rs_geom.randint(0, 256, (k * k, 3))
    protos = np.stack([
        palette[rs_geom.permutation(k * k)].reshape(k, k, 3)
        for _ in range(num_classes)])
    rep = img_size // k
    protos = np.repeat(np.repeat(protos, rep, axis=1), rep, axis=2)
    protos = protos.astype(np.float32)
    rs = np.random.RandomState(seed)

    c = (img_size - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(img_size, dtype=np.float32),
                         np.arange(img_size, dtype=np.float32), indexing="ij")

    def gen(n, lo, hi, balanced=False):
        if balanced:
            assert n % num_classes == 0, (n, num_classes)
            y = np.tile(np.arange(num_classes), n // num_classes)
        else:
            y = rs.randint(0, num_classes, n)
        th = np.deg2rad(rs.uniform(lo, hi, n).astype(np.float32))
        cs, sn = np.cos(th)[:, None, None], np.sin(th)[:, None, None]
        # inverse-map nearest-neighbour rotation about the image center,
        # edge-clamped (the blocky prototype extends to the borders, so
        # clamping continues the border blocks — no fill artifacts)
        ys = c + (yy - c) * cs - (xx - c) * sn
        xs = c + (yy - c) * sn + (xx - c) * cs
        yc = np.clip(np.rint(ys).astype(np.int64), 0, img_size - 1)
        xc = np.clip(np.rint(xs).astype(np.int64), 0, img_size - 1)
        x = protos[y[:, None, None], yc, xc]
        eps = rs.randint(-noise, noise + 1, x.shape)
        x = np.clip(x + eps, 0, 255).astype(np.uint8)
        return x, y.astype(np.int64)

    lb = gen(n_lb, 0.0, rot_lab, balanced=True)
    ulb = gen(n_ulb, 0.0, rot_max)
    ev = gen(n_test, 0.0, rot_max)
    return lb, ulb, ev


def get_dataset(cfg, alg: str = "fixmatch") -> SSLDataBundle:
    """Dataset-name dispatch (reference core/utils/build.py:60-118)."""
    name = cfg.dataset
    if name in ("cifar10", "cifar100"):
        loader = _load_cifar10 if name == "cifar10" else _load_cifar100
        try:
            (data, targets), (tdata, ttargets) = loader(cfg.data_dir)
        except (FileNotFoundError, OSError) as e:
            raise FileNotFoundError(
                f"{name} not found under {cfg.data_dir} (no network in this "
                f"environment — place the torchvision-extracted files there, "
                f"or use dataset='synthetic')") from e
        mean, std = MEAN[name], STD[name]
        num_classes = 10 if name == "cifar10" else 100
    elif name == "svhn":
        from semireward_tpu.data.cv_extra import (MEAN_STD,
                                                  load_svhn)
        (data, targets), (tdata, ttargets) = load_svhn(cfg.data_dir)
        mean, std = MEAN_STD["svhn"]
        num_classes = 10
    elif name == "stl10":
        # reference stl10.py: lb split from train, ulb = the dedicated
        # 100k unlabeled_X set
        from semireward_tpu.data.cv_extra import (MEAN_STD,
                                                  load_stl10)
        (data, targets), (tdata, ttargets), unlabeled = load_stl10(cfg.data_dir)
        mean, std = MEAN_STD["stl10"]
        rng = np.random.RandomState(cfg.seed)
        lb_data, lb_targets, _, _ = split_ssl_data(
            data, targets, 10, cfg.num_labels, include_lb_to_ulb=False,
            rng=rng)
        ulb = unlabeled
        if cfg.include_lb_to_ulb:
            ulb = np.concatenate([lb_data, unlabeled], 0)
        return SSLDataBundle(
            train_lb=ArrayDataset(lb_data, lb_targets),
            train_ulb=ArrayDataset(ulb, np.full(len(ulb), -1, np.int64)),
            eval=ArrayDataset(tdata, ttargets),
            num_classes=10, mean=mean, std=std)
    elif name in ("tissuemnist", "medmnist") or (
            name.endswith("mnist") and name != "rcf_mnist"):
        # any MedMNIST member loads from its <name>.npz (the reference
        # vendors the whole INFO catalog, medmnist.py:24-200; USB
        # benchmarks tissuemnist)
        mm = "tissuemnist" if name == "medmnist" else name
        from semireward_tpu.data.cv_extra import load_medmnist
        (data, targets), (vdata, vtargets), (tdata, ttargets) = \
            load_medmnist(cfg.data_dir, mm, num_classes=cfg.num_classes)
        tdata, ttargets = vdata, vtargets  # eval split = val (USB convention)
        from semireward_tpu.data.cv_extra import MEAN_STD
        ms = MEAN_STD.get(mm, ((0.5,), (0.5,)))
        mean = tuple(list(ms[0]) * (3 if len(ms[0]) == 1 else 1))
        std = tuple(list(ms[1]) * (3 if len(ms[1]) == 1 else 1))
        num_classes = cfg.num_classes
    elif name == "eurosat":
        from semireward_tpu.data.cv_extra import load_eurosat, MEAN_STD
        (data, targets), (tdata, ttargets) = load_eurosat(cfg.data_dir)
        mean, std = MEAN_STD["eurosat"]
        num_classes = 10
    elif name == "synthetic_orbit":
        if cfg.lb_imb_ratio != 1.0 or cfg.ulb_imb_ratio != 1.0:
            raise ValueError(
                "synthetic_orbit generates balanced splits directly and does "
                "not support lb/ulb_imb_ratio — use dataset='synthetic' for "
                "the imbalanced tier (validation.imb_gain does)")
        (lb_x, lb_y), (ulb_x, ulb_y), (ev_x, ev_y) = make_synthetic_orbit(
            cfg.num_classes, cfg.img_size, n_lb=cfg.num_labels,
            n_ulb=int(cfg.extra.get("synthetic_train", 2048)),
            n_test=int(cfg.extra.get("synthetic_test", 512)),
            seed=cfg.seed,
            noise=int(cfg.extra.get("synthetic_noise", 40)),
            rot_lab=float(cfg.extra.get("orbit_rot_lab", 10.0)),
            rot_max=float(cfg.extra.get("orbit_rot_max", 90.0)),
            proto_scale=int(cfg.extra.get("synthetic_proto_scale", 4)) or 4)
        return SSLDataBundle(
            train_lb=ArrayDataset(lb_x, lb_y),
            train_ulb=ArrayDataset(ulb_x, ulb_y),
            eval=ArrayDataset(ev_x, ev_y),
            num_classes=cfg.num_classes,
            mean=MEAN["synthetic"], std=STD["synthetic"])
    elif name == "synthetic":
        n_train = int(cfg.extra.get("synthetic_train", 2048))
        n_test = int(cfg.extra.get("synthetic_test", 256))
        (data, targets), (tdata, ttargets) = make_synthetic(
            cfg.num_classes, cfg.img_size, n_train, n_test, seed=cfg.seed,
            noise=int(cfg.extra.get("synthetic_noise", 40)),
            class_sim=float(cfg.extra.get("synthetic_class_sim", 0.0)),
            proto_scale=int(cfg.extra.get("synthetic_proto_scale", 0)))
        mean, std = MEAN["synthetic"], STD["synthetic"]
        num_classes = cfg.num_classes
    elif name in ("imagenet", "imagenet127", "food101", "semi_aves"):
        # full-size JPEG folder datasets: lazy per-batch decode
        # (reference imagenet.py:46-169, aves.py:30-60, food101.py)
        from semireward_tpu.data.cv_extra import (
            MEAN_STD, JPEGFolderDataset, get_imagenet, load_folder_list)
        from semireward_tpu.data.split import sample_labeled_unlabeled_data
        mean, std = MEAN_STD["imagenet"]
        # decode at img_size/crop_ratio: the reference resizes to that then
        # RandomCrop/RandomResizedCrop/CenterCrops to img_size
        # (imagenet.py:50-70); device-side views mirror it via
        # AugmentSpec.src_size, eval center-crops host-side
        decode = int(math.floor(cfg.img_size / cfg.crop_ratio))
        if name == "semi_aves":
            # predefined lb/ulb/val lists — no index split
            def _first(*cands):
                for c in cands:
                    if os.path.isfile(os.path.join(cfg.data_dir, name, c)):
                        return load_folder_list(cfg.data_dir, name, c)
                raise FileNotFoundError(
                    f"{name}: none of {cands} under {cfg.data_dir}/{name}")

            lb_p, lb_y = _first("l_train_val.txt", "l_train.txt")
            ulb_p, ulb_y = _first("u_train_in.txt", "u_train.txt")
            ev_p, ev_y = _first("val.txt", "test.txt")
            return SSLDataBundle(
                train_lb=JPEGFolderDataset(lb_p, lb_y, decode),
                train_ulb=JPEGFolderDataset(ulb_p, ulb_y, decode),
                eval=JPEGFolderDataset(ev_p, ev_y, decode),
                num_classes=cfg.num_classes, mean=mean, std=std)
        if name == "food101":
            tr_p, tr_y = load_folder_list(cfg.data_dir, name, "train_list.txt")
            ev_p, ev_y = load_folder_list(cfg.data_dir, name, "test_list.txt")
            train = JPEGFolderDataset(tr_p, tr_y, decode)
            val = JPEGFolderDataset(ev_p, ev_y, decode)
        else:
            # imagenet / imagenet127: the reference treats both as the SAME
            # plain folder loader (core/utils/build.py:97) — for
            # imagenet127 the directory tree itself holds the 127 coarse
            # class folders (prepared offline); no in-code label map exists
            # in either framework
            train, val = get_imagenet(cfg.data_dir, decode)
        rng = np.random.RandomState(cfg.seed)
        dump_dir = os.path.join(cfg.data_dir, "data_statistics", name,
                                "labeled_idx")
        lb_idx, ulb_idx = sample_labeled_unlabeled_data(
            np.asarray(train.targets), cfg.num_classes, cfg.num_labels,
            ulb_num_labels=cfg.ulb_num_labels,
            lb_imbalance_ratio=cfg.lb_imb_ratio,
            ulb_imbalance_ratio=cfg.ulb_imb_ratio, rng=rng,
            dump_dir=dump_dir,
            dump_tag=f"labels{cfg.num_labels}_{cfg.lb_imb_ratio}"
                     f"_ulb{cfg.ulb_num_labels}_{cfg.ulb_imb_ratio}"
                     f"_seed{cfg.seed}")
        if cfg.include_lb_to_ulb:
            ulb_idx = np.concatenate([lb_idx, ulb_idx])
        return SSLDataBundle(
            train_lb=train.subset(lb_idx), train_ulb=train.subset(ulb_idx),
            eval=val, num_classes=cfg.num_classes, mean=mean, std=std)
    elif name in ("agedb", "imdb_wiki", "rcf_mnist"):
        # regression CV sets (num_classes == 1, float targets; labeled
        # subset is a plain random sample — class balance is undefined)
        from semireward_tpu.data.cv_extra import load_regression_folder
        (data, targets), (tdata, ttargets) = load_regression_folder(
            cfg.data_dir, name)
        rng = np.random.RandomState(cfg.seed)
        perm = rng.permutation(len(data))
        lb_idx = perm[:cfg.num_labels]
        ulb_idx = perm if cfg.include_lb_to_ulb else perm[cfg.num_labels:]
        return SSLDataBundle(
            train_lb=ArrayDataset(data[lb_idx], targets[lb_idx]),
            train_ulb=ArrayDataset(data[ulb_idx], targets[ulb_idx]),
            eval=ArrayDataset(tdata, ttargets),
            num_classes=1, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
    else:
        raise KeyError(
            f"dataset '{name}' is not wired in the TPU build; available: "
            f"cifar10/100, svhn, stl10, eurosat, any *mnist (MedMNIST), "
            f"imagenet(127), food101, semi_aves, agedb, imdb_wiki, "
            f"rcf_mnist, synthetic")

    rng = np.random.RandomState(cfg.seed)
    dump_dir = os.path.join(cfg.data_dir, "data_statistics", name, "labeled_idx")
    lb_data, lb_targets, ulb_data, ulb_targets = split_ssl_data(
        data, targets, num_classes, cfg.num_labels,
        ulb_num_labels=cfg.ulb_num_labels,
        lb_imbalance_ratio=cfg.lb_imb_ratio,
        ulb_imbalance_ratio=cfg.ulb_imb_ratio,
        include_lb_to_ulb=cfg.include_lb_to_ulb,
        rng=rng,
        dump_dir=dump_dir if name != "synthetic" else None,
        dump_tag=f"labels{cfg.num_labels}_{cfg.lb_imb_ratio}"
                 f"_ulb{cfg.ulb_num_labels}_{cfg.ulb_imb_ratio}"
                 f"_seed{cfg.seed}")

    if alg == "fullysupervised":
        lb_data, lb_targets = data, targets

    return SSLDataBundle(
        train_lb=ArrayDataset(lb_data, lb_targets),
        train_ulb=ArrayDataset(ulb_data, ulb_targets),
        eval=ArrayDataset(tdata, ttargets),
        num_classes=num_classes, mean=mean, std=std)


DATASETS.register(get_dataset, name="cv")
