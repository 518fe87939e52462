"""Dataset factories (CV, round 1: CIFAR/SVHN/STL-10 from local files +
synthetic for tests/bench).

Rebuild of reference semilearn/datasets/cv_datasets/*: the reference decodes
+ PIL-augments per sample in dataloader workers; here a dataset is raw
uint8 arrays in host RAM — augmentation runs on device (data/augment). In a
zero-egress environment torchvision downloads are impossible, so loaders
read pre-downloaded torchvision file layouts and fall back loudly.
"""
from __future__ import annotations

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
    "svhn": (0.4380, 0.4440, 0.4730),
    "stl10": (112.4 / 255, 109.1 / 255, 98.6 / 255),
    "synthetic": (0.5, 0.5, 0.5),
}
STD = {
    "cifar10": (0.229, 0.224, 0.225),
    "cifar100": tuple(x / 255 for x in (68.2, 65.4, 70.4)),
    "svhn": (0.1751, 0.1771, 0.1744),
    "stl10": (68.4 / 255, 66.6 / 255, 68.5 / 255),
    "synthetic": (0.25, 0.25, 0.25),
}


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
                   n_test: int = 128, seed: int = 0, noise: int = 40):
    """Class-conditional gaussian-blob images — deterministic, learnable,
    no files needed. Used by tests and the throughput benchmark. ``noise``
    controls task difficulty (higher -> harder, for SSL-gain validation)."""
    rs = np.random.RandomState(seed)
    # one shared set of class prototypes for BOTH splits (the whole point
    # of a learnable synthetic task)
    base = rs.randint(0, 256, (num_classes, img_size, img_size, 3))

    def gen(n):
        y = rs.randint(0, num_classes, n)
        eps = rs.randint(-noise, noise, (n, img_size, img_size, 3))
        x = np.clip(base[y] + eps, 0, 255).astype(np.uint8)
        return x, y.astype(np.int64)

    return gen(n_train), gen(n_test)


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
        from semireward_tpu.data.cv_extra import load_svhn
        (data, targets), (tdata, ttargets) = load_svhn(cfg.data_dir)
        mean, std = MEAN["svhn"], STD["svhn"]
        num_classes = 10
    elif name == "stl10":
        # reference stl10.py: lb split from train, ulb = the dedicated
        # 100k unlabeled_X set
        from semireward_tpu.data.cv_extra import load_stl10
        (data, targets), (tdata, ttargets), unlabeled = load_stl10(cfg.data_dir)
        mean, std = MEAN["stl10"], STD["stl10"]
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
            load_medmnist(cfg.data_dir, mm)
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
    elif name == "synthetic":
        n_train = int(cfg.extra.get("synthetic_train", 2048))
        n_test = int(cfg.extra.get("synthetic_test", 256))
        (data, targets), (tdata, ttargets) = make_synthetic(
            cfg.num_classes, cfg.img_size, n_train, n_test, seed=cfg.seed,
            noise=int(cfg.extra.get("synthetic_noise", 40)))
        mean, std = MEAN["synthetic"], STD["synthetic"]
        num_classes = cfg.num_classes
    elif name in ("imagenet", "imagenet127", "food101", "semi_aves"):
        # full-size JPEG folder datasets: lazy per-batch decode
        # (reference imagenet.py:46-169, aves.py:30-60, food101.py)
        from semireward_tpu.data.cv_extra import (
            MEAN_STD, JPEGFolderDataset, get_imagenet, load_folder_list)
        from semireward_tpu.data.split import sample_labeled_unlabeled_data
        mean, std = MEAN_STD["imagenet"]
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
                train_lb=JPEGFolderDataset(lb_p, lb_y, cfg.img_size),
                train_ulb=JPEGFolderDataset(ulb_p, ulb_y, cfg.img_size),
                eval=JPEGFolderDataset(ev_p, ev_y, cfg.img_size),
                num_classes=cfg.num_classes, mean=mean, std=std)
        if name == "food101":
            tr_p, tr_y = load_folder_list(cfg.data_dir, name, "train_list.txt")
            ev_p, ev_y = load_folder_list(cfg.data_dir, name, "test_list.txt")
            train = JPEGFolderDataset(tr_p, tr_y, cfg.img_size)
            val = JPEGFolderDataset(ev_p, ev_y, cfg.img_size)
        else:  # imagenet / imagenet127 (same tree; 127 = coarse label map)
            train, val = get_imagenet(cfg.data_dir, cfg.img_size)
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
        dump_tag=f"labels{cfg.num_labels}_{cfg.lb_imb_ratio}_seed{cfg.seed}")

    if alg == "fullysupervised":
        lb_data, lb_targets = data, targets

    return SSLDataBundle(
        train_lb=ArrayDataset(lb_data, lb_targets),
        train_ulb=ArrayDataset(ulb_data, ulb_targets),
        eval=ArrayDataset(tdata, ttargets),
        num_classes=num_classes, mean=mean, std=std)


DATASETS.register(get_dataset, name="cv")
