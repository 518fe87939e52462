"""Host-side batching: infinite seeded samplers feeding raw arrays.

Rebuild of the reference's infinite-style DistributedSampler
(semilearn/datasets/samplers/sampler.py:16-150): indices come from repeated
seeded permutations sized to exactly ``num_iters * batch_size`` draws. On
TPU there is one host process per slice host; sharding across devices
happens at jit time (batch sharded on the 'data' mesh axis), so the sampler
needs no rank striding — but accepts (rank, world) for multi-host feeding.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from semireward_tpu.data.datasets import ArrayDataset, SSLDataBundle
from semireward_tpu.data import _native


def _gather(arr, idx):
    """Row gather through the native threaded path when built
    (data/_native/fastbatch.cpp), numpy fancy-indexing otherwise."""
    if isinstance(arr, np.ndarray) and arr.ndim >= 2 and arr.nbytes > (1 << 20):
        return _native.gather_rows(arr, idx)
    return arr[idx]


def infinite_indices(n: int, seed: int, rank: int = 0, world: int = 1
                     ) -> Iterator[int]:
    """Repeated seeded randperm, strided by rank (sampler.py:59-77)."""
    if world > 1 and n < world:
        raise ValueError(
            f"dataset of {n} rows cannot stride over {world} hosts "
            f"(the epoch loop would yield nothing and next() would spin "
            f"forever)")
    g = np.random.RandomState(seed)
    while True:
        perm = g.permutation(n)
        for i in range(rank, n - (n % world or 0) if world > 1 else n, world):
            yield perm[i]


def _class_balance_weights(targets, num_classes: int) -> np.ndarray:
    """Inverse-class-frequency sampling weights, normalized."""
    targets = np.asarray(targets, np.int64)
    cnt = np.bincount(targets, minlength=num_classes).astype(np.float64)
    w = (1.0 / np.maximum(cnt, 1))[targets]
    return w / w.sum()


def batched(it: Iterator[int], batch_size: int) -> Iterator[np.ndarray]:
    buf = []
    for i in it:
        buf.append(i)
        if len(buf) == batch_size:
            yield np.asarray(buf)
            buf = []


class SSLLoader:
    """Yields raw (undecoded, unaugmented) SSL batches:
    {x_lb, y_lb, idx_lb, x_ulb, y_ulb, idx_ulb} as numpy arrays. Device-side
    augmentation turns x_ulb into the weak/strong views inside jit."""

    def __init__(self, bundle: SSLDataBundle, batch_size: int,
                 ulb_batch_size: int, seed: int = 0, rank: int = 0,
                 world: int = 1, tfe_streams: bool = False,
                 tfe_ulb_batch_size: int = 0, sampler: str = "RandomSampler"):
        self.bundle = bundle
        self.batch_size = batch_size
        self.ulb_batch_size = ulb_batch_size
        if sampler == "WeightedRandomSampler":
            # name2sampler's weighted variant (reference
            # datasets/samplers/sampler.py:148): labeled stream reweighted
            # toward class balance. Drawn a BATCH at a time — a per-index
            # rs.choice(p=w) rebuilds the O(N) CDF every draw
            w = _class_balance_weights(bundle.train_lb.targets,
                                       bundle.num_classes)
            rs = np.random.RandomState(seed + 1000 * rank)
            n_lb = len(bundle.train_lb)

            def weighted_batches():
                while True:
                    yield rs.choice(n_lb, batch_size, p=w)

            self._lb = weighted_batches()
        else:
            self._lb = batched(
                infinite_indices(len(bundle.train_lb), seed, rank, world),
                batch_size)
        self._ulb = batched(
            infinite_indices(len(bundle.train_ulb), seed + 1, rank, world),
            ulb_batch_size)
        # CoSSL TFE streams: class-balanced labeled (weighted toward uniform,
        # reference cossl.py:150-160) + an extra unlabeled stream
        self._tfe = None
        if tfe_streams:
            self._tfe_p = _class_balance_weights(bundle.train_lb.targets,
                                                 bundle.num_classes)
            self._tfe_rs = np.random.RandomState(seed + 7 + 1000 * rank)
            self._tfe_ulb = batched(
                infinite_indices(len(bundle.train_ulb), seed + 8, rank, world),
                tfe_ulb_batch_size or batch_size)
            self._tfe = True

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        lb_idx = next(self._lb)
        ulb_idx = next(self._ulb)
        lb, ulb = self.bundle.train_lb, self.bundle.train_ulb

        def fetch(ds, idx):
            # lazy-decode datasets (JPEG folders) expose gather(); in-RAM
            # datasets take the (native-threaded) row gather. Dispatch is
            # PER DATASET — a bundle can mix the two (e.g. a small in-RAM
            # labeled split over a folder-backed unlabeled set).
            if hasattr(ds, "gather"):
                return ds.gather(idx)
            return _gather(ds.data, idx)

        out = {
            "x_lb": fetch(lb, lb_idx),
            "y_lb": lb.targets[lb_idx],
            "idx_lb": lb_idx.astype(np.int32),
            "x_ulb": fetch(ulb, ulb_idx),
            "y_ulb": ulb.targets[ulb_idx],
            "idx_ulb": ulb_idx.astype(np.int32),
        }
        if self._tfe:
            # CoSSL's teacher streams must flow on JPEG-folder datasets
            # too — silently dropping them degrades CoSSL to its base
            # algorithm (cossl.post_loss skips when x_tfe_lb is absent)
            tfe_lb_idx = self._tfe_rs.choice(len(lb), self.batch_size,
                                             p=self._tfe_p)
            tfe_ulb_idx = next(self._tfe_ulb)
            out["x_tfe_lb"] = fetch(lb, tfe_lb_idx)
            out["y_tfe_lb"] = lb.targets[tfe_lb_idx]
            out["x_tfe_ulb"] = fetch(ulb, tfe_ulb_idx)
        return out


class PrefetchLoader:
    """Background-thread prefetch over any (infinite) batch iterator.

    Overlaps host-side batch assembly (JPEG decode, row gather, collate)
    with device steps: a single producer thread fills a bounded FIFO
    queue, so batch order — and therefore run reproducibility — is
    unchanged. The consumer blocks only when the queue is empty; that
    wait is the true loader-starvation signal surfaced as
    ``train/prefetch_time`` (the analogue of the reference TimerHook's
    metric, core/hooks/timer.py:13-27). Producer exceptions re-raise on
    the consumer side."""

    def __init__(self, loader, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thr = threading.Thread(target=self._run, args=(loader,),
                                     name="batch-prefetch", daemon=True)
        self._thr.start()

    _END = object()  # producer-exhausted sentinel (finite wrapped loaders)

    def _run(self, loader):
        import queue

        try:
            for b in loader:
                while not self._stop.is_set():
                    try:
                        self._q.put(b, timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            while not self._stop.is_set():  # finite loader drained
                try:
                    self._q.put(self._END, timeout=0.25)
                    break
                except queue.Full:
                    continue
        except BaseException as e:  # surface on the consumer thread
            # bounded, stop-aware put: an unconditional blocking put would
            # hang this daemon thread forever if the consumer already
            # close()d after its own error (queue full, nobody draining)
            while not self._stop.is_set():
                try:
                    self._q.put(e, timeout=0.25)
                    break
                except queue.Full:
                    try:  # drop one stale batch to make room for the error
                        self._q.get_nowait()
                    except queue.Empty:
                        pass

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()


def get_data_loader(bundle: SSLDataBundle, cfg=None, batch_size: int = 8,
                    ulb_batch_size: Optional[int] = None, seed: int = 0,
                    sampler: str = "RandomSampler") -> SSLLoader:
    """Facade-level loader builder (reference core/utils/build.py:121-190
    get_data_loader). Accepts either a Config (pulls batch sizes / seed /
    sampler from it) or explicit keyword arguments."""
    if cfg is not None:
        batch_size = cfg.batch_size
        ulb_batch_size = cfg.ulb_batch_size
        seed = cfg.seed
        sampler = cfg.train_sampler
    return SSLLoader(bundle, batch_size,
                     ulb_batch_size if ulb_batch_size is not None
                     else batch_size, seed=seed, sampler=sampler)


def eval_batches(ds: ArrayDataset, batch_size: int):
    """Fixed-shape eval batches; last batch padded, with a validity mask so
    jit sees one shape."""
    n = len(ds)
    lazy = hasattr(ds, "gather")  # JPEG folder datasets decode per batch
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        x = (ds.gather(np.arange(start, stop)) if lazy
             else ds.data[start:stop])
        y = ds.targets[start:stop]
        pad = batch_size - (stop - start)
        mask = np.ones(batch_size, bool)
        if pad:
            x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            y = np.concatenate([y, np.repeat(y[-1:], pad, axis=0)])
            mask[stop - start:] = False
        yield {"x": x, "y": y, "mask": mask}
