"""Host-side loader tests: samplers, weighted/TFE streams, eval padding,
native gather (reference semilearn/datasets/samplers/sampler.py:16-150 and
utils.py get_data_loader name2sampler)."""
import numpy as np
import pytest

from semireward_tpu.data import _native
from semireward_tpu.data.datasets import ArrayDataset, SSLDataBundle
from semireward_tpu.data.loader import (SSLLoader, batched, eval_batches,
                                        infinite_indices)


def _bundle(n_lb=40, n_ulb=100, C=4, imbalanced=False, seed=0):
    rs = np.random.RandomState(seed)
    if imbalanced:
        # long-tailed labels: class c appears ~2**(C-c) times
        reps = np.concatenate([np.full(2 ** (C - c), c) for c in range(C)])
        y_lb = np.resize(reps, n_lb)
    else:
        y_lb = np.arange(n_lb) % C
    lb = ArrayDataset(rs.rand(n_lb, 8, 8, 3).astype(np.float32),
                      y_lb.astype(np.int64))
    ulb = ArrayDataset(rs.rand(n_ulb, 8, 8, 3).astype(np.float32),
                       (np.arange(n_ulb) % C).astype(np.int64))
    ev = ArrayDataset(rs.rand(23, 8, 8, 3).astype(np.float32),
                      (np.arange(23) % C).astype(np.int64))
    return SSLDataBundle(train_lb=lb, train_ulb=ulb, eval=ev, num_classes=C,
                         mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))


class TestInfiniteIndices:
    def test_first_epoch_is_permutation(self):
        gen = infinite_indices(10, seed=3)
        first = [next(gen) for _ in range(10)]
        assert sorted(first) == list(range(10))

    def test_deterministic_and_infinite(self):
        a = infinite_indices(7, seed=1)
        b = infinite_indices(7, seed=1)
        xs = [next(a) for _ in range(25)]  # > 3 epochs
        ys = [next(b) for _ in range(25)]
        assert xs == ys
        assert sorted(set(xs)) == list(range(7))

    def test_multihost_ranks_partition_epoch(self):
        n, world = 11, 2
        r0 = infinite_indices(n, seed=5, rank=0, world=world)
        r1 = infinite_indices(n, seed=5, rank=1, world=world)
        per_rank = (n // world)
        e0 = [next(r0) for _ in range(per_rank)]
        e1 = [next(r1) for _ in range(per_rank)]
        # disjoint, equal-sized shards of one seeded permutation (the
        # odd tail index is dropped so shards stay equal)
        assert len(set(e0) & set(e1)) == 0
        assert len(e0) == len(e1) == per_rank


class TestSSLLoader:
    def test_batch_contract(self):
        loader = SSLLoader(_bundle(), batch_size=8, ulb_batch_size=16, seed=0)
        b = next(loader)
        assert set(b) == {"x_lb", "y_lb", "idx_lb", "x_ulb", "y_ulb",
                          "idx_ulb"}
        assert b["x_lb"].shape == (8, 8, 8, 3)
        assert b["x_ulb"].shape == (16, 8, 8, 3)
        assert b["idx_ulb"].dtype == np.int32
        # gathered rows match the dataset at the reported indices
        np.testing.assert_array_equal(
            b["x_lb"], loader.bundle.train_lb.data[b["idx_lb"]])

    def test_same_seed_same_stream(self):
        bu = _bundle()
        l1 = SSLLoader(bu, 8, 8, seed=13)
        l2 = SSLLoader(bu, 8, 8, seed=13)
        for _ in range(5):
            a, b = next(l1), next(l2)
            np.testing.assert_array_equal(a["idx_lb"], b["idx_lb"])
            np.testing.assert_array_equal(a["idx_ulb"], b["idx_ulb"])

    def test_weighted_sampler_rebalances(self):
        bu = _bundle(n_lb=60, imbalanced=True)
        loader = SSLLoader(bu, 32, 8, seed=0,
                           sampler="WeightedRandomSampler")
        counts = np.zeros(bu.num_classes)
        for _ in range(60):
            b = next(loader)
            counts += np.bincount(b["y_lb"], minlength=bu.num_classes)
        freq = counts / counts.sum()
        # raw label frequencies span ~8x; the weighted stream must be
        # near-uniform (each class within 2x of uniform share)
        assert freq.max() / max(freq.min(), 1e-9) < 2.0

    def test_tfe_streams(self):
        loader = SSLLoader(_bundle(imbalanced=True), 8, 8, seed=0,
                           tfe_streams=True, tfe_ulb_batch_size=4)
        b = next(loader)
        assert b["x_tfe_lb"].shape == (8, 8, 8, 3)
        assert b["x_tfe_ulb"].shape == (4, 8, 8, 3)


class TestEvalBatches:
    def test_padding_and_mask(self):
        ds = ArrayDataset(np.arange(23 * 2, dtype=np.float32).reshape(23, 2),
                          np.arange(23, dtype=np.int64))
        batches = list(eval_batches(ds, batch_size=8))
        assert len(batches) == 3
        for b in batches:
            assert b["x"].shape == (8, 2) and b["mask"].shape == (8,)
        assert batches[-1]["mask"].sum() == 23 - 16
        # masked-in rows reconstruct the dataset exactly once, in order
        xs = np.concatenate([b["x"][b["mask"]] for b in batches])
        np.testing.assert_array_equal(xs, ds.data)


class TestNativeGather:
    def test_gather_rows_matches_numpy(self):
        if not _native.available():
            pytest.skip("native fastbatch lib not built")
        rs = np.random.RandomState(0)
        src = rs.rand(4096, 512).astype(np.float32)  # >1MB: native path
        idx = rs.randint(0, 4096, size=333)
        np.testing.assert_array_equal(_native.gather_rows(src, idx), src[idx])


class TestPrefetchLoader:
    def test_order_preserved(self):
        """Single producer + FIFO queue: the batch stream must be identical
        to the unwrapped loader (run reproducibility)."""
        from semireward_tpu.data.loader import PrefetchLoader

        a = SSLLoader(_bundle(), 4, 8, seed=3)
        b = PrefetchLoader(SSLLoader(_bundle(), 4, 8, seed=3), depth=3)
        try:
            for _ in range(12):
                ba, bb = next(a), next(b)
                for k in ba:
                    np.testing.assert_array_equal(ba[k], bb[k])
        finally:
            b.close()

    def test_exception_propagates(self):
        from semireward_tpu.data.loader import PrefetchLoader

        def boom():
            yield {"x": np.zeros(1)}
            raise RuntimeError("decode failed")

        p = PrefetchLoader(boom(), depth=2)
        assert next(p)["x"].shape == (1,)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(p)
        p.close()

    def test_finite_iterator_raises_stopiteration(self):
        """A finite wrapped loader must surface exhaustion as
        StopIteration, not hang the consumer on an empty queue (the
        training loaders are infinite, but fit()-style epoch generators
        and user-supplied iterables are not)."""
        from semireward_tpu.data.loader import PrefetchLoader

        p = PrefetchLoader(iter([{"x": np.zeros(1)}, {"x": np.ones(1)}]),
                           depth=2)
        try:
            assert next(p)["x"][0] == 0
            assert next(p)["x"][0] == 1
            with pytest.raises(StopIteration):
                next(p)
            # iteration protocol: a for-loop over the wrapper terminates
            assert list(PrefetchLoader(iter([]), depth=1)) == []
        finally:
            p.close()

    def test_close_stops_producer(self):
        from semireward_tpu.data.loader import PrefetchLoader

        p = PrefetchLoader(SSLLoader(_bundle(), 4, 8, seed=0), depth=1)
        next(p)
        p.close()
        p._thr.join(timeout=5)
        assert not p._thr.is_alive()


class TestJPEGThreadedDecode:
    def test_gather_matches_sequential(self, tmp_path, monkeypatch):
        """Thread-pool gather must produce the same batch as one-by-one
        decode (order by position, not completion). Pins the PIL path:
        this tests POOL ORDERING, and the native decoder's DCT-scaled
        output differs from PIL by small pixel deltas (its own closeness
        test lives in test_modalities.py::TestNativeJPEG)."""
        from PIL import Image
        from semireward_tpu.data.cv_extra import JPEGFolderDataset

        monkeypatch.setenv("SRT_DISABLE_NATIVE_JPEG", "1")
        rs = np.random.RandomState(0)
        paths = []
        for i in range(12):
            p = tmp_path / f"im{i}.jpg"
            Image.fromarray(
                rs.randint(0, 255, (37 + i, 41, 3), np.uint8)).save(p)
            paths.append(str(p))
        ds = JPEGFolderDataset(paths, np.arange(12), img_size=16)
        idx = np.array([5, 0, 11, 3, 3, 7, 1, 9])
        got = ds.gather(idx)
        exp = np.empty((len(idx), 16, 16, 3), np.uint8)
        for j, i in enumerate(idx):
            ds._decode_one(paths[int(i)], exp, j)
        np.testing.assert_array_equal(got, exp)
