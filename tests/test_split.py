"""Long-tailed split semantics (reference datasets/utils.py:25-153)."""
import numpy as np

from semireward_tpu.data.split import (make_imbalance_data,
                                       sample_labeled_unlabeled_data,
                                       split_ssl_data)


class TestMakeImbalanceData:
    def test_geometric_profile(self):
        # head = max_num_labels, tail = max/gamma, geometric in between
        n = make_imbalance_data(1500, 10, 100.0)
        assert n[0] == 1500
        assert n[-1] == 15
        assert all(a >= b for a, b in zip(n, n[1:]))  # monotone decreasing

    def test_negative_gamma_reverses_tail(self):
        pos = make_imbalance_data(300, 10, 10.0)
        neg = make_imbalance_data(300, 10, -10.0)
        assert neg == pos[::-1]


class TestSampling:
    def test_imbalanced_lb_counts(self):
        rs = np.random.RandomState(0)
        target = np.repeat(np.arange(4), 600)
        lb_idx, ulb_idx = sample_labeled_unlabeled_data(
            target, 4, lb_num_labels=500, ulb_num_labels=400,
            lb_imbalance_ratio=100.0, ulb_imbalance_ratio=-100.0, rng=rs)
        lb_counts = np.bincount(target[lb_idx], minlength=4)
        ulb_counts = np.bincount(target[ulb_idx], minlength=4)
        exp_lb = make_imbalance_data(500, 4, 100.0)
        exp_ulb = make_imbalance_data(400, 4, -100.0)
        assert list(lb_counts) == exp_lb
        assert list(ulb_counts) == exp_ulb
        # lb head-heavy, ulb reversed (tail-heavy): disjoint index sets
        assert lb_counts[0] > lb_counts[-1]
        assert ulb_counts[0] < ulb_counts[-1]
        assert not set(lb_idx) & set(ulb_idx)

    def test_persisted_split_reloads(self, tmp_path):
        rs = np.random.RandomState(0)
        target = np.repeat(np.arange(4), 50)
        a = sample_labeled_unlabeled_data(
            target, 4, 16, rng=rs, dump_dir=str(tmp_path), dump_tag="t")
        rs2 = np.random.RandomState(999)  # different rng: must not matter
        b = sample_labeled_unlabeled_data(
            target, 4, 16, rng=rs2, dump_dir=str(tmp_path), dump_tag="t")
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_split_ssl_data_include_lb(self):
        rs = np.random.RandomState(0)
        data = np.arange(200 * 2).reshape(200, 2)
        target = np.repeat(np.arange(4), 50)
        lb_x, lb_y, ulb_x, ulb_y = split_ssl_data(
            data, target, 4, 16, include_lb_to_ulb=True, rng=rs)
        assert len(lb_x) == 16
        assert len(ulb_x) == 200  # lb rows included in ulb set
        lb_rows = {tuple(r) for r in lb_x}
        ulb_rows = {tuple(r) for r in ulb_x}
        assert lb_rows <= ulb_rows
