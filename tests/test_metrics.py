"""Eval metrics parity vs sklearn (the reference's metric source,
core/algorithmbase.py:420-450)."""
import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")
from sklearn import metrics as SK  # noqa: E402

from semireward_tpu.core import metrics as M  # noqa: E402


class TestClassification:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_sklearn(self, seed):
        rs = np.random.RandomState(seed)
        C = 7
        y_true = rs.randint(0, C, 200)
        y_pred = rs.randint(0, C, 200)
        ours = M.classification_metrics(y_true, y_pred, C)
        assert np.isclose(ours["top-1-acc"], SK.accuracy_score(y_true, y_pred))
        assert np.isclose(ours["balanced_acc"],
                          SK.balanced_accuracy_score(y_true, y_pred))
        assert np.isclose(ours["precision"],
                          SK.precision_score(y_true, y_pred, average="macro",
                                             zero_division=0))
        assert np.isclose(ours["recall"],
                          SK.recall_score(y_true, y_pred, average="macro",
                                          zero_division=0))
        assert np.isclose(ours["F1"],
                          SK.f1_score(y_true, y_pred, average="macro",
                                      zero_division=0))

    def test_missing_classes(self):
        # classes never predicted / never present
        y_true = np.asarray([0, 0, 1, 1])
        y_pred = np.asarray([0, 0, 0, 0])
        ours = M.classification_metrics(y_true, y_pred, 4)
        assert np.isclose(ours["balanced_acc"],
                          SK.balanced_accuracy_score(y_true, y_pred))
        assert np.isclose(ours["F1"],
                          SK.f1_score(y_true, y_pred, average="macro",
                                      zero_division=0))


class TestRegression:
    def test_matches_sklearn(self, rs):
        y = rs.randn(100) * 3 + 1
        p = y + rs.randn(100)
        ours = M.regression_metrics(y, p)
        assert np.isclose(ours["mse"], SK.mean_squared_error(y, p))
        assert np.isclose(ours["mae"], SK.mean_absolute_error(y, p))
        assert np.isclose(ours["mape"],
                          SK.mean_absolute_percentage_error(y, p))
        assert np.isclose(ours["r2"], SK.r2_score(y, p))
