"""Metric tests: exact AUC vs sklearn, streaming AUC convergence, logloss."""
import numpy as np
import pytest

from recommender_system_tpu.utils.metrics import (StreamingAUC, accuracy, auc,
                                                  logloss, recall_at_n)


def test_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score

    y = (rng.uniform(size=500) < 0.3).astype(np.float32)
    s = rng.uniform(size=500)
    np.testing.assert_allclose(auc(y, s), roc_auc_score(y, s), rtol=1e-10)


def test_auc_with_ties(rng):
    from sklearn.metrics import roc_auc_score

    y = (rng.uniform(size=300) < 0.5).astype(np.float32)
    s = rng.integers(0, 5, size=300) / 4.0  # heavy ties
    np.testing.assert_allclose(auc(y, s), roc_auc_score(y, s), rtol=1e-10)


def test_streaming_auc_close_to_exact(rng):
    y = (rng.uniform(size=5000) < 0.25).astype(np.float32)
    s = np.clip(rng.normal(0.3 + 0.3 * y, 0.2), 0, 1)
    stream = StreamingAUC()
    for i in range(0, 5000, 1000):
        stream.update(y[i:i + 1000], s[i:i + 1000])
    # binning error is O(1/n_bins) + within-bin tie credit; 1e-2 is the
    # monitoring-grade contract (exact AUC is used for parity numbers)
    assert abs(stream.result() - auc(y, s)) < 1e-2
    # batched == one-shot accumulation
    once = StreamingAUC()
    once.update(y, s)
    np.testing.assert_allclose(stream.result(), once.result(), rtol=1e-12)


def test_logloss_and_accuracy():
    y = np.array([1, 0, 1, 0])
    p = np.array([0.9, 0.1, 0.8, 0.4])
    expected = -np.mean([np.log(0.9), np.log(0.9), np.log(0.8), np.log(0.6)])
    np.testing.assert_allclose(logloss(y, p), expected, rtol=1e-6)
    assert accuracy(y, p) == 1.0


def test_recall_at_n():
    preds = [["a", "b"], ["c"], ["d", "e"]]
    truth = ["b", "x", "d"]
    np.testing.assert_allclose(recall_at_n(preds, truth), 2 / 3)
