"""Metric parity vs sklearn (the reference's metric backend,
/root/reference/chexpert.py:11,130-146)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from chexpert_tpu.eval.metrics import (
    auc,
    avg_auc,
    compute_metrics,
    precision_recall_curve,
    roc_curve,
    sum_loss,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roc_curve_parity(seed):
    rng = np.random.RandomState(seed)
    y = (rng.rand(200) > 0.6).astype(float)
    s = rng.randn(200) + y  # informative scores with ties possible
    fpr, tpr, thr = roc_curve(y, s)
    sk_fpr, sk_tpr, sk_thr = skm.roc_curve(y, s)
    np.testing.assert_allclose(fpr, sk_fpr)
    np.testing.assert_allclose(tpr, sk_tpr)
    assert abs(auc(fpr, tpr) - skm.auc(sk_fpr, sk_tpr)) < 1e-12


def test_roc_curve_with_ties():
    y = np.array([0, 0, 1, 1, 0, 1], float)
    s = np.array([0.1, 0.1, 0.1, 0.8, 0.8, 0.8])
    fpr, tpr, _ = roc_curve(y, s)
    sk_fpr, sk_tpr, _ = skm.roc_curve(y, s)
    np.testing.assert_allclose(fpr, sk_fpr)
    np.testing.assert_allclose(tpr, sk_tpr)


@pytest.mark.parametrize("seed", [0, 3])
def test_pr_curve_parity(seed):
    rng = np.random.RandomState(seed)
    y = (rng.rand(150) > 0.5).astype(float)
    s = rng.rand(150)
    p, r, thr = precision_recall_curve(y, s)
    sk_p, sk_r, sk_thr = skm.precision_recall_curve(y, s)
    np.testing.assert_allclose(p, sk_p)
    np.testing.assert_allclose(r, sk_r)
    np.testing.assert_allclose(thr, sk_thr)


def test_auc_nan_when_single_class():
    y = np.zeros(10)
    s = np.random.RandomState(0).rand(10)
    fpr, tpr, _ = roc_curve(y, s)
    assert np.isnan(auc(fpr, tpr))


def test_compute_metrics_structure_and_nanmean():
    rng = np.random.RandomState(0)
    outputs = rng.randn(40, 5)
    targets = (rng.rand(40, 5) > 0.5).astype(float)
    targets[:, 2] = 0.0  # degenerate class -> NaN AUC
    losses = rng.rand(40, 5)
    m = compute_metrics(outputs, targets, losses)
    assert set(m) == {"fpr", "tpr", "aucs", "precision", "recall", "loss"}
    assert set(m["aucs"]) == {0, 1, 2, 3, 4}
    assert np.isnan(m["aucs"][2])
    # avg_auc uses nanmean (reference chexpert.py:189)
    assert not np.isnan(avg_auc(m))
    np.testing.assert_allclose(sum_loss(m), losses.mean(0).sum())
    # JSON-serializable
    import json

    json.dumps({k: v for k, v in m.items() if k != "aucs"})


def test_compute_metrics_matches_sklearn_aucs():
    rng = np.random.RandomState(7)
    outputs = rng.randn(100, 5)
    targets = (rng.rand(100, 5) > 0.5).astype(float)
    m = compute_metrics(outputs, targets, np.zeros((100, 5)))
    for i in range(5):
        sk = skm.roc_auc_score(targets[:, i], outputs[:, i])
        np.testing.assert_allclose(m["aucs"][i], sk, rtol=1e-12)
