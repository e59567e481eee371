"""Parity tests: pure-NumPy metrics vs sklearn (the reference's metrics
backend, utils.py:29-65)."""

import numpy as np
import pytest

from vec_vad_tpu.eval import metrics as M

sklearn_metrics = pytest.importorskip("sklearn.metrics")


def _random_case(rng, n=500, ties=False):
    scores = rng.normal(size=n)
    if ties:
        scores = np.round(scores, 1)  # force many tied thresholds
    labels = (rng.random(n) < 0.3).astype(np.int64)
    # anomalous frames score a bit higher
    scores = scores + labels * rng.normal(1.0, 0.5, size=n)
    return scores, labels


@pytest.mark.parametrize("ties", [False, True])
def test_roc_curve_matches_sklearn(rng, ties):
    scores, labels = _random_case(rng, ties=ties)
    fpr, tpr, thr = M.roc_curve(scores, labels)
    fpr_sk, tpr_sk, thr_sk = sklearn_metrics.roc_curve(labels, scores)
    np.testing.assert_allclose(fpr, fpr_sk)
    np.testing.assert_allclose(tpr, tpr_sk)
    # sklearn >=1.3 uses inf for the first threshold; older uses max+1.
    np.testing.assert_allclose(thr[1:], thr_sk[1:])


@pytest.mark.parametrize("ties", [False, True])
def test_pr_curve_matches_sklearn(rng, ties):
    scores, labels = _random_case(rng, ties=ties)
    p, r, t = M.precision_recall_curve(scores, labels)
    p_sk, r_sk, t_sk = sklearn_metrics.precision_recall_curve(labels, scores)
    np.testing.assert_allclose(p, p_sk)
    np.testing.assert_allclose(r, r_sk)
    np.testing.assert_allclose(t, t_sk)


def test_auc_matches_sklearn(rng):
    scores, labels = _random_case(rng)
    ours = M.roc_auc_score(scores, labels)
    theirs = sklearn_metrics.roc_auc_score(labels, scores)
    assert abs(ours - theirs) < 1e-12


def test_evaluate_scores_matches_reference_recipe(rng):
    """Replicate the exact recipe of utils.py:29-65 with sklearn and compare
    every published quantity."""
    scores, labels = _random_case(rng, ties=True)
    res = M.evaluate_scores(scores, labels)

    # Reference recipe (utils.py:33-52), re-expressed with sklearn directly.
    s = scores.flatten()
    l = labels.flatten()
    pos, neg = s[l == 1], s[l != 1]
    truth = np.concatenate((np.zeros_like(neg), np.ones_like(pos)))
    preds = np.concatenate((neg, pos))
    fpr, tpr, _ = sklearn_metrics.roc_curve(truth, preds)
    roc_auc = sklearn_metrics.auc(fpr, tpr)
    fnr = 1 - tpr
    eer1 = fpr[np.nanargmin(np.absolute(fnr - fpr))]
    eer2 = fnr[np.nanargmin(np.absolute(fnr - fpr))]
    p_n, r_n, _ = sklearn_metrics.precision_recall_curve(truth, preds)
    pr_auc_norm = sklearn_metrics.auc(r_n, p_n)
    p_a, r_a, _ = sklearn_metrics.precision_recall_curve(truth, -preds, pos_label=0)
    pr_auc_anom = sklearn_metrics.auc(r_a, p_a)

    assert abs(res.roc_auc - roc_auc) < 1e-12
    assert abs(res.eer1 - eer1) < 1e-12
    assert abs(res.eer2 - eer2) < 1e-12
    assert abs(res.pr_auc_norm - pr_auc_norm) < 1e-12
    assert abs(res.pr_auc_anom - pr_auc_anom) < 1e-12


def test_perfect_and_random_separation():
    scores = np.r_[np.zeros(50), np.ones(50)]
    labels = np.r_[np.zeros(50), np.ones(50)]
    assert M.roc_auc_score(scores, labels) == 1.0
    assert M.roc_auc_score(-scores, labels) == 0.0
