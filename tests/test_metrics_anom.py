"""Parity tests for OOD metrics vs sklearn and the reference's fpr sweep."""

import numpy as np
import pytest

from open_world_semantic_segmentation_tpu.metrics import (
    binary_auroc,
    binary_aupr,
    fpr_and_fdr_at_recall,
    get_measures,
    eval_ood_measure,
)

sk = pytest.importorskip("sklearn.metrics")


def _random_case(rng, n=5000, tie_frac=0.0):
    labels = (rng.random(n) < 0.3).astype(np.int32)
    scores = rng.standard_normal(n)
    if tie_frac:
        # quantize a fraction of scores to force ties (mergesort path)
        scores = np.round(scores / tie_frac) * tie_frac
    return labels, scores


@pytest.mark.parametrize("tie_frac", [0.0, 0.5, 2.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auroc_matches_sklearn(seed, tie_frac):
    rng = np.random.default_rng(seed)
    labels, scores = _random_case(rng, tie_frac=tie_frac)
    assert binary_auroc(labels, scores) == pytest.approx(
        sk.roc_auc_score(labels, scores), abs=1e-12)


@pytest.mark.parametrize("tie_frac", [0.0, 0.5, 2.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_aupr_matches_sklearn(seed, tie_frac):
    rng = np.random.default_rng(seed)
    labels, scores = _random_case(rng, tie_frac=tie_frac)
    assert binary_aupr(labels, scores) == pytest.approx(
        sk.average_precision_score(labels, scores), abs=1e-12)


def _reference_fpr(y_true, y_score, recall_level=0.95):
    """Direct transliteration of the reference sweep used as a test oracle
    (anomaly/anom_utils.py:25-65)."""
    y_true = (y_true == 1.0)
    desc = np.argsort(y_score, kind="mergesort")[::-1]
    y_score = y_score[desc]
    y_true = y_true[desc]
    distinct = np.where(np.diff(y_score))[0]
    threshold_idxs = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true, dtype=np.float64)[threshold_idxs]
    fps = 1 + threshold_idxs - tps
    recall = tps / tps[-1]
    last_ind = tps.searchsorted(tps[-1])
    sl = slice(last_ind, None, -1)
    recall, fps = np.r_[recall[sl], 1], np.r_[fps[sl], 0]
    cutoff = np.argmin(np.abs(recall - recall_level))
    return fps[cutoff] / np.sum(np.logical_not(y_true))


@pytest.mark.parametrize("seed", range(5))
def test_fpr_at_recall_matches_reference(seed):
    rng = np.random.default_rng(seed)
    labels, scores = _random_case(rng, n=2000, tie_frac=0.5)
    if labels.sum() == 0:
        labels[0] = 1
    assert fpr_and_fdr_at_recall(labels, scores) == _reference_fpr(
        labels, scores)


def test_get_measures_order_and_values():
    rng = np.random.default_rng(7)
    pos = rng.standard_normal(500) + 1.0
    neg = rng.standard_normal(2000)
    auroc, aupr, fpr = get_measures(pos, neg)
    examples = np.concatenate([pos, neg])
    labels = np.zeros(len(examples), dtype=np.int32)
    labels[:len(pos)] = 1
    assert auroc == pytest.approx(sk.roc_auc_score(labels, examples), abs=1e-12)
    assert aupr == pytest.approx(
        sk.average_precision_score(labels, examples), abs=1e-12)
    assert 0.0 <= fpr <= 1.0
    assert auroc > 0.6  # shifted positives must be detectable


def test_eval_ood_measure_single_class_returns_none():
    conf = np.zeros((4, 4))
    seg = np.zeros((4, 4), dtype=np.int64)  # no pixel has out_label 13
    assert eval_ood_measure(conf, seg, out_labels=(13,)) is None


def test_eval_ood_measure_sign_convention():
    # anomalous pixels (label 13) have LOW conf => -conf is high => detectable
    rng = np.random.default_rng(3)
    seg = (rng.random((64, 64)) < 0.2).astype(np.int64) * 13
    conf = rng.random((64, 64))
    conf[seg == 13] -= 5.0
    auroc, aupr, fpr = eval_ood_measure(conf, seg, out_labels=(13,))
    assert auroc > 0.95
