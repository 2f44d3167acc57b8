"""GMM/ECDF score-calibration tests (openset/calibration.py).

The reference ships this design only as commented scaffolding
(DeepLabV3Plus-Pytorch/main_embedding.py:175-226) plus the live
``Normalization``/``Certainty`` helpers (:101-113); these tests pin the
rebuild's working implementation against sklearn/manual oracles.
"""

import numpy as np
import pytest

from open_world_semantic_segmentation_tpu.openset.calibration import (
    ScoreCalibration,
    certainty,
    collect_dissum_samples,
    ecdf_eval,
    fit_gmm2_1d,
)


def test_ecdf_matches_definition():
    s = np.sort(np.array([1.0, 2.0, 2.0, 5.0]))
    # right-continuous P(X <= q) — statsmodels ECDF semantics
    assert ecdf_eval(s, 0.5) == 0.0
    assert ecdf_eval(s, 1.0) == 0.25
    assert ecdf_eval(s, 2.0) == 0.75
    assert ecdf_eval(s, 4.9) == 0.75
    assert ecdf_eval(s, 5.0) == 1.0
    np.testing.assert_allclose(ecdf_eval(s, np.array([1.5, 10.0])),
                               [0.25, 1.0])


def test_gmm2_matches_sklearn_oracle():
    sklearn = pytest.importorskip("sklearn.mixture")
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0.0, 0.5, 4000),
                        rng.normal(8.0, 1.0, 2000)])
    mu, var, w = fit_gmm2_1d(x)
    ref = sklearn.GaussianMixture(n_components=2, random_state=0)
    ref.fit(x.reshape(-1, 1))
    order = np.argsort(mu)
    ref_order = np.argsort(ref.means_.ravel())
    np.testing.assert_allclose(mu[order], ref.means_.ravel()[ref_order],
                               atol=0.05)
    np.testing.assert_allclose(var[order],
                               ref.covariances_.ravel()[ref_order],
                               rtol=0.05)
    np.testing.assert_allclose(w[order], ref.weights_[ref_order], atol=0.02)


def test_gmm2_deterministic():
    rng = np.random.default_rng(1)
    x = np.concatenate([rng.normal(1, 0.2, 500), rng.normal(5, 0.5, 500)])
    a = fit_gmm2_1d(x)
    b = fit_gmm2_1d(x)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)


def test_certainty_step_semantics():
    # main_embedding.py:106-109: c = ecdf(x); c[c > 0.15] = 1
    s = np.sort(np.arange(100, dtype=np.float64))
    x = np.array([5.0, 14.0, 20.0, 99.0])
    c = certainty(x, s, mode="step")
    np.testing.assert_allclose(c, [0.06, 0.15, 1.0, 1.0])


def test_certainty_sigmoid_semantics():
    # commented variant (:110-112): 1/(1+exp(-50*(ecdf(x)-ecdf(thre))))
    s = np.sort(np.arange(100, dtype=np.float64))
    thre = 49.0
    x = np.array([10.0, 49.0, 90.0])
    c = certainty(x, s, thre=thre, mode="sigmoid")
    e = ecdf_eval(s, x)
    t = ecdf_eval(s, thre)
    np.testing.assert_allclose(c, 1.0 / (1.0 + np.exp(-50.0 * (e - t))))
    assert c[0] < 0.5 < c[2]


def test_collect_dissum_samples_masks_and_caps():
    rng = np.random.default_rng(0)
    n_cls = 3
    h = w = 100
    labels = np.zeros((h, w), np.int64)
    labels[:, 50:] = 1
    labels[:10] = 255  # unknown strip
    preds = labels.copy()
    preds[labels == 255] = 0
    dissum = np.where(labels == 255, 2000.0, 1.0)  # unknown above the cap
    dissum[20:25, :5] = 3.0
    data = [[] for _ in range(n_cls + 1)]
    collect_dissum_samples(dissum, preds, labels, n_cls, data, rng, rate=100)
    # class 0: ~4500 agreeing pixels -> 45 samples; class 2 never appears
    assert len(data[0]) == (labels == 0).sum() // 100
    assert len(data[1]) == (labels == 1).sum() // 100
    assert len(data[2]) == 0
    # unknown samples all exceeded the 1000 cap -> filtered out entirely
    assert len(data[-1]) == 0
    assert all(v in (1.0, 3.0) for v in data[0])


def test_fit_apply_separates_ood():
    # Direction note: with the DML head, logit_k = -||x - 3 e_k||^2, so a
    # correctly-embedded pixel has dis_sum ~ sum of large inter-prototype
    # distances, while an OOD pixel (embedding near the origin, between
    # prototypes) has a LOWER dis_sum — the certainty is therefore the
    # ECDF (low dis_sum = below the class's calibrated mass = uncertain),
    # saturated to 1 above the 0.15 quantile (main_embedding.py:106-109).
    rng = np.random.default_rng(0)
    n_cls = 2
    data = [rng.normal(10.0, 0.5, 400).tolist(),
            rng.normal(12.0, 0.5, 400).tolist(),
            []]
    calib = ScoreCalibration.fit(data)
    # synthetic eval map: left half in-distribution, right half OOD (low)
    h, w = 8, 10
    dissum = np.full((h, w), 11.0)
    dissum[:, 5:] = 2.0
    probs = np.full((h, w, n_cls), 0.5)
    cert, anom = calib.apply(probs, dissum)
    assert anom.shape == (h, w)
    np.testing.assert_allclose(cert + anom, 1.0)
    assert anom[:, 5:].mean() > anom[:, :5].mean()
    calib_sig = ScoreCalibration.fit(data, mode="sigmoid")
    _, anom_s = calib_sig.apply(probs, dissum)
    assert anom_s[:, 5:].mean() > anom_s[:, :5].mean()


def test_fit_null_classes_and_all_null():
    data = [[1.0, 1.1, 0.9, 1.2] * 10, [], []]
    calib = ScoreCalibration.fit(data)
    assert calib.sorted_samples[1].size == 0
    np.testing.assert_allclose(calib.certainty_map(np.ones((2, 2)), 1), 1.0)
    with pytest.raises(ValueError):
        ScoreCalibration.fit([[], [], []])


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = [rng.normal(1, 0.1, 300).tolist(),
            rng.normal(4, 0.5, 300).tolist(), []]
    calib = ScoreCalibration.fit(data, mode="sigmoid", clip=500.0)
    p = str(tmp_path / "calib.npz")
    calib.save(p)
    back = ScoreCalibration.load(p)
    assert back.mode == "sigmoid" and back.clip == 500.0
    np.testing.assert_array_equal(back.thresholds, calib.thresholds)
    for a, b in zip(back.sorted_samples, calib.sorted_samples):
        np.testing.assert_array_equal(a, b)
    x = rng.normal(2, 1, (4, 5))
    probs = np.full((4, 5, 2), 0.5)
    np.testing.assert_array_equal(back.apply(probs, x)[0],
                                  calib.apply(probs, x)[0])


def test_clip_applied_before_ecdf():
    # main_embedding.py:250: dis_sum_map[dis_sum_map > 1000] = 1000
    data = [np.linspace(0, 2000, 200).tolist(), []]
    calib = ScoreCalibration.fit(data, clip=1000.0)
    a = calib.certainty_map(np.array([1000.0]), 0)
    b = calib.certainty_map(np.array([1e9]), 0)
    np.testing.assert_array_equal(a, b)
