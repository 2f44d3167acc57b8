"""Tests for segmentation metrics: IoU histograms, streaming confusion matrix."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_world_semantic_segmentation_tpu.metrics import (
    pixel_accuracy,
    intersection_and_union,
    intersection_and_union_jax,
    StreamSegMetrics,
    confusion_matrix_update,
)


def test_pixel_accuracy_ignores_negative_labels():
    label = np.array([[0, 1], [-1, 2]])
    pred = np.array([[0, 2], [0, 2]])
    acc, n = pixel_accuracy(pred, label)
    assert n == 3
    assert acc == (2 / (3 + 1e-10))


def test_intersection_and_union_basic():
    # 3 classes (0,1,2); label -1 = unlabeled must not penalize predictions
    label = np.array([[0, 1], [-1, 2]])
    pred = np.array([[0, 2], [1, 2]])
    inter, union = intersection_and_union(pred, label, 3)
    assert inter.tolist() == [1, 0, 1]
    # pred histogram after masking the unlabeled pixel: {0:1, 2:2} (pred=1 on
    # the unlabeled pixel is zeroed); label histogram {0:1,1:1,2:1}
    assert union.tolist() == [1, 1, 2]


def test_intersection_and_union_jax_matches_numpy():
    rng = np.random.default_rng(0)
    for ncls in (2, 13, 19):
        label = rng.integers(-1, ncls + 1, size=(37, 53))  # incl. out-of-range
        pred = rng.integers(0, ncls, size=(37, 53))
        ref_i, ref_u = intersection_and_union(pred, label, ncls)
        jx_i, jx_u = intersection_and_union_jax(
            jnp.asarray(pred), jnp.asarray(label), ncls)
        np.testing.assert_array_equal(np.asarray(jx_i), ref_i)
        np.testing.assert_array_equal(np.asarray(jx_u), ref_u)


def test_stream_metrics_hist_is_19_classes_after_reset():
    # Reference quirk: StreamSegMetrics(16) still uses a 19x19 matrix
    m = StreamSegMetrics(16)
    m.reset()
    assert m.confusion_matrix.shape == (19, 19)
    labels = np.array([[0, 16, 255]])  # 255 must be masked out
    preds = np.array([[0, 16, 3]])
    m.update(labels, preds)
    assert m.confusion_matrix.sum() == 2
    res = m.get_results()
    # classes 0 and 16 perfect, others absent (nan) -> mean IoU 1.0
    assert res["Mean IoU"] == 1.0
    assert res["Overall Acc"] == 1.0


def test_confusion_matrix_update_matches_stream_metrics():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 20, size=(2, 33, 47))
    labels[labels == 19] = 255
    preds = rng.integers(0, 19, size=(2, 33, 47))

    m = StreamSegMetrics(19)
    m.reset()
    m.update(labels, preds)

    # float32 counts: exact for the ~3k pixels here (and x64 is off by
    # default, so requesting float64 would only emit a truncation warning)
    hist = jnp.zeros((19, 19), jnp.float32)
    for lt, lp in zip(labels, preds):
        hist = confusion_matrix_update(hist, jnp.asarray(lt), jnp.asarray(lp), 19)
    np.testing.assert_allclose(np.asarray(hist), m.confusion_matrix)


def test_stream_metrics_results_match_manual():
    m = StreamSegMetrics(19)
    m.reset()
    labels = np.array([[0, 0, 1, 1]])
    preds = np.array([[0, 1, 1, 1]])
    m.update(labels, preds)
    res = m.get_results()
    assert res["Overall Acc"] == 0.75
    # IoU: class0 = 1/2, class1 = 2/3
    assert np.isclose(res["Mean IoU"], (0.5 + 2 / 3) / 2)


def test_stream_metrics_voc_21_classes_no_overflow():
    """The reference's hard-coded 19 crashes on VOC (pred > 18 overflows the
    19x19 bincount reshape); we use max(n_classes, 19)."""
    m = StreamSegMetrics(21)
    m.reset()
    labels = np.array([[0, 20, 5]])
    preds = np.array([[20, 20, 5]])
    m.update(labels, preds)
    res = m.get_results()
    assert m.confusion_matrix.shape == (21, 21)
    assert res["Overall Acc"] == pytest.approx(2 / 3)


def test_root_package_exposes_subpackages():
    import open_world_semantic_segmentation_tpu as owss

    for name in ("core", "data", "fewshot", "metrics", "models", "openset",
                 "ops", "parallel", "train", "utils"):
        assert hasattr(owss, name)
    assert owss.__version__


def test_dtype_policy():
    import jax.numpy as jnp
    from open_world_semantic_segmentation_tpu.core import Policy

    assert Policy.fast().compute_dtype == jnp.bfloat16
    p = Policy.parity()
    assert p.compute_dtype == jnp.float32
    import jax
    assert jax.config.jax_default_matmul_precision == "highest"
