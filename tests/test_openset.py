"""Scoring-map parity vs the reference's numpy math + e2e evaluator smoke."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.openset import (
    msp_conf,
    maxlogit_conf,
    dissum_conf,
    background_conf,
    knn_cosine_conf,
    normalize_01,
    coefficient_map,
    OODEvaluator,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


@pytest.fixture()
def scores():
    rng = np.random.default_rng(0)
    # distance-logit-like scores: negative, some very negative
    return (-rng.gamma(2.0, 60.0, size=(45, 80, 13))).astype(np.float32)


def test_msp_and_maxlogit(scores):
    got = np.asarray(msp_conf(jnp.asarray(scores)))
    want = _softmax(scores, -1).max(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    got = np.asarray(maxlogit_conf(jnp.asarray(scores)))
    np.testing.assert_allclose(got, scores.max(-1), rtol=1e-6)


def test_msp_exclude_back(scores):
    got = np.asarray(msp_conf(jnp.asarray(scores), exclude_back=True))
    want = _softmax(scores[..., 1:], -1).max(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dissum_reference_math(scores):
    # reference: dis_sum = -sum(scores); clip >=400 -> 400; minmax norm;
    # fused coefficient computed then OVERRIDDEN by conf = dis_sum (:450)
    dis = -scores.sum(-1)
    dis[dis >= 400] = 400
    with np.errstate(invalid="ignore"):  # constant map -> 0/0 is the oracle
        want = (dis - dis.min()) / (dis.max() - dis.min())
    got = np.asarray(dissum_conf(jnp.asarray(scores)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # fused variant equals the :447-448 formula
    prob = _softmax(scores, -1).max(-1)
    prob = (prob - prob.min()) / (prob.max() - prob.min())
    coeff = 1.0 / (1.0 + np.exp(50.0 * (want - 0.2)))
    want_fused = coeff * want + (1 - coeff) * prob
    got_fused = np.asarray(dissum_conf(jnp.asarray(scores), fused=True))
    np.testing.assert_allclose(got_fused, want_fused, rtol=1e-4, atol=1e-5)


def test_background_conf(scores):
    np.testing.assert_allclose(
        np.asarray(background_conf(jnp.asarray(scores))), scores[..., 0])


def _reference_knn(ft, neighbor_size=9):
    """Transliteration of eval_ood_traditional.py:511-530 (torch->numpy)."""
    c, h, w = ft.shape
    out = np.zeros((h, w), np.float32)

    def cos(a, b):
        na = np.sqrt((a * a).sum(0))
        nb = np.sqrt((b * b).sum(0))
        return (a * b).sum(0) / np.maximum(na * nb, 1e-8)

    for dh in range(1, neighbor_size):
        for dw in range(1, neighbor_size):
            s = np.zeros_like(ft)
            s[:, 0:h - dh, 0:w - dw] = ft[:, dh:h, dw:w]
            out += cos(ft, s)
            s = np.zeros_like(ft)
            s[:, dh:h, dw:w] = ft[:, 0:h - dh, 0:w - dw]
            out += cos(ft, s)
    return out


def test_knn_cosine_matches_reference():
    rng = np.random.default_rng(1)
    ft = rng.standard_normal((8, 12, 14)).astype(np.float32)  # H, W, C
    got = np.asarray(knn_cosine_conf(jnp.asarray(ft), neighbor_size=4))
    want = _reference_knn(ft.transpose(2, 0, 1), neighbor_size=4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_normalize_and_coefficient():
    x = np.array([1.0, 3.0, 5.0])
    np.testing.assert_allclose(np.asarray(normalize_01(jnp.asarray(x))),
                               [0, 0.5, 1.0])
    c = np.asarray(coefficient_map(jnp.asarray(x), 3.0))
    assert c[0] > 0.5 > c[2]


def test_evaluator_end_to_end(tmp_path):
    """Synthetic StreetHazards eval through model + evaluator + metrics."""
    from make_synthetic_data import make_streethazards
    import jax
    from open_world_semantic_segmentation_tpu.data import ValPipeline
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    root = make_streethazards(str(tmp_path / "sh"), n_val=2, h=48, w=64)
    pipe = ValPipeline(root, os.path.join(root, "val.odgt"),
                       img_sizes=(24, 32), img_max_size=80)

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 24, 32, 3)))
    ev = OODEvaluator(model, variables, num_class=13, method="dissum",
                      out_labels=(13,))
    result = ev.evaluate(pipe, progress=False)
    assert result["auroc"] is not None and 0.0 <= result["auroc"] <= 1.0
    assert result["class_iou"].shape == (13,)
    assert len(ev._compiled) == 1  # one pyramid shape-set -> one program


def test_evaluator_batched_matches_per_image(tmp_path):
    from make_synthetic_data import make_streethazards
    import jax
    from open_world_semantic_segmentation_tpu.data import ValPipeline
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    root = make_streethazards(str(tmp_path / "shb"), n_val=3, h=48, w=64)
    pipe = ValPipeline(root, os.path.join(root, "val.odgt"),
                       img_sizes=(24, 32), img_max_size=80)
    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 32, 3)))

    ev1 = OODEvaluator(model, variables, num_class=13, method="dissum")
    r1 = ev1.evaluate(pipe, progress=False)
    ev2 = OODEvaluator(model, variables, num_class=13, method="dissum")
    r2 = ev2.evaluate_batched(pipe, batch_size=2)

    # ~1e-6, not bitwise: the PPM fuse einsums (ops/ppm_fuse.py) tile
    # differently per batch size, so scores reassociate slightly
    assert r1["auroc"] == pytest.approx(r2["auroc"], abs=1e-5)
    assert r1["mean_iou"] == pytest.approx(r2["mean_iou"], abs=1e-5)
    assert r1["accuracy"] == pytest.approx(r2["accuracy"], abs=1e-5)


def test_evaluator_batched_mixed_sizes_matches_per_image(tmp_path):
    """Heterogeneous source sizes (3 distinct (h, w) -> 3 pyramid shape
    sets): evaluate_batched groups by shape signature and batches within
    each group instead of degrading to per-image dispatch; every per-image
    metric matches the plain per-image path (VERDICT r3 #5)."""
    from make_synthetic_data import make_streethazards_mixed
    import jax
    from open_world_semantic_segmentation_tpu.data import ValPipeline
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    root = make_streethazards_mixed(str(tmp_path / "shm"), n_per_size=2)

    def pipe():
        return ValPipeline(root, os.path.join(root, "val.odgt"),
                           img_sizes=(24, 32), img_max_size=80)

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 32, 3)))

    ev1 = OODEvaluator(model, variables, num_class=13, method="dissum")
    r1 = ev1.evaluate(pipe(), progress=False)
    ev2 = OODEvaluator(model, variables, num_class=13, method="dissum")
    r2 = ev2.evaluate_batched(pipe(), batch_size=2)

    # every dispatched batch is ONE shape group (scan programs only see
    # uniform shapes); group order != loader order, so compare the
    # per-image metric multisets — identical values, and the summary
    # means agree to summation-order rounding
    np.testing.assert_allclose(sorted(ev1.aurocs), sorted(ev2.aurocs),
                               atol=2e-6)
    np.testing.assert_allclose(sorted(ev1.fprs), sorted(ev2.fprs),
                               atol=2e-6)
    assert r1["auroc"] == pytest.approx(r2["auroc"], abs=1e-5)
    assert r1["mean_iou"] == pytest.approx(r2["mean_iou"], abs=1e-5)
    assert r1["accuracy"] == pytest.approx(r2["accuracy"], abs=1e-5)
    # one batched program per distinct shape signature (3 sizes), built on
    # top of one item program each
    batched_keys = [k for k in ev2._compiled if k[0] == "batched"]
    assert len(batched_keys) == 3
