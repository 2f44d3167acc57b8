"""Device-side OOD metrics vs the bit-parity host implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.metrics.anom import (
    eval_ood_measure,
)
from open_world_semantic_segmentation_tpu.metrics.anom_device import (
    ood_measures_from_maps,
)


def _compare(conf, seg, out_labels=(13,), atol=1e-5):
    want = eval_ood_measure(conf, seg, out_labels=out_labels)
    auroc, aupr, fpr, valid = ood_measures_from_maps(
        jnp.asarray(conf), jnp.asarray(seg), out_labels=out_labels)
    if want is None:
        assert not bool(valid)
        return
    assert bool(valid)
    np.testing.assert_allclose(
        [float(auroc), float(aupr), float(fpr)], list(want), atol=atol)


def test_device_metrics_random_maps():
    rng = np.random.default_rng(0)
    for _ in range(3):
        conf = rng.random((60, 80)).astype(np.float32)
        seg = rng.integers(0, 14, (60, 80)).astype(np.int32)
        _compare(conf, seg)


def test_device_metrics_tie_heavy():
    """Quantized conf maps (the clipped-dissum / msp>0.999 regime) create
    large tie blocks — the regime the boundary masking must get right."""
    rng = np.random.default_rng(1)
    conf = (rng.integers(0, 7, (48, 64)) / 7.0).astype(np.float32)
    seg = rng.integers(0, 14, (48, 64)).astype(np.int32)
    _compare(conf, seg)
    # extreme: nearly-constant conf
    conf2 = np.full((48, 64), 0.5, np.float32)
    conf2[:4] = 0.25
    _compare(conf2, seg)


def test_device_metrics_informative_scores():
    """Scores correlated with the anomaly label (high AUROC regime)."""
    rng = np.random.default_rng(2)
    seg = rng.integers(0, 14, (40, 50)).astype(np.int32)
    conf = rng.random((40, 50)).astype(np.float32) * 0.5
    conf[seg == 13] -= 0.3  # anomalies get low confidence
    _compare(conf, seg)
    res = eval_ood_measure(conf, seg)
    assert res[0] > 0.9  # sanity: the regime is actually informative


def test_device_metrics_single_class_invalid():
    rng = np.random.default_rng(3)
    conf = rng.random((16, 16)).astype(np.float32)
    seg = np.zeros((16, 16), np.int32)  # no OOD pixels
    _compare(conf, seg)
    seg13 = np.full((16, 16), 13, np.int32)  # only OOD pixels
    _compare(conf, seg13)


def test_device_metrics_multi_out_labels():
    rng = np.random.default_rng(4)
    conf = rng.random((30, 40)).astype(np.float32)
    seg = rng.integers(0, 20, (30, 40)).astype(np.int32)
    _compare(conf, seg, out_labels=(13, 19))


def test_device_metrics_vmappable():
    import jax

    rng = np.random.default_rng(5)
    confs = rng.random((3, 24, 32)).astype(np.float32)
    segs = rng.integers(0, 14, (3, 24, 32)).astype(np.int32)
    batched = jax.vmap(lambda c, s: ood_measures_from_maps(c, s))
    aurocs, auprs, fprs, valids = batched(jnp.asarray(confs),
                                          jnp.asarray(segs))
    for i in range(3):
        want = eval_ood_measure(confs[i], segs[i])
        np.testing.assert_allclose(
            [float(aurocs[i]), float(auprs[i]), float(fprs[i])],
            list(want), atol=1e-5)


def test_evaluator_device_metrics_matches_host(tmp_path):
    """OODEvaluator(device_metrics=True) reproduces the host path's
    summary on the same data/weights, for both per-image and batched
    evaluation (where the conf map never leaves the device)."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synthetic_data import make_streethazards

    from open_world_semantic_segmentation_tpu.data import ValPipeline
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset import OODEvaluator

    root = make_streethazards(str(tmp_path / "sh"), n_val=2, h=48, w=64)
    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 48, 64, 3), jnp.float32))

    def run(device_metrics, batched):
        pipeline = ValPipeline(root, f"{root}/val.odgt", img_sizes=(24, 32),
                               img_max_size=80)
        ev = OODEvaluator(model, variables, num_class=13, method="dissum",
                          out_labels=(13,), device_metrics=device_metrics)
        if batched:
            return ev.evaluate_batched(pipeline, batch_size=2)
        return ev.evaluate(pipeline, progress=False)

    host = run(False, False)
    for batched in (False, True):
        dev = run(True, batched)
        for k in ("auroc", "aupr", "fpr", "mean_iou", "accuracy"):
            np.testing.assert_allclose(dev[k], host[k], atol=2e-5,
                                       err_msg=f"{k} batched={batched}")


def test_device_pyramid_eval_close_to_host(tmp_path):
    """ValPipeline(device_pyramid=True): one uint8 image crosses the link
    and the pyramid is built in-program. Scores deviate from the PIL host
    resample only within resampling tolerance — mIoU/accuracy and OOD
    metrics must land close, and both batched/per-item paths must agree
    with each other to float-reassociation tolerance (the PPM fuse path's
    interpolation einsums tile differently per batch size, so agreement
    is ~1e-6, not bitwise as with the pure-conv dataflow)."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synthetic_data import make_streethazards

    from open_world_semantic_segmentation_tpu.data import ValPipeline
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset import OODEvaluator

    root = make_streethazards(str(tmp_path / "sh"), n_val=2, h=48, w=64)
    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 48, 64, 3), jnp.float32))

    def run(device_pyramid, batched):
        pipeline = ValPipeline(root, f"{root}/val.odgt", img_sizes=(24, 32),
                               img_max_size=80,
                               device_pyramid=device_pyramid)
        ev = OODEvaluator(model, variables, num_class=13, method="dissum",
                          out_labels=(13,), device_metrics=True)
        if batched:
            return ev.evaluate_batched(pipeline, batch_size=2)
        return ev.evaluate(pipeline, progress=False)

    host = run(False, False)
    dev_item = run(True, False)
    dev_batch = run(True, True)
    for k in ("auroc", "aupr", "fpr", "mean_iou", "accuracy"):
        np.testing.assert_allclose(dev_item[k], dev_batch[k], atol=1e-5,
                                   err_msg=k)
        # different resampler: close, not equal
        assert abs(dev_item[k] - host[k]) < 0.2, (k, dev_item[k], host[k])
