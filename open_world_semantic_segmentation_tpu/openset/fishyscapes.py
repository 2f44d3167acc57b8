"""Fishyscapes Lost&Found benchmark adapter (test_eva.py parity).

The reference wraps its model as an ``estimator(image) -> anomaly map``
callable for the ``bdlb`` FishyscapesLAF benchmark (test_eva.py:283-310,
436-442). ``make_estimator`` produces the equivalent callable from any of
our models; ``run_bdlb`` feeds it to bdlb when that package is installed
(it is not part of this image — the adapter degrades to a clear error).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_estimator(model, variables, *, method: str = "dissum",
                   mean=(0.485, 0.456, 0.406),
                   std=(0.229, 0.224, 0.225)) -> Callable:
    """uint8 HWC image -> float32 HW anomaly score map (higher = anomalous).

    The reference uses softmax entropy (test_eva.py:292-303); ``method``
    selects entropy / msp / dissum over our scoring kernels.
    """
    from .scoring import msp_conf, dissum_conf

    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    @jax.jit
    def fwd(variables, image):
        out = model.apply(variables, image)
        if isinstance(out, dict):
            scores = out["scores"][0]
        elif isinstance(out, tuple):
            scores = out[0][0]
        else:
            scores = out[0]
        if method == "entropy":
            p = jax.nn.softmax(scores, axis=-1)
            return -jnp.sum(p * jnp.log(p + 1e-12), axis=-1)
        if method == "msp":
            return 1.0 - msp_conf(scores)
        # dissum_conf follows the package convention LOWER = more
        # anomalous (in-distribution pixels are FAR from the 12 wrong
        # prototypes, so their distance sum is larger); the estimator
        # contract is higher = anomalous -> negate
        return -dissum_conf(scores)

    def estimator(image) -> np.ndarray:
        arr = np.asarray(image).astype(np.float32) / 255.0
        arr = (arr - mean) / std
        return np.asarray(fwd(variables, jnp.asarray(arr[None])))

    return estimator


def run_native(estimator, root, odgt_list, *, anomaly_id: int = 1,
               min_label: int = 0, max_images=None):
    """bdlb-free LostAndFound evaluation (Fishyscapes protocol).

    Feeds odgt-listed images (``cli/make_odgt.py laf``) through
    ``estimator`` and computes AP + AUROC over the POOLED pixels of the
    whole set — the Fishyscapes definition (bdlb pools pixels; the
    reference's per-image means in eval_ood_traditional are a different
    statistic). Labels follow the odgt convention (segm_transform's -1
    shift): pixels < ``min_label`` are void/ignored, ``anomaly_id`` marks
    the anomaly (LAF: raw labelId 2 = lost cargo -> 1 after the shift).

    Returns ``{"AP": float, "AUROC": float, "FPR95": float,
    "n_images": int}``. Pixel pools are float32/bool — budget ~5 bytes
    per pixel (a 2MP image is ~10 MB); use ``max_images`` on small hosts.
    """
    import json
    import os

    from PIL import Image as PILImage

    from ..metrics.anom import get_measures

    if isinstance(odgt_list, str):
        with open(odgt_list) as f:
            first = f.read(1)
            f.seek(0)
            records = (json.load(f) if first == "[" else
                       [json.loads(line) for line in f if line.strip()])
    else:
        records = list(odgt_list)
    if max_images is not None:
        records = records[:max_images]

    score_pool, label_pool = [], []
    for rec in records:
        img = np.asarray(PILImage.open(
            os.path.join(root, rec["fpath_img"])).convert("RGB"))
        segm = np.asarray(PILImage.open(
            os.path.join(root, rec["fpath_segm"])), dtype=np.int32) - 1
        score = np.asarray(estimator(img))
        if score.ndim == 3:
            score = score[0]
        if score.shape != segm.shape:
            # estimator ran at model resolution; bring the score map to
            # label resolution (bilinear, like the reference's upsample)
            score = np.asarray(PILImage.fromarray(
                score.astype(np.float32), mode="F").resize(
                (segm.shape[1], segm.shape[0]), PILImage.BILINEAR))
        valid = segm >= min_label
        score_pool.append(score[valid].astype(np.float32))
        label_pool.append(segm[valid] == anomaly_id)

    scores = np.concatenate(score_pool)
    labels = np.concatenate(label_pool)
    auroc, aupr, fpr = get_measures(scores[labels], scores[~labels])
    return {"AP": float(aupr), "AUROC": float(auroc), "FPR95": float(fpr),
            "n_images": len(records)}


def run_bdlb(estimator, download_dir=None):
    try:
        import bdlb
    except ImportError as e:
        raise RuntimeError(
            "the Fishyscapes harness needs the external 'bdlb' package "
            "(not bundled; see fishyscapes.com)") from e
    fs = bdlb.load(benchmark="fishyscapes")
    data = fs.get_dataset("LostAndFound", download_dir=download_dir) \
        if download_dir else fs.get_dataset("LostAndFound")
    import tensorflow as tf  # bdlb dependency

    def tf_estimator(image):
        return tf.convert_to_tensor(estimator(image.numpy()))

    return fs.evaluate(tf_estimator, data)
