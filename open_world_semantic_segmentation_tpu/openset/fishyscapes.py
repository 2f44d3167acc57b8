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
        return dissum_conf(scores)  # already higher = anomalous

    def estimator(image) -> np.ndarray:
        arr = np.asarray(image).astype(np.float32) / 255.0
        arr = (arr - mean) / std
        return np.asarray(fwd(variables, jnp.asarray(arr[None])))

    return estimator


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
