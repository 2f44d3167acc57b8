"""Native dense-CRF mean-field tests (vs a direct numpy oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.openset.crf import (
    gaussian_crf,
    gaussian_crf_conf,
    _gauss_kernel,
)


def _numpy_meanfield(probs, sxy, compat, iters):
    """Direct (non-separable per-axis) oracle of the same update rule."""
    from scipy.ndimage import gaussian_filter1d  # scipy ships with sklearn

    def blur(x):
        x = gaussian_filter1d(x, sxy, axis=0, mode="constant", truncate=3.5)
        return gaussian_filter1d(x, sxy, axis=1, mode="constant",
                                 truncate=3.5)

    log_unary = np.log(np.maximum(probs, 1e-20))
    inv_sqrt_m = 1.0 / np.sqrt(np.maximum(
        blur(np.ones(probs.shape[:2] + (1,), probs.dtype)), 1e-12))
    q = probs.copy()
    for _ in range(iters):
        msg = blur(q * inv_sqrt_m) * inv_sqrt_m
        pairwise = compat * msg
        z = log_unary + pairwise
        z -= z.max(-1, keepdims=True)
        e = np.exp(z)
        q = e / e.sum(-1, keepdims=True)
    return q


@pytest.mark.parametrize("iters", [1, 5])
def test_gaussian_crf_matches_numpy_meanfield(iters):
    pytest.importorskip("scipy")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((24, 30, 5)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    got = np.asarray(gaussian_crf(jnp.asarray(probs), 3.0, 3.0, iters))
    want = _numpy_meanfield(probs, 3.0, 3.0, iters)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_gaussian_crf_sharpens_noisy_labels():
    """A noisy two-region image should be denoised toward the majority."""
    rng = np.random.default_rng(1)
    probs = np.full((32, 32, 2), 0.5, np.float32)
    # left half favors class 0, right half class 1, with salt noise
    probs[:, :16, 0], probs[:, :16, 1] = 0.8, 0.2
    probs[:, 16:, 0], probs[:, 16:, 1] = 0.2, 0.8
    noise = rng.random((32, 32)) < 0.1
    probs[noise] = probs[noise][:, ::-1]
    conf, pred = gaussian_crf_conf(jnp.asarray(probs), iters=10)
    pred = np.asarray(pred)
    assert (pred[:, :14] == 0).mean() > 0.97
    assert (pred[:, 18:] == 1).mean() > 0.97
    assert np.asarray(conf).min() >= 0.0


def test_kernel_normalized():
    k, r = _gauss_kernel(3.0)
    assert abs(k.sum() - 1.0) < 1e-6
    assert len(k) == 2 * r + 1
