"""Native dense-CRF mean-field tests (vs a direct numpy oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.openset.crf import (
    gaussian_crf,
    gaussian_crf_conf,
    _gauss_kernel,
)

pytestmark = pytest.mark.e2e


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


def _numpy_dense_bilateral_meanfield(probs, sxy, schan, compat, iters):
    """BRUTE-FORCE oracle: the full N x N bilateral kernel with the EXACT
    exponential range term (no low-rank expansion, no separable blur),
    same symmetric-normalized Potts update. The update is invariant to the
    kernel's overall scale, so the unnormalized exp(-0.5 d2) kernel is
    directly comparable with the implementation's sum-1 spatial taps."""
    h, w, k = probs.shape
    n = h * w
    ys, xs = np.mgrid[0:h, 0:w]
    pos = np.stack([ys.ravel() / sxy, xs.ravel() / sxy], -1)
    s = (probs / schan).reshape(n, k)
    f = np.concatenate([pos, s], axis=1)
    d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
    kern = np.exp(-0.5 * d2)
    inv = 1.0 / np.sqrt(kern.sum(1))
    log_unary = np.log(np.maximum(probs, 1e-20)).reshape(n, k)
    q = probs.reshape(n, k).copy()
    for _ in range(iters):
        msg = (kern @ (q * inv[:, None])) * inv[:, None]
        z = log_unary + compat * msg
        z -= z.max(-1, keepdims=True)
        e = np.exp(z)
        q = e / e.sum(-1, keepdims=True)
    return q.reshape(h, w, k)


@pytest.mark.parametrize("schan,atol", [(13.0, 1e-3), (4.0, 5e-3)])
def test_bilateral_crf_matches_dense_oracle(schan, atol):
    """schan=13 is the reference's parameterization
    (eval_ood_traditional.py:482); schan=4 strengthens the range term ~20x
    so the test fails if the score-feature kernel is dropped or wrong."""
    from open_world_semantic_segmentation_tpu.openset.crf import (
        bilateral_crf,
    )

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((18, 22, 4)).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    # image smaller than the 3.5-sigma truncation radius -> the separable
    # truncated blur is exact, isolating the low-rank range expansion
    got = np.asarray(bilateral_crf(jnp.asarray(probs), sxy=10.0,
                                   schan=schan, compat=10.0, iters=5))
    want = _numpy_dense_bilateral_meanfield(probs, 10.0, schan, 10.0, 5)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def test_bilateral_range_term_matters():
    """The dense oracle must be distinguishable from a pure spatial
    gaussian at the assertion tolerance — otherwise the parametrized
    parity test could not catch a dropped range term."""
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((18, 22, 4)).astype(np.float32) * 2
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    with_range = _numpy_dense_bilateral_meanfield(probs, 10.0, 4.0, 10.0, 5)
    no_range = _numpy_dense_bilateral_meanfield(probs, 10.0, 1e9, 10.0, 5)
    # 4e-2 measured: ~8x the 5e-3 atol of the schan=4 parity assertion
    assert np.abs(with_range - no_range).max() > 2e-2


def test_bilateral_crf_conf_via_compute_conf():
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        compute_conf,
    )

    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.standard_normal((16, 20, 5)).astype(np.float32))
    conf = np.asarray(compute_conf(scores, "crf"))
    assert conf.shape == (16, 20)
    assert np.isfinite(conf).all()
    assert conf.min() >= 0.0 and conf.max() <= 1.0 + 1e-6
