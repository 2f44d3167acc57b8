"""Parity tests for ops vs PyTorch CPU reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from open_world_semantic_segmentation_tpu.ops import (
    bilinear_resize,
    adaptive_avg_pool,
    max_pool_3x3_s2_p1,
    distance_logits,
    one_hot_center_logits,
    prototype_distance,
)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((12, 17), (90, 160)),     # upsample, non-integer ratio
    ((45, 80), (720, 1280)),   # the StreetHazards eval upsample ratio
    ((33, 44), (16, 23)),      # downsample (torch does not antialias)
    ((8, 8), (8, 8)),          # identity
    ((1, 1), (7, 5)),          # degenerate
])
def test_bilinear_resize_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), out_hw))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,scale", [
    ((24, 24), 1), ((24, 24), 2), ((24, 24), 3), ((24, 24), 6),
    ((37, 53), 6),   # uneven bins (8 does not divide 37)
    ((90, 160), 3),  # StreetHazards conv5 size at scale 720p/8
    ((5, 7), (2, 3)),
])
def test_adaptive_avg_pool_matches_torch(in_hw, scale):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 5)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), scale))
    want = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("in_hw", [(112, 112), (113, 115), (90, 160)])
def test_maxpool_matches_torch(in_hw):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, *in_hw, 4)).astype(np.float32)
    got = np.asarray(max_pool_3x3_s2_p1(jnp.asarray(x)))
    want = F.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, stride=2, padding=1
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def _naive_distance_logits(x, centers):
    # the reference's broadcast formulation (models.py:645-651)
    diff = x[..., None, :] - centers  # (..., K, C)
    return -np.sum(diff ** 2, axis=-1)


def test_distance_logits_matches_naive_broadcast():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 11, 13)).astype(np.float32)
    centers = rng.standard_normal((13, 13)).astype(np.float32)
    got = np.asarray(distance_logits(jnp.asarray(x), jnp.asarray(centers)))
    want = _naive_distance_logits(x, centers)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_one_hot_center_logits_equals_general_form():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 8, 8, 17)).astype(np.float32)
    centers = 3.0 * np.eye(17, dtype=np.float32)
    got = np.asarray(one_hot_center_logits(jnp.asarray(x), 3.0))
    want = _naive_distance_logits(x, centers)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_prototype_distance_matches_numpy():
    rng = np.random.default_rng(5)
    f = rng.standard_normal((6, 7, 16)).astype(np.float32)
    proto = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(prototype_distance(jnp.asarray(f), jnp.asarray(proto)))
    want = -np.sum((f - proto) ** 2, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((12, 17), (90, 160)), ((45, 80), (720, 1280)), ((33, 44), (16, 23)),
])
def test_bilinear_resize_mxu_matches_gather(in_hw, out_hw):
    import jax.lax as lax
    from open_world_semantic_segmentation_tpu.ops.resize import (
        bilinear_resize_mxu,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, *in_hw, 5)).astype(np.float32)
    ref = np.asarray(bilinear_resize(jnp.asarray(x), out_hw))
    got = np.asarray(bilinear_resize_mxu(
        jnp.asarray(x), out_hw, precision=lax.Precision.HIGHEST))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kh,p,cin", [(7, 3, 3), (3, 1, 3), (7, 3, 4)])
def test_conv_stride2_s2d_matches_native(kh, p, cin):
    """Space-to-depth stem reparam (ops/stem.py) == lax stride-2 conv —
    exact up to accumulation-order rounding. Covers both reference stems
    (torchvision 7x7/2 pad 3, CSAIL deep-stem 3x3/2 pad 1)."""
    import jax
    from open_world_semantic_segmentation_tpu.ops.stem import (
        conv_stride2_s2d)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 96, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kh, kh, cin, 32)) * 0.1,
                    jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_stride2_s2d(x, k, p)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stem_impl_flag_model_level(monkeypatch):
    """ResNet stem through OWSS_STEM_IMPL=s2d (opt-in) vs native (the
    default): same features downstream."""
    import jax
    from open_world_semantic_segmentation_tpu.models.resnet import resnet18

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, 96, 3)), jnp.float32)
    model = resnet18(stem="7x7", output_stride=16)
    v = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("OWSS_STEM_IMPL", "native")
    outs_native = model.apply(v, x)
    monkeypatch.setenv("OWSS_STEM_IMPL", "s2d")
    outs_s2d = model.apply(v, x)
    for a, b in zip(outs_s2d, outs_native):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
