"""Native C++ image-ops parity vs PIL and numpy."""

import numpy as np
import pytest
from PIL import Image

from open_world_semantic_segmentation_tpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")


@pytest.mark.parametrize("src_hw,dst_hw", [
    ((72, 128), (304, 536)),   # upscale (eval pyramid shape)
    ((720, 1280), (304, 536)), # downscale with antialias support
    ((45, 67), (45, 67)),      # identity-size
])
def test_resize_normalize_matches_pil(lib_available, src_hw, dst_hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (*src_hw, 3), dtype=np.uint8)
    got = native.resize_normalize(img, dst_hw)

    pil = Image.fromarray(img, "RGB").resize(
        (dst_hw[1], dst_hw[0]), Image.BILINEAR)
    want = (np.float32(np.array(pil)) / 255.0 - native.IMAGENET_MEAN) \
        / native.IMAGENET_STD
    # PIL quantizes the intermediate to uint8 between passes; we keep float
    # precision, so allow 1-level (1/255) differences pre-normalization
    tol = (1.0 / 255.0) / native.IMAGENET_STD.min() + 1e-4
    assert np.abs(got - want).max() <= tol


@pytest.mark.parametrize("src_hw,dst_hw", [
    ((72, 128), (36, 64)), ((45, 67), (90, 134)), ((33, 57), (33, 57)),
])
def test_resize_label_matches_pil(lib_available, src_hw, dst_hw):
    rng = np.random.default_rng(1)
    lab = rng.integers(0, 20, src_hw, dtype=np.uint8)
    got = native.resize_label(lab, dst_hw, offset=-1)
    pil = Image.fromarray(lab, "L").resize((dst_hw[1], dst_hw[0]),
                                           Image.NEAREST)
    want = np.array(pil, dtype=np.int32) - 1
    np.testing.assert_array_equal(got, want)


def test_normalize_matches_numpy(lib_available):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    got = native.normalize(img)
    want = (np.float32(img) / 255.0 - native.IMAGENET_MEAN) \
        / native.IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fallback_path_without_lib(monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    img = np.zeros((20, 30, 3), np.uint8)
    out = native.resize_normalize(img, (10, 15))
    assert out.shape == (10, 15, 3)
    lab = native.resize_label(np.zeros((20, 30), np.uint8), (10, 15))
    assert lab.shape == (10, 15) and lab.dtype == np.int32
