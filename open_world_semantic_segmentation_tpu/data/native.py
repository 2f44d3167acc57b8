"""ctypes binding for the native C++ host-preprocessing library.

``native/libimage_ops.so`` provides threaded PIL-parity resample+normalize.
The binding auto-builds the library with ``make`` on first use when a
compiler is available and falls back to PIL/numpy otherwise — callers use
:func:`resize_normalize` / :func:`resize_label` and get the fast path
transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimage_ops.so")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.resize_bilinear_normalize_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p]
    lib.resize_nearest_label.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.normalize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p,
                                 f32p, f32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize(img_u8: np.ndarray, size_hw: Tuple[int, int],
                     mean=IMAGENET_MEAN, std=IMAGENET_STD) -> np.ndarray:
    """uint8 HWC image -> PIL-BILINEAR-resized, normalized float32 HWC."""
    lib = _load()
    dh, dw = size_hw
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if lib is not None:
        out = np.empty((dh, dw, 3), np.float32)
        lib.resize_bilinear_normalize_u8(
            img_u8, img_u8.shape[0], img_u8.shape[1], out, dh, dw,
            np.ascontiguousarray(mean, np.float32),
            np.ascontiguousarray(std, np.float32))
        return out
    from PIL import Image

    pil = Image.fromarray(img_u8, "RGB").resize((dw, dh), Image.BILINEAR)
    arr = np.float32(np.array(pil)) / 255.0
    return (arr - mean) / std


def resize_label(lab_u8: np.ndarray, size_hw: Tuple[int, int],
                 offset: int = -1) -> np.ndarray:
    """uint8 HW label map -> PIL-NEAREST-resized int32 HW plus offset."""
    lib = _load()
    dh, dw = size_hw
    lab_u8 = np.ascontiguousarray(lab_u8, dtype=np.uint8)
    if lib is not None:
        out = np.empty((dh, dw), np.int32)
        lib.resize_nearest_label(lab_u8, lab_u8.shape[0], lab_u8.shape[1],
                                 out, dh, dw, offset)
        return out
    from PIL import Image

    pil = Image.fromarray(lab_u8, "L").resize((dw, dh), Image.NEAREST)
    return np.array(pil, dtype=np.int32) + offset


def normalize(img_u8: np.ndarray, mean=IMAGENET_MEAN,
              std=IMAGENET_STD) -> np.ndarray:
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    if lib is not None:
        h, w = img_u8.shape[:2]
        out = np.empty((h, w, 3), np.float32)
        lib.normalize_u8(img_u8, h, w, out,
                         np.ascontiguousarray(mean, np.float32),
                         np.ascontiguousarray(std, np.float32))
        return out
    return (np.float32(img_u8) / 255.0 - mean) / std
