"""Bilinear resize with exact PyTorch ``align_corners=False`` semantics.

The reference upsamples logits/features with
``nn.functional.interpolate(mode='bilinear', align_corners=False)`` everywhere
(anomaly/models/models.py:660, DeepLabV3Plus-Pytorch/network/utils.py:52);
argmax boundaries — and therefore mIoU and every OOD metric — depend on this
exact sampling grid, so we reproduce it rather than using ``jax.image.resize``
(whose downsampling path applies an anti-aliasing triangle filter torch does
not).

Torch's source grid for align_corners=False:
    src = max(0, (dst + 0.5) * (in_size / out_size) - 0.5)
    lo  = floor(src); hi = min(lo + 1, in_size - 1); w_hi = src - lo

Shapes are static under jit, so the gather indices and lerp weights are
precomputed with numpy at trace time and folded into the program as
constants. The op is separable: a height pass then a width pass, each a pair
of gathers + a lerp — fully fusable by XLA. Layout is NHWC (TPU-native).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _axis_weights(in_size: int, out_size: int):
    """(lo_idx, hi_idx, hi_weight) numpy arrays for one axis."""
    if in_size == out_size:
        return None
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    src = np.maximum(src, 0.0)
    lo = np.floor(src).astype(np.int32)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = (src - lo).astype(np.float32)
    return lo, hi, w_hi


def _resize_axis(x, out_size: int, axis: int):
    in_size = x.shape[axis]
    aw = _axis_weights(in_size, out_size)
    if aw is None:
        return x
    lo, hi, w_hi = aw
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w_hi).reshape(shape).astype(x.dtype)
    return x_lo * (1 - w) + x_hi * w


def bilinear_resize(x, size, *, channel_last: bool = True):
    """Resize ``x`` (NHWC or HWC if channel_last, else NCHW/CHW) to ``size``.

    ``size`` is (H_out, W_out). Matches
    ``torch.nn.functional.interpolate(..., mode='bilinear',
    align_corners=False)`` exactly (given the same dtype).

    Set ``OWSS_RESIZE_IMPL=mxu`` to route NHWC resizes through the
    interpolation-matmul formulation (same sampling grid, systolic-array
    execution) — identical results to ~1e-6, sometimes faster for the large
    logit upsamples. Read at TRACE time, validated — see core/flags.py.
    """
    from ..core.flags import dataflow_flag

    if dataflow_flag("OWSS_RESIZE_IMPL") == "mxu" and channel_last \
            and x.ndim >= 3:
        return bilinear_resize_mxu(x, size)
    h_out, w_out = int(size[0]), int(size[1])
    if channel_last:
        h_ax = x.ndim - 3
        w_ax = x.ndim - 2
    else:
        h_ax = x.ndim - 2
        w_ax = x.ndim - 1
    x = _resize_axis(x, h_out, h_ax)
    x = _resize_axis(x, w_out, w_ax)
    return x


def resize_like_torch(x, size):
    """Alias for NHWC bilinear resize (reference-parity entry point)."""
    return bilinear_resize(x, size, channel_last=True)


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int):
    """Dense (out, in) interpolation matrix for one axis (2 nonzeros/row)."""
    aw = _axis_weights(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    if aw is None:
        np.fill_diagonal(m, 1.0)
        return m
    lo, hi, w_hi = aw
    rows = np.arange(out_size)
    # hi may equal lo at the border; add into place
    np.add.at(m, (rows, lo), 1.0 - w_hi)
    np.add.at(m, (rows, hi), w_hi)
    return m


def bilinear_resize_mxu(x, size, *, precision=None):
    """NHWC bilinear resize as two interpolation matmuls (MXU path).

    Identical sampling grid to :func:`bilinear_resize` (torch
    align_corners=False), but expressed as ``W_h @ x @ W_w^T`` so the TPU's
    systolic array does the work instead of gathers — the faster choice for
    the big logit upsamples (e.g. 90x160 -> 720x1280 x K). Pass
    ``precision=lax.Precision.HIGHEST`` for fp32 parity; default lets the
    MXU run bf16.
    """
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    wh = jnp.asarray(_interp_matrix(h_in, h_out))
    ww = jnp.asarray(_interp_matrix(w_in, w_out))
    # x: (..., H, W, C)
    y = jnp.einsum("oh,...hwc->...owc", wh, x, precision=precision)
    return jnp.einsum("pw,...owc->...opc", ww, y, precision=precision)
