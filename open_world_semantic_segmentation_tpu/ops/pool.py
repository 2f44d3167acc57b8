"""Pooling ops with PyTorch-parity bin edges, NHWC layout.

``adaptive_avg_pool`` reproduces ``nn.AdaptiveAvgPool2d``: output bin i over
an axis of size N with S bins averages input rows [floor(i*N/S),
ceil((i+1)*N/S)). The PPM decoder pools conv5 (H/8 x W/8, arbitrary size) to
scales (1, 2, 3, 6) — bins are uneven whenever 8∤H, and parity here is what
keeps converted checkpoints bit-comparable.

Implementation: separable matmuls against trace-time-constant bin-average
matrices (S x N, entries 1/count inside each bin). Static shapes, MXU
execution, and — the property that matters under pjit — when the pooled
axis is sharded across a mesh, GSPMD lowers the contraction to a local
partial dot + all-reduce. (The previous cumsum + concat + gather
formulation made GSPMD emit all-to-alls for the PPM pooling of a
spatially-sharded conv5, which the CPU backend's rendezvous deadlocks on;
an integral image also buys nothing here since out_size <= 6.)
"""

from __future__ import annotations

import functools

import numpy as np
import jax.lax as lax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _bin_edges(in_size: int, out_size: int):
    i = np.arange(out_size, dtype=np.int64)
    starts = (i * in_size) // out_size
    ends = -((-(i + 1) * in_size) // out_size)  # ceil div
    return starts.astype(np.int32), ends.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _pool_matrix(in_size: int, out_size: int):
    """(out, in) f32: row i averages input rows [start_i, end_i)."""
    starts, ends = _bin_edges(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        m[i, s:e] = 1.0 / (e - s)
    return m


def _pool_axis(x, out_size: int, axis: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_pool_matrix(in_size, out_size), x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.einsum("...n,sn->...s", x, m,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.moveaxis(x, -1, axis)


def adaptive_avg_pool(x, output_size):
    """NHWC adaptive average pool to (S_h, S_w). Torch AdaptiveAvgPool2d parity."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    s_h, s_w = int(output_size[0]), int(output_size[1])
    h_ax, w_ax = x.ndim - 3, x.ndim - 2
    x = _pool_axis(x, s_h, h_ax)
    x = _pool_axis(x, s_w, w_ax)
    return x


def global_avg_pool(x, keepdims: bool = True):
    """Mean over spatial dims of NHWC."""
    return jnp.mean(x, axis=(x.ndim - 3, x.ndim - 2), keepdims=keepdims)


def max_pool_3x3_s2_p1(x):
    """3x3/stride-2 max pool with padding 1, NHWC — the ResNet stem pool.

    Torch pads with -inf implicitly (padding contributes nothing to max).
    """
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
