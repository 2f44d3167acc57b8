"""PPM fuse conv without materializing the 4096-channel concat.

The reference's PPM head concatenates conv5 with four bilinearly-upsampled
pooled branches and runs one 3x3 conv over the 4096-channel result
(anomaly/models/models.py:543-560: ppm_conv -> cat -> conv_last[0]).  On
TPU that dataflow is wasteful twice over:

- the concat materializes a (H, W, 4096) copy in HBM that exists only to
  feed the conv (the round-3 xplane trace showed the copy feeding the five
  per-scale fuse convs, the top device ops at ~54% MXU);
- HALF the conv FLOPs (4 x 512 of 4096 input channels) are spent
  convolving maps that are bilinear upsamples of tiny (k x k, k <= 6)
  pooled grids — images with almost no spatial information.

Because conv, bilinear upsample, and concat are all linear, the fuse conv
splits exactly:

    conv3x3(cat(c5, U p_1, ..., U p_S)) =
        conv3x3(c5, K[:, :, :C5]) + sum_s T_s(p_s, K[:, :, slice_s])

and each pooled term T_s commutes into pooled resolution.  With U_h/U_w
the (H x k)/(W x k) interpolation matrices of the SAME sampling grid as
ops/resize.py (torch align_corners=False), and tap weights K[di, dj]:

    T_s[i, j] = sum_{di, dj} (U p_s)[i + di, j + dj] @ K[di, dj]
              = sum_{dj} ( sum_{di} S_di(U_h) @ (p_s @ K[di, dj]) )
                         @ S_dj(U_w)^T

where S_d(U) shifts U's rows by d and zeroes rows that fall outside the
image — which IS the conv's zero padding, so borders are exact.  The
per-branch cost drops from 2*H*W*9*512*512 FLOPs (~42 GF at 71x125) to
three tiny einsums (~0.3 GF), all MXU-shaped.  Measured end to end this
takes the flagship fuse stage from ~10 ms to ~5 ms per image (see
docs/DESIGN.md round-3 notes).

Numerics: identical math up to float reassociation; the parity suites run
green with this path as the default (the torch-oracle comparisons have
1e-4-level tolerances; exactness vs the materialized path is additionally
tested at HIGHEST precision in tests/test_ppm_fuse.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .resize import _interp_matrix


@functools.lru_cache(maxsize=None)
def _shifted_interp(in_size: int, out_size: int):
    """(3, out, in) f32: interpolation matrix with rows shifted by
    d in (-1, 0, +1); out-of-range rows are zero (conv zero padding)."""
    base = _interp_matrix(in_size, out_size)
    out = np.zeros((3, out_size, in_size), np.float32)
    out[1] = base
    out[0, : out_size - 1] = base[1:]   # d=+1: row i reads base row i+1
    out[2, 1:] = base[: out_size - 1]   # d=-1: row i reads base row i-1
    return out


def upsampled_conv3x3(p, kernel, out_size, *, dtype=None):
    """conv3x3(bilinear_resize(p, out_size), kernel), computed at pooled
    resolution.

    p: (N, kh, kw, C) (or unbatched (kh, kw, C)) pooled map; kernel:
    (3, 3, C, Cout); returns (N, H, W, Cout) f32 — exactly the 3x3
    same-padding conv (torch align_corners=False upsample) of the
    materialized path.  The batch dim stays a pure parallel axis of every
    einsum, so per-item results are identical across batch sizes (the
    device-metrics suite asserts batched == per-item dispatch).
    """
    h, w = int(out_size[0]), int(out_size[1])
    unbatched = p.ndim == 3
    if unbatched:
        p = p[None]
    kh, kw, c = p.shape[1:]
    cdt = dtype or p.dtype
    # tap index 0 of _shifted_interp is d=+1 == kernel row/col index 2
    # (kernel[di+1, dj+1] multiplies input pixel (i+di, j+dj))
    uh = jnp.asarray(_shifted_interp(kh, h))    # (3, H, kh)
    uw = jnp.asarray(_shifted_interp(kw, w))    # (3, W, kw)
    kk = kernel[::-1, ::-1].astype(cdt)         # tap t -> shift index
    # r[n, i, j, a, b, d] = p[n, a, b, :] @ kernel_tap[i, j]
    r = jnp.einsum("nabc,ijcd->nijabd", p.astype(cdt), kk,
                   preferred_element_type=jnp.float32)
    # rows: z[n, j, h, b, d] = sum_{i, a} uh[i, h, a] r[n, i, j, a, b, d]
    z = jnp.einsum("iha,nijabd->njhbd", uh.astype(cdt), r.astype(cdt),
                   preferred_element_type=jnp.float32)
    # cols: out[n, h, w, d] = sum_{j, b} uw[j, w, b] z[n, j, h, b, d]
    out = jnp.einsum("jwb,njhbd->nhwd", uw.astype(cdt), z.astype(cdt),
                     preferred_element_type=jnp.float32)
    return out[0] if unbatched else out


@jax.custom_vjp
def _conv3x3_f32out(x, w):
    """3x3 same-padding NHWC conv with f32 accumulation output.

    jax 0.9's conv transpose rule cannot mix the f32 cotangent of a
    ``preferred_element_type=f32`` conv with bf16 operands (repro: grad
    of such a conv raises "requires arguments to have the same dtypes");
    dot_general handles the same situation by computing gradients in the
    operand dtype. This custom VJP gives the conv the dot_general
    convention: exact f32-accumulate forward, gradients in the operand
    dtypes (for f32 operands it is bit-identical to jax's own autodiff —
    asserted in tests/test_ppm_fuse.py).
    """
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _conv3x3_fwd(x, w):
    return _conv3x3_f32out(x, w), (x, w)


def _conv3x3_bwd(res, g):
    x, w = res
    gc = g.astype(jnp.result_type(x.dtype, w.dtype))
    # dL/dx = full correlation with the kernel flipped and io swapped
    wt = w[::-1, ::-1].swapaxes(2, 3).astype(gc.dtype)
    gx = jax.lax.conv_general_dilated(
        gc, wt, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # dL/dw[di,dj,ci,co] = sum_{n,i,j} x[n,i+di-1,j+dj-1,ci] g[n,i,j,co]:
    # a conv with batch and feature roles swapped (kernel = the cotangent)
    gw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0).astype(gc.dtype),   # (Cin, H, W, N)
        gc.transpose(1, 2, 0, 3),                    # (H, W, N, Cout)
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)          # (Cin, 3, 3, Cout)
    return gx, gw.transpose(1, 2, 0, 3).astype(w.dtype)


_conv3x3_f32out.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def ppm_fuse_conv(conv5, pools, kernel, *, dtype=None):
    """3x3 same-padding conv of cat([conv5] + upsampled pools) without the
    concat.

    conv5: (N, H, W, C5); pools: list of (N, kh, kw, Cp) pooled maps (at
    their pyramid resolutions); kernel: (3, 3, C5 + sum Cp, Cout) — the
    unchanged ConvBN parameter, sliced per branch in-program (the slices
    are loop-invariant; XLA hoists them out of image scans).
    Returns (N, H, W, Cout) f32.
    """
    n, h, w, c5 = conv5.shape
    cdt = dtype or conv5.dtype
    y = _conv3x3_f32out(conv5.astype(cdt), kernel[:, :, :c5].astype(cdt))
    off = c5
    for p in pools:
        cp = p.shape[-1]
        ks = kernel[:, :, off:off + cp]
        y = y + upsampled_conv3x3(p, ks, (h, w), dtype=cdt)
        off += cp
    return y
