"""Shift+matmul formulation for large-dilation 3x3 convolutions.

Motivation (trace-measured, tools/analyze_trace.py on the DeepLab OS16
1024x2048 eval): XLA's native lowering of the ASPP dilated 3x3 convs
(rates 6/12/18 over a 64x128x2048 map) costs ~2.5 ms each — ~27% of the
forward — because the huge dilation defeats its conv tiling. A dilated
3x3 conv with symmetric zero padding d is EXACTLY the sum of nine
d-shifted 1x1 convs:

    y[h, w] = sum_{i,j in {-1,0,1}} x[h + i*d, w + j*d] @ W[i+1, j+1]

Nine shifted (zero-fill) views feed nine plain MXU matmuls accumulated in
f32 — no windowing, perfect tiling. Numerics match the native conv up to
bf16 partial-sum rounding (f32 accumulation per term; the native conv
accumulates all 9*Cin terms in one f32 chain).

DEFAULT since round 4 for eligible convs (3x3, stride 1, ungrouped,
d >= 6, symmetric pad d): combined with the concat-free ASPP projection
(models/deeplab.py ASPPProject) it lifts the DeepLab OS16 1024x2048 eval
from 51 to 61 imgs/sec on v5e — the win only appears when BOTH are
active (the 1280-ch concat otherwise re-imposes the bad layout; round-3
measured shift-with-concat at no gain). ``OWSS_DILATED_IMPL=native``
opts out; ConvBN routes eligible convs automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift2d(x, sy: int, sx: int):
    """out[h, w] = x[h - sy, w - sx], zero outside (NHWC)."""
    if sy == 0 and sx == 0:
        return x
    _, h, w, _ = x.shape
    x = jnp.pad(x, ((0, 0), (max(sy, 0), max(-sy, 0)),
                    (max(sx, 0), max(-sx, 0)), (0, 0)))
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(x, max(-sy, 0), h, axis=1),
        max(-sx, 0), w, axis=2)


def dilated_conv3x3_shift(x, kernel, dilation):
    """3x3 conv, stride 1, symmetric padding == dilation, via 9 shifted
    matmuls. ``kernel`` is HWIO (3, 3, Cin, Cout); output dtype == x dtype,
    accumulation f32."""
    dy, dx = int(dilation[0]), int(dilation[1])
    acc = None
    for i in range(3):
        for j in range(3):
            shifted = _shift2d(x, -(i - 1) * dy, -(j - 1) * dx)
            term = jax.lax.dot_general(
                shifted, kernel[i, j],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)
