"""Pallas TPU kernel: fused ResNet bottleneck block (inference).

The stride-8 dilated backbone of the flagship eval pipeline is
HBM-bandwidth-bound (docs/DESIGN.md): XLA runs each bottleneck as three
conv dispatches plus a skip-add, so every intermediate activation makes a
full HBM round trip.  This kernel computes the whole residual block

    relu( BN3(conv1x1( relu(BN2(conv3x3_d( relu(BN1(conv1x1(x)))))) )) + skip )

in one pass: the input tile is DMA'd to VMEM once, both 1x1 convs and the
nine taps of the (dilated) 3x3 run as MXU matmuls from VMEM, and only the
block output returns to HBM.  BatchNorm is algebraically folded into the
conv weights on the caller side (inference running stats), which XLA
hoists out of per-image scans as a loop-invariant — the fold itself costs
nothing per image (same hoist verified for the int8 prequant probes,
docs/DESIGN.md).

Reference behavior covered: torch ``Bottleneck.forward``
(/root/reference/anomaly/models/resnet.py:62-93 and
DeepLabV3Plus-Pytorch/network/backbone/resnet.py Bottleneck) — stride 1,
optional 1x1 downsample on the skip, square dilation on the middle conv.

Kernel design (see also ops/pallas_knn.py for the established idioms):

- **Grid over rows only, ring-buffered halo.**  TPU Pallas grids execute
  sequentially, so scratch persists across steps: each step DMAs only the
  ``tile_h`` NEW input rows and re-uses the previous step's bottom
  ``2*dilation`` rows via an in-VMEM shift — the 3x3 halo costs zero
  extra HBM reads (a plain halo'd window would re-read
  ``(tile_h+2d)/tile_h`` = 1.25-1.5x of the input).
- **Width stays whole, padded to the sublane tile.**  Arrays carry a
  lane-friendly padded width ``wp`` (multiple of the sublane tile, with
  >= ``dilation`` columns of slack).  The 3x3's column taps are
  ``pltpu.roll``s along the sublane axis (Mosaic supports rotations but
  not unaligned strided VMEM slices); values rolling in from the slack
  are zeros because the valid-region mask is applied to the conv1 output
  *before* rolling.  Slack columns of the *input* may hold garbage — the
  mask makes the kernel's own output slack exactly zero, which is what
  lets fused blocks chain with no repacking if a caller ever routes a
  whole stage through the kernel.
- **Row taps are free.** Slices along the leading (non-tiled) axis carry
  no alignment constraint, so the 3x3's row taps are plain dim-0 slices
  of the conv1-output ring.
- f32 accumulation across the nine 3x3 taps (matches XLA's in-MXU f32
  conv accumulator), bf16/f32 storage elsewhere per the compute dtype.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sublane(dtype) -> int:
    """Min sublane tile for a dtype (second-to-last dim granularity)."""
    return {2: 16, 4: 8}[jnp.dtype(dtype).itemsize]


def fold_convbn(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var,
                eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights: returns (w, b) f32.

    y = BN(conv(x, k)) == conv(x, k * g) + (beta - mean * g),
    g = scale / sqrt(var + eps); all in f32 (params are stored f32).
    """
    g = bn_scale / jnp.sqrt(bn_var + eps)
    w = conv_kernel * g  # (..., Cin, Cout) * (Cout,)
    b = bn_bias - bn_mean * g
    return w.astype(jnp.float32), b.astype(jnp.float32)


def _block_kernel(x_hbm, w1, b1, w2, b2, w3, b3, wd, bd, out_ref,
                  x_ring, y1_ring, dma_sem, *,
                  h, w, wp, d, tile_h, n_rows, has_down, acc_dtype):
    """One grid step: produce output rows [i*tile_h, i*tile_h + tile_h).

    x_ring:  (tile_h + 2d, wp, cin)  input rows [i*tile_h - d, ... + d)
    y1_ring: (tile_h + 2d, wp, cmid) conv1 output for the same rows
    Ring invariant: at entry, rows [0, 2d) of both rings hold the last 2d
    rows of the previous step's window (garbage at i == 0 — masked).
    """
    i = pl.program_id(0)
    rows = tile_h + 2 * d
    cin = x_ring.shape[-1]
    cmid = y1_ring.shape[-1]
    cdt = x_ring.dtype

    # ---- ring shift: previous window's last 2d rows become our first 2d.
    # x rows [0, d) are never read (the y1 ring carries the conv halo), so
    # only [d, 2d) shifts; y1 needs the full 2d (conv2's -d row tap).
    @pl.when(i > 0)
    def _():
        x_ring[d:2 * d] = x_ring[tile_h + d:tile_h + 2 * d]
        y1_ring[0:2 * d] = y1_ring[tile_h:tile_h + 2 * d]

    # top conv halo: rows [-d, 0) of the conceptual zero-padded input
    @pl.when(i == 0)
    def _():
        y1_ring[0:d] = jnp.zeros((d, wp, cmid), cdt)

    # ---- DMA the new input rows
    # step i's window covers global rows [i*tile_h - d, i*tile_h+tile_h+d);
    # the new rows are [prev_end, min(H, window_end)).  All sizes must be
    # static: branch on first/last step (sizes differ there).
    n_steps = pl.num_programs(0)

    def dma(dst_lo, src_lo_dyn, size):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(src_lo_dyn, size)],
            x_ring.at[pl.ds(dst_lo, size)], dma_sem)
        cp.start()
        cp.wait()

    first_size = min(h, tile_h + d)
    if n_rows == 1:
        dma(d, 0, first_size)
    else:
        @pl.when(i == 0)
        def _():
            dma(d, 0, first_size)

        # DMA sizes are static, so steps whose window would overrun the
        # array (at most the last two, since d < tile_h) get their own
        # statically-clamped branch; the uniform branch covers the rest.
        tail = [k for k in range(1, n_rows)
                if k * tile_h + tile_h + d > h]
        mid_hi = tail[0] if tail else n_rows

        @pl.when(jnp.logical_and(i > 0, i < mid_hi))
        def _():
            dma(2 * d, i * tile_h + d, tile_h)

        for k in tail:
            size_k = h - (k * tile_h + d)
            if size_k > 0:
                @pl.when(i == k)
                def _(k=k, size_k=size_k):
                    dma(2 * d, k * tile_h + d, size_k)

    # ---- conv1 (+BN+ReLU) on ring rows [d, d+tile_h+d): the tile_h new
    # center rows plus the bottom halo (rows [d, 2d) are recomputed
    # redundantly after a shift — cheaper than a dynamic slice start).
    # Masked to the valid image region so (a) the folded bias does not
    # leak into the conv2 zero-padding ring, (b) uninitialized slack
    # never propagates (where, not multiply: VMEM garbage may be NaN).
    new_n = tile_h + d  # rows beyond the image are masked below

    xw = x_ring[pl.ds(d, new_n)]                        # (new_n, wp, cin)
    y1 = jax.lax.dot_general(
        xw.reshape(new_n * wp, cin), w1[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1[...], 0.0).reshape(new_n, wp, cmid)
    # global row of local row r in the slice = i*tile_h + r
    rid = i * tile_h + jax.lax.broadcasted_iota(jnp.int32, (new_n, wp, 1), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (new_n, wp, 1), 1)
    valid = jnp.logical_and(rid < h, cid < w)
    y1_ring[pl.ds(d, new_n)] = jnp.where(valid, y1, 0.0).astype(cdt)

    # ---- conv2: nine (dh, dw) taps.  Column taps: sublane rolls of the
    # masked conv1 ring (slack >= d zeros => rolled-in values are zero,
    # reproducing conv zero-padding).  Row taps: free dim-0 slices.
    acc = jnp.broadcast_to(b2[...], (tile_h * wp, cmid)).astype(jnp.float32)
    y1_all = y1_ring[...]

    def _roll_cols(v, shift):
        # Mosaic's tpu.dynamic_rotate only handles 32-bit element types
        # (bf16 packs two values per sublane word, and sub-word shuffles
        # along the sublane axis aren't implemented) — round-trip through
        # f32 for the rotate; bf16->f32->bf16 is value-preserving.
        if jnp.dtype(v.dtype).itemsize == 4:
            return pltpu.roll(v, shift, 1)
        return pltpu.roll(v.astype(jnp.float32), shift, 1).astype(v.dtype)

    for jdx, dw in enumerate((-d, 0, d)):
        rolled = _roll_cols(y1_all, (-dw) % wp) if dw else y1_all
        for idx, dh in enumerate((-d, 0, d)):
            tap = rolled[d + dh:d + dh + tile_h]       # rows of the window
            acc = acc + jax.lax.dot_general(
                tap.reshape(tile_h * wp, cmid), w2[idx, jdx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc, 0.0).astype(cdt)

    # ---- conv3 (+BN) + skip + ReLU, masked so output slack is exactly 0
    out = jax.lax.dot_general(
        y2, w3[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b3[...]
    xc = x_ring[pl.ds(d, tile_h)]                       # center rows
    if has_down:
        skip = jax.lax.dot_general(
            xc.reshape(tile_h * wp, cin), wd[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bd[...]
    else:
        skip = xc.reshape(tile_h * wp, cin).astype(jnp.float32)
    out = jnp.maximum(out + skip, 0.0).reshape(tile_h, wp, -1)
    ocid = jax.lax.broadcasted_iota(jnp.int32, (tile_h, wp, 1), 1)
    out_ref[...] = jnp.where(ocid < w, out, 0.0).astype(cdt)


def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, *,
                     dilation: int = 1, width: Optional[int] = None,
                     tile_h: int = 8, interpret: bool = False):
    """Fused inference bottleneck on one image.

    x: (H, WP, Cin) in the compute dtype; ``width`` (default WP) is the
       logical image width — columns [width, WP) are slack whose content
       is ignored; the OUTPUT slack is exactly zero.  WP must be a
       multiple of the dtype's sublane tile with WP - width >= dilation.
    w1 (Cin, Cmid), w2 (3, 3, Cmid, Cmid), w3 (Cmid, Cout) BN-folded
       weights (``fold_convbn``), biases f32 (Cx,).
    wd/bd: optional folded 1x1 downsample producing the skip (Cin, Cout).
    Returns (H, WP, Cout) in x.dtype.
    """
    h, wp, cin = x.shape
    w = width or wp
    d = int(dilation)
    cmid = w1.shape[1]
    cout = w3.shape[1]
    sub = sublane(x.dtype)
    if wp % sub or wp - w < d:
        raise ValueError(
            f"padded width {wp} needs multiple of {sub} and >= {w}+{d}")
    if (wd is None) != (bd is None):
        raise ValueError("wd and bd go together")
    has_down = wd is not None
    if not has_down and cout != cin:
        raise ValueError("identity skip requires Cout == Cin")

    n_rows = -(-h // tile_h)
    cdt = x.dtype
    b_2d = lambda b: b.reshape(1, -1).astype(jnp.float32)
    args = [x, w1.astype(cdt), b_2d(b1), w2.astype(cdt), b_2d(b2),
            w3.astype(cdt), b_2d(b3)]
    if has_down:
        args += [wd.astype(cdt), b_2d(bd)]
    else:  # placeholders keep the kernel signature static
        args += [jnp.zeros((1, 1), cdt), jnp.zeros((1, 1), jnp.float32)]

    kernel = functools.partial(
        _block_kernel, h=h, w=w, wp=wp, d=d, tile_h=tile_h, n_rows=n_rows,
        has_down=has_down, acc_dtype=jnp.float32)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [vspec() for _ in range(8)],
        out_specs=pl.BlockSpec((tile_h, wp, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_round_up(h, tile_h), wp, cout),
                                       cdt),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * d, wp, cin), cdt),
            pltpu.VMEM((tile_h + 2 * d, wp, cmid), cdt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)[:h]


# ---------------------------------------------------------------------------
# VMEM feasibility: decide (at model-build time) whether a block's working
# set fits.  NOTE: the production backbone currently keeps the plain XLA
# conv path everywhere — on-chip the kernel only TIES XLA at flagship
# geometries (0.96-0.99x, docs/DESIGN.md), so nothing routes through it;
# this predicate is for callers that do (layer4 of resnet50dilated at
# bf16 would not fit anyway: ~12 MB of weights alone).

VMEM_BUDGET = 13 * 1024 * 1024  # leave ~3 MB of the ~16 MB for temporaries


def block_vmem_bytes(cin: int, cmid: int, cout: int, wp: int,
                     dilation: int, tile_h: int, itemsize: int) -> int:
    rows = tile_h + 2 * dilation
    ring = rows * wp * (cin + cmid) * itemsize
    weights = (cin * cmid + 9 * cmid * cmid + cmid * cout) * itemsize
    outbuf = 2 * tile_h * wp * cout * itemsize          # double-buffered
    acc = tile_h * wp * max(cmid, cout) * 4             # f32 accumulator
    work = tile_h * wp * max(cin, cmid) * itemsize * 2  # rolls/temps
    return ring + weights + outbuf + acc + work


def pick_tile_h(cin: int, cmid: int, cout: int, wp: int, dilation: int,
                itemsize: int, has_down: bool = False) -> Optional[int]:
    """Largest feasible tile_h (HBM efficiency is tile-independent thanks
    to the ring; larger tiles just amortize fixed per-step cost), or None
    if even tile_h=4 busts the VMEM budget."""
    extra = cin * cout * itemsize if has_down else 0
    for th in (32, 24, 16, 8, 4):
        if block_vmem_bytes(cin, cmid, cout, wp, dilation, th,
                            itemsize) + extra <= VMEM_BUDGET:
            return th
    return None
