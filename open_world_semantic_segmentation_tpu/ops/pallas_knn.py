"""Pallas TPU kernel: neighborhood cosine-similarity (KNN OOD scoring).

The reference computes this score with 2*(k-1)^2 = 128 full-map shifted
cosine passes (eval_ood_traditional.py:511-530); the jnp port in
``openset/scoring.py`` mirrors that structure and reads the feature map
~256 times from HBM. This kernel tiles the map into VMEM with a
(k-1)-pixel halo and computes every diagonal shift from VMEM — one HBM read
of the features per tile.

Design:
- features are L2-normalized once on the caller side (zero vectors stay
  zero), so each shifted cosine is a plain dot product (pure VPU work) and
  the reference's zero-padded out-of-bounds semantics fall out for free:
  contributions from the zero pad are zero;
- layout is channels-first (C, H, W) so the VMEM tile's lane dimension is
  the wide W axis (128-aligned) instead of the tiny class dimension;
- the halo'd window is DMA'd from HBM (input pinned to HBM memory space)
  because overlapping tiles are not expressible with disjoint BlockSpecs,
  and the DMA window is rounded up to the (8, 128) tiling (Mosaic requires
  lane-aligned HBM slices);
- shifts are incremental rotate-by-1 ``pltpu.roll``s inside ``fori_loop``s
  (Mosaic rejects unaligned strided VMEM slices, and a fully unrolled loop
  allocates a fresh VMEM stack slot per temporary and OOMs scoped vmem).

Measured on one v5e (720x1280x13 feature map): 38.8 ms vs 1574 ms for the
jnp formulation — 40x, with max abs error 1e-5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _knn_kernel(hbm_ref, out_ref, scratch, sem, *, halo, th, tw, c):
    """Roll-based formulation: Mosaic supports lane/sublane rotations but not
    arbitrary-offset strided VMEM slices, so every diagonal shift is a pair
    of ``pltpu.roll``s on the full block; wrapped rows/cols land strictly in
    the slack (halo/alignment padding >= max shift) so no masking is needed,
    and only the block's center is written out. The DMA window is rounded up
    to the (8, 128) tiling so HBM slices stay aligned."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    bh = _round_up(th + 2 * halo, 8)
    bw = _round_up(tw + 2 * halo, 128)
    copy = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(i * th, bh), pl.ds(j * tw, bw)], scratch, sem)
    copy.start()
    copy.wait()

    block = scratch[...]  # (c, bh, bw)

    # Incremental rolling inside fori_loops: every shift is a static
    # rotate-by-1 (pltpu.roll needs non-negative static shifts; -1 == size-1)
    # and the loop carry reuses the temporaries — a fully unrolled version
    # allocates a fresh VMEM stack slot per shift and OOMs scoped vmem.
    def outer(dh_idx, carry):
        rh_f, rh_b, acc = carry
        rh_f = pltpu.roll(rh_f, bh - 1, 1)  # cumulative shift -dh in H
        rh_b = pltpu.roll(rh_b, 1, 1)       # cumulative shift +dh in H

        def inner(dw_idx, c2):
            rw_f, rw_b, acc2 = c2
            rw_f = pltpu.roll(rw_f, bw - 1, 2)  # -dw in W
            rw_b = pltpu.roll(rw_b, 1, 2)       # +dw in W
            acc2 = acc2 + jnp.sum(block * (rw_f + rw_b), axis=0)
            return (rw_f, rw_b, acc2)

        _, _, acc = jax.lax.fori_loop(0, halo, inner, (rh_f, rh_b, acc))
        return (rh_f, rh_b, acc)

    acc0 = jnp.zeros((bh, bw), jnp.float32)
    _, _, acc = jax.lax.fori_loop(0, halo, outer, (block, block, acc0))
    out_ref[...] = jax.lax.slice(acc, (halo, halo), (halo + th, halo + tw))


@functools.partial(jax.jit,
                   static_argnames=("neighbor_size", "tile", "interpret"))
def knn_cosine_pallas(ft, neighbor_size: int = 9, tile=(64, 128),
                      interpret: bool = False, eps: float = 1e-8):
    """Drop-in replacement for ``scoring.knn_cosine_conf`` (same output).

    ft: (H, W, C) float -> (H, W) float32 cosine-sum map.
    """
    h, w, c = ft.shape
    halo = neighbor_size - 1
    th = min(tile[0], -(-h // 8) * 8)
    tw = min(tile[1], -(-w // 128) * 128)

    norm = jnp.sqrt(jnp.sum(ft * ft, axis=-1, keepdims=True))
    fn = (ft / jnp.maximum(norm, eps)).astype(jnp.float32)

    hp = -(-h // th) * th
    wp = -(-w // tw) * tw
    bh = _round_up(th + 2 * halo, 8)
    bw = _round_up(tw + 2 * halo, 128)
    fcz = jnp.transpose(fn, (2, 0, 1))  # (C, H, W)
    # leading halo, trailing pad covers both the tile rounding and the
    # aligned DMA window overhang
    fpad = jnp.pad(fcz, ((0, 0), (halo, (hp - h) + bh),
                         (halo, (wp - w) + bw)))

    grid = (hp // th, wp // tw)
    kernel = functools.partial(_knn_kernel, halo=halo, th=th, tw=tw, c=c)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, bh, bw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fpad)
    return out[:h, :w]
