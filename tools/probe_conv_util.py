#!/usr/bin/env python
"""Probe: MXU utilization levers for the two biggest conv fusions.

VERDICT (see docs/DESIGN.md "Round-3 terminal perf audit"): the
hypothesis this probe was written to test — that the fuse conv5 term and
the layer4 dilated convs run at 30-40% MXU — was an ARITHMETIC MISREAD
of analyze_trace.py output (its ``ms`` column sums over all trace
events; divide by the image count). Read correctly, the trace shows
both at ~180+ TF/s, i.e. ~90% of the 197 TF/s bf16 peak: XLA has no
kernel-level headroom left in the conv stack. The probe is kept because
(a) it documents that negative result with runnable evidence, and
(b) writing it surfaced a second finding that corrects ALL small-probe
methodology in this repo: a single jit dispatch over the axon tunnel
has a ~10-30 ms fixed cost, and a lax.scan program below ~10 ms total
measures the tunnel, not the op (use SCAN large enough that the program
runs tens of ms, and compare formulations only within one harness).

Formulations timed (identical math, different lowering):

  conv hot spot 1 (3x3 2048->512, d=1):
    F  lax.conv, f32 accumulation output (the shipped dataflow)
    G  lax.conv, bf16 output (halves the output write; answers whether
       the f32 materialization costs anything)
    H  9-shifted-matmul: pad the input, take the 9 tap slices, flatten
       each to (H*W, 2048) @ K[tap] (2048, 512), accumulate in f32 —
       identical math, pure matmuls (M=8875, K=2048, N=512)

  conv hot spot 2 (3x3 512->512, dilation 4):
    X  lax.conv with rhs_dilation (the shipped dataflow)
    Y  space-to-batch: decompose into 4x4=16 phase grids, run a d=1
       3x3 conv at batch 16, inverse-interleave (the classic TF
       space-to-batch trick; phases make the dilated taps contiguous)
    Z  9-shifted-matmul with dilated tap offsets (slices at +-4)

Measured (SCAN=20, so ~0.6 ms/iter of the fixed dispatch cost is
smeared into every row — orderings valid, absolutes inflated):
hot spot 1: F 1588 us, G 1552, H 1866 — conv wins, dtype irrelevant;
hot spot 2: X 770 us, Xb 782, Y 772, Z 814 — all formulations tie,
consistent with the trace's verdict that XLA's dilated conv is already
at peak and the probe floor dominates.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_fn(fn, *args, iters=3):
    float(fn(*args))
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - tic) / iters


def main():
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp

    H, W = 71, 125
    SCAN = 20
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def scanned(body_fn, carry, w):
        @jax.jit
        def run(carry, w):
            def body(c, _):
                y = body_fn(c, w)
                s = jnp.mean(y).astype(jnp.float32) * 1e-6
                c = jax.tree.map(lambda t: (t * (1 + s).astype(t.dtype)), c)
                return c, jnp.sum(y).astype(jnp.float32)
            c, ys = jax.lax.scan(body, carry, None, length=SCAN)
            return jnp.sum(ys) + jnp.sum(c).astype(jnp.float32)
        return run

    def conv(x, w, d=1, out_dt=jnp.float32):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dt)

    def shift_matmul(x, w, d=1, out_dt=jnp.float32):
        """3x3 (dilated) conv as 9 tap matmuls over slices of the padded
        input. x: (1, H, W, C); w: (3, 3, C, Cout)."""
        _, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        acc = None
        for di in range(3):
            for dj in range(3):
                tap = jax.lax.dynamic_slice(
                    xp, (0, di * d, dj * d, 0), (1, h, wd, c))
                t = jnp.einsum("nhwc,cf->nhwf", tap, w[di, dj],
                               preferred_element_type=out_dt)
                acc = t if acc is None else acc + t
        return acc

    # ---- hot spot 1: 3x3 2048->512, d=1 ----
    x1 = jnp.asarray(rng.standard_normal((1, H, W, 2048)), dt)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 2048, 512)) * 0.01, dt)
    flops1 = 2 * H * W * 9 * 2048 * 512 * SCAN

    print(f"hot spot 1: 3x3 2048->512 d=1 at {H}x{W}  scan={SCAN}")
    for name, fn in [
        ("F conv f32-out ", lambda c, w: conv(c, w)),
        ("G conv bf16-out", lambda c, w: conv(c, w, out_dt=dt)),
        ("H 9-matmul f32 ", lambda c, w: shift_matmul(c, w)),
    ]:
        t = time_fn(scanned(fn, x1, w1), x1, w1)
        print(f"  {name}: {t * 1e6 / SCAN:9.1f} us   "
              f"{flops1 / t / 1e12:6.1f} TF/s")

    # ---- hot spot 2: 3x3 512->512, d=4 ----
    x2 = jnp.asarray(rng.standard_normal((1, H, W, 512)), dt)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 512, 512)) * 0.03, dt)
    flops2 = 2 * H * W * 9 * 512 * 512 * SCAN

    def s2b(x, w, d=4, out_dt=jnp.float32):
        """space-to-batch: (1,H,W,C) -> (d*d, ceilH, ceilW, C) phase
        grids, 3x3 d=1 conv, inverse. Padding semantics match the d=pad
        dilated conv on the padded canvas (timing probe; exactness at the
        bottom/right pad fringe is handled by cropping)."""
        _, h, wd, c = x.shape
        hp, wp = -(-h // d) * d, -(-wd // d) * d
        xp = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - wd), (0, 0)))
        # (1, hp/d, d, wp/d, d, c) -> (d*d, hp/d, wp/d, c)
        g = xp.reshape(1, hp // d, d, wp // d, d, c)
        g = g.transpose(2, 4, 0, 1, 3, 5).reshape(d * d, hp // d, wp // d, c)
        y = jax.lax.conv_general_dilated(
            g, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=out_dt)
        y = y.reshape(d, d, 1, hp // d, wp // d, -1)
        y = y.transpose(2, 3, 0, 4, 1, 5).reshape(1, hp, wp, -1)
        return y[:, :h, :wd]

    print(f"hot spot 2: 3x3 512->512 d=4 at {H}x{W}  scan={SCAN}")
    for name, fn in [
        ("X conv rhs_dil f32", lambda c, w: conv(c, w, d=4)),
        ("Xb conv rhs_dil bf16", lambda c, w: conv(c, w, d=4, out_dt=dt)),
        ("Y space-to-batch  ", lambda c, w: s2b(c, w)),
        ("Yb s2b bf16-out   ", lambda c, w: s2b(c, w, out_dt=dt)),
        ("Z 9-matmul d=4    ", lambda c, w: shift_matmul(c, w, d=4)),
    ]:
        t = time_fn(scanned(fn, x2, w2), x2, w2)
        print(f"  {name}: {t * 1e6 / SCAN:9.1f} us   "
              f"{flops2 / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
