#!/usr/bin/env python
"""Bench: fused bottleneck Pallas kernel vs XLA's three-conv chain.

Decides whether routing the stride-1 backbone bottlenecks through
ops/pallas_block.py (one HBM read + one write per block) beats XLA's
per-conv dataflow (every intermediate makes an HBM round trip) on the
flagship eval geometries (568x1000 input at OS8 -> 71x125 maps):

    layer2:  cin 512,  cmid 128, d 1  (47x84-ish at 1/8 of the 376 scale)
    layer3:  cin 1024, cmid 256, d 2  (the 6-block bulk of the backbone)

Same in-program scan + scalar-readback timing as tools/probe_int8.py.
Reports us/block and the effective HBM bandwidth of the fused kernel's
ideal traffic (read cin + write cout) — if that number exceeds the chip's
~819 GB/s the kernel is compute-limited, not traffic-limited.
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

    from open_world_semantic_segmentation_tpu.ops.pallas_block import (
        fused_bottleneck, pick_tile_h, sublane)

    SCAN = 30
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    cases = [
        # (name, h, w, cin, cmid, d)
        ("layer2 48x84", 48, 84, 512, 128, 1),
        ("layer3 72x125", 72, 125, 1024, 256, 2),
    ]

    def scanned(step):
        @jax.jit
        def run(x, ws):
            def body(xc, _):
                y = step(xc, ws)
                s = (jnp.mean(y.astype(jnp.float32)) * 1e-6).astype(xc.dtype)
                return y * (1 + s), jnp.sum(y.astype(jnp.float32))
            xf, ys = jax.lax.scan(body, x, None, length=SCAN)
            return jnp.sum(ys) + jnp.sum(xf.astype(jnp.float32))
        return run

    print(f"bottleneck block bench  scan={SCAN}  dtype=bf16")
    for name, h, w, cin, cmid, d in cases:
        sub = sublane(dt)
        wp = -(-(w + d) // sub) * sub
        tile_h = pick_tile_h(cin, cmid, cin, wp, d, jnp.dtype(dt).itemsize)
        assert tile_h and h % tile_h == 0, (name, tile_h)
        x = jnp.zeros((h, wp, cin), dt).at[:, :w].set(
            jnp.asarray(rng.standard_normal((h, w, cin)), dt))
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
        w1, b1 = mk(cin, cmid), mk(cmid)
        w2, b2 = mk(3, 3, cmid, cmid), mk(cmid)
        w3, b3 = mk(cmid, cin), mk(cin)

        def pallas_step(xc, ws):
            return fused_bottleneck(xc, *ws, dilation=d, width=w,
                                    tile_h=tile_h)

        def xla_step(xc, ws):
            w1, b1, w2, b2, w3, b3 = ws
            y = jnp.maximum(jnp.einsum(
                "hwc,cm->hwm", xc, w1.astype(dt),
                preferred_element_type=jnp.float32) + b1, 0.0).astype(dt)
            y = jax.lax.conv_general_dilated(
                y[None], w2.astype(dt), (1, 1), [(d, d)] * 2,
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)[0]
            y = jnp.maximum(y + b2, 0.0).astype(dt)
            y = jnp.einsum("hwm,mo->hwo", y, w3.astype(dt),
                           preferred_element_type=jnp.float32) + b3
            return jnp.maximum(y + xc.astype(jnp.float32), 0.0).astype(dt)

        ws = (w1, b1, w2, b2, w3, b3)
        # correctness on the real chip before timing
        got = pallas_step(x, ws)
        want = xla_step(x, ws)
        err = float(jnp.max(jnp.abs(
            got[:, :w].astype(jnp.float32) - want[:, :w].astype(jnp.float32))))
        print(f"  {name}: tile_h={tile_h} wp={wp} max|diff|={err:.4f}")

        t_p = time_fn(scanned(pallas_step), x, ws)
        t_x = time_fn(scanned(xla_step), x, ws)
        ideal_bytes = h * wp * cin * 2 * 2  # read x + write y, bf16
        bw = ideal_bytes * SCAN / t_p / 1e9
        print(f"    pallas {t_p * 1e6 / SCAN:8.1f} us/block "
              f"(ideal-traffic BW {bw:5.0f} GB/s)   "
              f"xla {t_x * 1e6 / SCAN:8.1f} us/block   "
              f"ratio x/p = {t_x / t_p:.2f}")


if __name__ == "__main__":
    main()
