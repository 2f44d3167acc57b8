#!/usr/bin/env python
"""Probe: int8 vs bf16 conv throughput on the attached TPU.

Decides whether an opt-in int8 trunk (NEXT.md #2) can beat the bf16
roofline of the flagship eval. Times the four conv shapes that dominate
the StreetHazards eval program (568x1000 input, OS8):

  - layer3 3x3 dilated-2 bottleneck conv (256ch wide)
  - layer4 3x3 dilated-4 bottleneck conv (512ch wide)
  - bottleneck 1x1 expand (1024 -> 256)
  - PPM fuse 3x3 (4096 -> 512) — the single largest matmul in the model

Prints a table of TFLOP/s (int8 "FLOPs" counted as MACs*2 like bf16 so the
ratio is the speedup).
"""

from __future__ import annotations

import time

import numpy as np


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tic) / iters


def main():
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    import jax
    import jax.numpy as jnp
    from functools import partial

    H, W = 72, 128  # padded-ish layer3/4 resolution for a 568x1000 image
    shapes = [
        ("l3 3x3 d2", (1, H, W, 256), (3, 3, 256, 256), 2),
        ("l4 3x3 d4", (1, H, W, 512), (3, 3, 512, 512), 4),
        ("1x1 expand", (1, H, W, 1024), (1, 1, 1024, 256), 1),
        ("ppm fuse 3x3", (1, H, W, 4096), (3, 3, 4096, 512), 1),
    ]
    rng = np.random.default_rng(0)

    @partial(jax.jit, static_argnames=("dil",))
    def conv_bf16(x, w, dil=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    @partial(jax.jit, static_argnames=("dil",))
    def conv_int8(x, w, dil=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    print(f"{'shape':>14} {'bf16 ms':>9} {'bf16 TF/s':>10} "
          f"{'int8 ms':>9} {'int8 TF/s':>10} {'speedup':>8}")
    for name, xs, ws, dil in shapes:
        flops = 2 * xs[0] * xs[1] * xs[2] * ws[0] * ws[1] * ws[2] * ws[3]
        x16 = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        w16 = jnp.asarray(rng.standard_normal(ws), jnp.bfloat16)
        t16 = time_fn(conv_bf16, x16, w16, dil=dil)
        x8 = jnp.asarray(rng.integers(-127, 128, xs), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, ws), jnp.int8)
        try:
            t8 = time_fn(conv_int8, x8, w8, dil=dil)
        except Exception as e:  # pragma: no cover - probe tool
            print(f"{name:>14} int8 conv FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:>14} {t16 * 1e3:9.3f} {flops / t16 / 1e12:10.1f} "
              f"{t8 * 1e3:9.3f} {flops / t8 / 1e12:10.1f} {t16 / t8:8.2f}")


if __name__ == "__main__":
    main()
