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


def time_fn(fn, *args, iters=3):
    # fn returns a scalar; float() is the only true sync over the tunnel
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

    H, W = 72, 128  # padded-ish layer3/4 resolution for a 568x1000 image
    shapes = [
        ("l3 3x3 d2", (1, H, W, 256), (3, 3, 256, 256), 2),
        ("l4 3x3 d4", (1, H, W, 512), (3, 3, 512, 512), 4),
        ("1x1 expand", (1, H, W, 1024), (1, 1, 1024, 256), 1),
        ("ppm fuse 3x3", (1, H, W, 4096), (3, 3, 4096, 512), 1),
    ]
    rng = np.random.default_rng(0)

    SCAN = 50  # conv applications per dispatch: amortizes tunnel overhead

    def make_scanned(dil, acc_dtype):
        # x -> conv -> cast back to input dtype -> feed forward, SCAN times
        # inside ONE program; measures kernel time, not dispatch time. The
        # output feeds the next iteration so XLA cannot elide iterations.
        @jax.jit
        def run(x, w):
            def body(xc, _):
                pad = dil * (w.shape[0] - 1) // 2
                y = jax.lax.conv_general_dilated(
                    xc, w, (1, 1), [(pad, pad)] * 2, rhs_dilation=(dil, dil),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_dtype)
                # renormalize + cast so values stay in range; cheap VPU op
                y = (y.astype(jnp.float32) * 1e-3)
                if xc.dtype == jnp.int8:
                    y = jnp.clip(y, -127, 127).astype(jnp.int8)
                else:
                    y = y.astype(xc.dtype)
                # conv may change channel count; slice/pad back
                c = xc.shape[-1]
                y = y[..., :c] if y.shape[-1] >= c else jnp.concatenate(
                    [y] * (c // y.shape[-1]), axis=-1)
                return y, ()

            out, _ = jax.lax.scan(body, x, None, length=SCAN)
            return jnp.sum(out.astype(jnp.float32))

        return run

    print(f"{'shape':>14} {'bf16 us':>9} {'bf16 TF/s':>10} "
          f"{'int8 us':>9} {'int8 TF/s':>10} {'speedup':>8}")
    for name, xs, ws, dil in shapes:
        flops = 2 * xs[0] * xs[1] * xs[2] * ws[0] * ws[1] * ws[2] * ws[3]
        x16 = jnp.asarray(rng.standard_normal(xs) * 0.1, jnp.bfloat16)
        w16 = jnp.asarray(rng.standard_normal(ws) * 0.1, jnp.bfloat16)
        t16 = time_fn(make_scanned(dil, jnp.bfloat16), x16, w16) / SCAN
        x8 = jnp.asarray(rng.integers(-127, 128, xs), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, ws), jnp.int8)
        try:
            t8 = time_fn(make_scanned(dil, jnp.int32), x8, w8) / SCAN
        except Exception as e:  # pragma: no cover - probe tool
            print(f"{name:>14} int8 conv FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:>14} {t16 * 1e6:9.1f} {flops / t16 / 1e12:10.1f} "
              f"{t8 * 1e6:9.1f} {flops / t8 / 1e12:10.1f} {t16 / t8:8.2f}")


if __name__ == "__main__":
    main()
