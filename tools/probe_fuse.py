#!/usr/bin/env python
"""Probe: formulations of the PPM fuse conv (3x3, 4096 -> 512).

The round-3 trace (tools/analyze_trace.py over profile_eval.py) showed the
five per-scale fuse convs as the top device ops (~28% of per-image time at
~48% of the bf16 MXU peak), feeding from materialized concat copies
(bf16[71,1,8,16,4096]). This probe times, in-program on the chip:

  A. concat5+conv : concat the 5 PPM branches (2048 + 4x512) then one
                    3x3 conv 4096->512 — the current program's dataflow
  B. contig conv  : same conv on a pre-materialized 4096-ch input —
                    isolates the concat/copy cost from the conv itself
  C. split-sum    : linearity split — 3x3 conv 2048->512 on conv5 plus
                    3x3 conv on each 512-ch pooled branch, summed; the
                    4096-ch concat never exists
  D. split2-sum   : conv5 conv + ONE conv over the concat of the four
                    pooled branches (2048ch) — fewer dispatches than C

All variants compute the same FLOPs (2*H*W*9*4096*512) and identical math
up to float reassociation.  TF/s uses that common FLOP count.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_fn(fn, *args, iters=3):
    float(fn(*args))  # compile + warm; float() is the only true sync
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

    H, W = 71, 125  # OS8 map of the largest (568x1000) pyramid scale
    SCAN = 20
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    c5 = jnp.asarray(rng.standard_normal((1, H, W, 2048)), dt)
    pools = [jnp.asarray(rng.standard_normal((1, H, W, 512)), dt)
             for _ in range(4)]
    wfull = jnp.asarray(rng.standard_normal((3, 3, 4096, 512)) * 0.01, dt)
    x4096 = jnp.concatenate([c5] + pools, axis=-1)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def scanned(body_fn, carry):
        @jax.jit
        def run(carry, w):
            def body(c, _):
                y = body_fn(c, w)
                s = jnp.mean(y) * jnp.asarray(1e-6, jnp.float32)
                c = jax.tree.map(lambda t: t * (1 + s).astype(t.dtype), c)
                return c, jnp.sum(y)
            c, ys = jax.lax.scan(body, carry, None, length=SCAN)
            return jnp.sum(ys) + jnp.sum(
                jax.tree.reduce(lambda a, b: a + jnp.sum(b),
                                jax.tree.leaves(c), 0.0).astype(jnp.float32))
        return run, carry

    def a_concat(c, w):
        cc5, pp = c
        return conv(jnp.concatenate([cc5] + list(pp), axis=-1), w)

    def b_contig(c, w):
        return conv(c, w)

    def c_split(c, w):
        cc5, pp = c
        y = conv(cc5, w[:, :, :2048])
        for i, p in enumerate(pp):
            y = y + conv(p, w[:, :, 2048 + 512 * i: 2048 + 512 * (i + 1)])
        return y

    def d_split2(c, w):
        cc5, pp = c
        return (conv(cc5, w[:, :, :2048]) +
                conv(jnp.concatenate(list(pp), axis=-1), w[:, :, 2048:]))

    # E: the shipped formulation (ops/ppm_fuse.py) — pooled branches kept
    # at pyramid resolution (k x k), their conv contribution computed with
    # shifted interpolation matmuls instead of upsample + 512-ch conv
    from open_world_semantic_segmentation_tpu.ops.ppm_fuse import (
        ppm_fuse_conv)
    pools_small = [jnp.asarray(rng.standard_normal((1, k, k, 512)), dt)
                   for k in (1, 2, 3, 6)]

    def e_pooled(c, w):
        cc5, pp = c
        return ppm_fuse_conv(cc5, list(pp), w)

    flops = 2 * H * W * 9 * 4096 * 512 * SCAN
    print(f"fuse conv probe  H={H} W={W} scan={SCAN}  dtype=bf16")
    for name, body, carry in [
        ("A concat5+conv", a_concat, (c5, tuple(pools))),
        ("B contig conv ", b_contig, x4096),
        ("C split-sum   ", c_split, (c5, tuple(pools))),
        ("D split2-sum  ", d_split2, (c5, tuple(pools))),
        ("E pooled-trick", e_pooled, (c5, tuple(pools_small))),
    ]:
        run, cc = scanned(body, carry)
        t = time_fn(run, cc, wfull)
        print(f"  {name}: {t * 1e6 / SCAN:9.1f} us/conv   "
              f"{flops / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
