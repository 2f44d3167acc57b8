#!/usr/bin/env python
"""On-chip probes for the DeepLab OS16 1024x2048 forward's hot fusions.

Round-4 audit (VERDICT r3 #2): the xplane trace shows three dominant
blocks — the 7x7/2 stem conv (~2.6 ms/img), the ASPP dilated 3x3 convs
(~2.5 ms each for rates 12/18), and layout copies. This tool times each
candidate reformulation in isolation with the in-program-scan method
(SCAN iterations inside one dispatch; the ~10-30 ms tunnel round trip is
paid once — docs/DESIGN.md "Probe methodology correction").

Probes:
  stem    : native 7x7/2 conv vs exact 2x2 space-to-depth (4x4/1 on 12ch)
  dilated : native dilated 3x3 (rates 6/12/18) vs shift+matmul
            (ops/dilated.py) on the real ASPP geometry [64,128,2048]->256
  aspp    : concat(5x256)+1x1 project vs per-branch projection sum with
            the image-pool branch projected at 1x1 and broadcast
            (the ops/ppm_fuse.py linearity trick applied to ASPP,
            reference network/utils.py:332-361)
  fuse    : V3+ head concat([low 48ch, up 256ch])+3x3 fuse conv vs two
            summed convs (removes the 304-ch concat materialization at
            1/4 resolution, reference network/utils.py:8-40)

Usage: python tools/probe_deeplab_hotspots.py [--scan 50] [--which ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, scan=50, iters=3):
    """Median wall-time per scan iteration of fn inside one dispatch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*a)
            # fold output into the carry so the loop can't be elided
            return c + jnp.sum(out.astype(jnp.float32)), ()

        tot, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              None, length=scan)
        return tot

    float(run(*args))  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append((time.perf_counter() - t0) / scan)
    return float(np.median(ts))


def probe_stem(scan):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1024, 2048, 3)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.bfloat16)

    def native(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def s2d(x, k):
        # exact: y[i,j] = sum_{u,v} k[u,v] x[2i+u-3, 2j+v-3].
        # With x2[i,j,(p,q,c)] = x[2i+p, 2j+q, c] (2x2 space-to-depth),
        # x[2i+u-3] = x2[i + floor((u-3)/2)][phase (u-3) mod 2]; u-3 in
        # [-3,3] -> block offsets -2..1 -> a 4x4 stride-1 conv on 12ch.
        n, h, w, c = x.shape
        x2 = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        k2 = jnp.zeros((4, 4, 2, 2, c, 64), k.dtype)
        for u in range(7):
            for v in range(7):
                du, pu = divmod(u - 3, 2)
                dv, pv = divmod(v - 3, 2)
                k2 = k2.at[du + 2, dv + 2, pu, pv].set(k[u, v])
        k2 = k2.reshape(4, 4, 2 * 2 * c, 64)
        return jax.lax.conv_general_dilated(
            x2, k2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # correctness on a SMALL input, compared on-device down to one scalar
    # (fetching a full-size output map over the axon tunnel takes minutes)
    xs = jnp.asarray(rng.standard_normal((1, 64, 128, 3)), jnp.bfloat16)

    @jax.jit
    def relerr(xs, k):
        a = native(xs, k).astype(jnp.float32)
        b = s2d(xs, k).astype(jnp.float32)
        return jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9)

    err = float(relerr(xs, k))
    res = {
        "stem_native_ms": round(timed(native, x, k, scan=scan) * 1e3, 3),
        "stem_s2d_ms": round(timed(s2d, x, k, scan=scan) * 1e3, 3),
        "stem_s2d_rel_err": err,
    }
    return res


def probe_stem_ctx(scan):
    """The stem AS THE PROGRAM RUNS IT: f32 input -> bf16 cast -> 7x7/2
    conv -> BN affine + relu -> 3x3/2 maxpool. The isolated bf16 conv
    probes at ~0.56 ms but the in-program fusion occupies ~2.6 ms
    (xplane, round 4) — this variant isolates which wrapper element
    (f32 input cast, epilogue, maxpool context) is responsible."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    xf = jnp.asarray(rng.standard_normal((1, 1024, 2048, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.05, jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((64,)), jnp.float32)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def full(xf, k, scale, bias):
        y = conv(xf.astype(jnp.bfloat16), k)
        y = jnp.maximum(y * scale + bias, 0.0).astype(jnp.bfloat16)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)))

    def conv_f32in(xf, k, scale, bias):
        return conv(xf.astype(jnp.bfloat16), k)

    def conv_bf16in(xf, k, scale, bias):
        # pre-cast OUTSIDE the timed fn is impossible in-scan; cast is
        # still inside, but via an explicit standalone convert
        xb = xf.astype(jnp.bfloat16)
        xb = jax.lax.optimization_barrier(xb)
        return conv(xb, k)

    return {
        "stemctx_full_ms": round(
            timed(full, xf, k, scale, bias, scan=scan) * 1e3, 3),
        "stemctx_conv_f32in_ms": round(
            timed(conv_f32in, xf, k, scale, bias, scan=scan) * 1e3, 3),
        "stemctx_conv_barrier_ms": round(
            timed(conv_bf16in, xf, k, scale, bias, scan=scan) * 1e3, 3),
    }


def probe_dilated(scan):
    import jax
    import jax.numpy as jnp

    from open_world_semantic_segmentation_tpu.ops.dilated import (
        dilated_conv3x3_shift)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 2048)) * 0.1,
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 2048, 256)) * 0.02,
                    jnp.bfloat16)

    res = {}
    for d in (6, 12, 18):
        def native(x, k, d=d):
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding=((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def shift(x, k, d=d):
            return dilated_conv3x3_shift(x, k, (d, d))

        res[f"dilated{d}_native_ms"] = round(
            timed(native, x, k, scan=scan) * 1e3, 3)
        res[f"dilated{d}_shift_ms"] = round(
            timed(shift, x, k, scan=scan) * 1e3, 3)
    return res


def probe_aspp_project(scan):
    """concat(5 branches)+1x1 project vs per-branch slice-projection sum,
    pool branch projected at 1x1 resolution and broadcast-added."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    bs = [jnp.asarray(rng.standard_normal((1, 64, 128, 256)) * 0.1,
                      jnp.bfloat16) for _ in range(4)]
    p = jnp.asarray(rng.standard_normal((1, 1, 1, 256)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1, 1280, 256)) * 0.03,
                    jnp.bfloat16)

    def native(b0, b1, b2, b3, p, k):
        pool = jnp.broadcast_to(p, b0.shape)
        y = jnp.concatenate([b0, b1, b2, b3, pool], axis=-1)
        return jax.lax.conv_general_dilated(
            y, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def split(b0, b1, b2, b3, p, k):
        acc = None
        for i, b in enumerate((b0, b1, b2, b3)):
            y = jax.lax.conv_general_dilated(
                b, k[:, :, 256 * i:256 * (i + 1)], (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        # pool branch: project the 1x1 vector, broadcast the result
        yp = jax.lax.conv_general_dilated(
            p, k[:, :, 1024:], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (acc + yp).astype(jnp.bfloat16)

    @jax.jit
    def relerr(*a):
        x = native(*a).astype(jnp.float32)
        y = split(*a).astype(jnp.float32)
        return jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-9)

    return {
        "aspp_native_ms": round(
            timed(native, *bs, p, k, scan=scan) * 1e3, 3),
        "aspp_split_ms": round(
            timed(split, *bs, p, k, scan=scan) * 1e3, 3),
        "aspp_split_rel_err": float(relerr(*bs, p, k)),
    }


def probe_fuse_concat(scan):
    """V3+ fuse: concat([low 48, up 256]) + 3x3 conv vs two summed 3x3
    convs on the real 1/4-resolution geometry (256x512)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    low = jnp.asarray(rng.standard_normal((1, 256, 512, 48)) * 0.1,
                      jnp.bfloat16)
    up = jnp.asarray(rng.standard_normal((1, 256, 512, 256)) * 0.1,
                     jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 304, 256)) * 0.02,
                    jnp.bfloat16)

    def conv(x, kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def native(low, up, k):
        return conv(jnp.concatenate([low, up], axis=-1),
                    k).astype(jnp.bfloat16)

    def split(low, up, k):
        return (conv(low, k[:, :, :48]) +
                conv(up, k[:, :, 48:])).astype(jnp.bfloat16)

    @jax.jit
    def relerr(low, up, k):
        x = native(low, up, k).astype(jnp.float32)
        y = split(low, up, k).astype(jnp.float32)
        return jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-9)

    return {
        "fuse_native_ms": round(timed(native, low, up, k, scan=scan) * 1e3,
                                3),
        "fuse_split_ms": round(timed(split, low, up, k, scan=scan) * 1e3,
                               3),
        "fuse_split_rel_err": float(relerr(low, up, k)),
    }


def probe_fuse_upsampled(scan):
    """V3+ fuse with the 256-ch branch computed AT ASPP RESOLUTION via
    ops/ppm_fuse.upsampled_conv3x3: conv3x3(bilinear(aspp, 4x)) done as
    shifted-interp einsums on the 64x128 map. FLOPs: ~74 GF vs the
    native concat path's ~184 GF, and neither the 4x-upsampled 256-ch
    map nor the 304-ch concat is ever materialized."""
    import jax
    import jax.numpy as jnp

    from open_world_semantic_segmentation_tpu.ops.ppm_fuse import (
        upsampled_conv3x3)
    from open_world_semantic_segmentation_tpu.ops.resize import (
        bilinear_resize)

    rng = np.random.default_rng(4)
    low = jnp.asarray(rng.standard_normal((1, 256, 512, 48)) * 0.1,
                      jnp.bfloat16)
    aspp = jnp.asarray(rng.standard_normal((1, 64, 128, 256)) * 0.1,
                       jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 304, 256)) * 0.02,
                    jnp.bfloat16)

    def conv(x, kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def native(low, aspp, k):
        up = bilinear_resize(aspp, (256, 512))
        return conv(jnp.concatenate([low, up], axis=-1),
                    k).astype(jnp.bfloat16)

    def upfused(low, aspp, k):
        y = conv(low, k[:, :, :48])
        y = y + upsampled_conv3x3(aspp, k[:, :, 48:], (256, 512))
        return y.astype(jnp.bfloat16)

    @jax.jit
    def relerr(low, aspp, k):
        x = native(low, aspp, k).astype(jnp.float32)
        y = upfused(low, aspp, k).astype(jnp.float32)
        return jnp.max(jnp.abs(x - y)) / (jnp.max(jnp.abs(x)) + 1e-9)

    return {
        "fuseup_native_ms": round(
            timed(native, low, aspp, k, scan=scan) * 1e3, 3),
        "fuseup_einsum_ms": round(
            timed(upfused, low, aspp, k, scan=scan) * 1e3, 3),
        "fuseup_rel_err": float(relerr(low, aspp, k)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", type=int, default=50)
    ap.add_argument("--which", default="all",
                    choices=["all", "stem", "stemctx", "dilated", "aspp",
                             "fuse", "fuseup"])
    args = ap.parse_args()
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()

    out = {}
    if args.which in ("all", "stem"):
        out.update(probe_stem(args.scan))
        print(json.dumps(out), flush=True)
    if args.which in ("all", "stemctx"):
        out.update(probe_stem_ctx(args.scan))
        print(json.dumps(out), flush=True)
    if args.which in ("all", "dilated"):
        out.update(probe_dilated(args.scan))
        print(json.dumps(out), flush=True)
    if args.which in ("all", "aspp"):
        out.update(probe_aspp_project(args.scan))
        print(json.dumps(out), flush=True)
    if args.which in ("all", "fuse"):
        out.update(probe_fuse_concat(args.scan))
        print(json.dumps(out), flush=True)
    if args.which in ("all", "fuseup"):
        out.update(probe_fuse_upsampled(args.scan))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
