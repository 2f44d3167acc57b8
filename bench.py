#!/usr/bin/env python
"""Flagship benchmark: StreetHazards OOD eval throughput on one chip.

Measures BASELINE.json config #1 — the full per-image pipeline of
``anomaly/eval_ood_traditional.py --ood dissum``: 5-scale forward of the
CSAIL ResNet-50-dilated + PPM-embedding model on a 720x1280 image, scores
averaged at label resolution, dissum anomaly map + argmax — everything one
jitted XLA program per scale set (bf16 compute, fp32 params).

Prints ONE JSON line:
  {"metric": "streethazards_ood_eval", "value": imgs/sec, "unit":
   "imgs/sec/chip", "vs_baseline": value / V100_BASELINE}

``V100_BASELINE``: the reference repo publishes no numbers (BASELINE.md); we
use 1.25 imgs/sec — an optimistic estimate for the reference's 5-scale
720p PSPNet-50 forward + host-side numpy scoring on one V100 (its printed
"Inference Time" per image is ~0.8 s there). The ">= 5x V100" target from
BASELINE.json therefore corresponds to vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_BASELINE_IMGS_PER_SEC = 1.25
FULL_SIZE = (720, 1280)
# eval pyramid of data/odgt.py for a 720x1280 source, imgSizes (300..600),
# imgMaxSize 1000, padding 8
PYRAMID = [(304, 536), (376, 672), (456, 800), (528, 936), (568, 1000)]


def main(arch_encoder="resnet50dilated", fc_dim=2048, pyramid=None,
         full_size=FULL_SIZE, n_imgs=32, n_iters=5, quant="off",
         quant_stages=None, prequant=False, cast_params=False):
    """``quant``: "off" is the reference-parity path the driver records;
    "int8"/"int8-3x3" measure the opt-in PTQ mode (ops/quant.py).
    ``prequant``: quantize weights offline (ops.quant.prequantize) instead
    of inline — removes the per-scale f32 kernel reads.
    ``cast_params``: pre-cast fp32 params to the bf16 compute dtype on the
    host. Bit-identical outputs (flax casts them to bf16 inside the
    program anyway); probes whether XLA hoists the casts/f32 reads."""
    import os

    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()

    # interpolation-matmul resize: same sampling grid on the MXU, +11%
    # end-to-end on this pipeline vs the gather formulation
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")

    import jax
    import jax.numpy as jnp

    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        dissum_conf,
    )

    pyramid_shapes = pyramid or PYRAMID
    qkw = {} if quant_stages is None else {"quant_stages": quant_stages}
    model = ModelBuilder.build_segmentation_model(
        arch_encoder, "ppm_deepsup_embedding", num_class=13, fc_dim=fc_dim,
        dtype=jnp.bfloat16, quant=quant, **qkw)
    rng = np.random.default_rng(0)
    init_img = jnp.zeros((1, *pyramid_shapes[0], 3), jnp.float32)
    if quant != "off":
        from open_world_semantic_segmentation_tpu.ops.quant import (
            calibrate, prequantize)

        m_cal = ModelBuilder.build_segmentation_model(
            arch_encoder, "ppm_deepsup_embedding", num_class=13,
            fc_dim=fc_dim, dtype=jnp.bfloat16, quant="calib", **qkw)
        base = ModelBuilder.build_segmentation_model(
            arch_encoder, "ppm_deepsup_embedding", num_class=13,
            fc_dim=fc_dim, dtype=jnp.bfloat16)
        variables = base.init(jax.random.PRNGKey(0), init_img)
        cal_imgs = [rng.standard_normal(
            (1, *pyramid_shapes[2], 3)).astype(np.float32)]
        variables = calibrate(m_cal, dict(variables), cal_imgs,
                              seg_size=full_size)
        if prequant and quant != "w4a8":
            # w4a8 must quantize in-program: this PJRT stack cannot
            # transfer int4 host<->device (ops/quant.py notes)
            variables = prequantize(variables, mode=quant)
    else:
        variables = model.init(jax.random.PRNGKey(0), init_img)
    if cast_params:
        # cast only the model weights/stats — quant scales (amax/w_scale)
        # are consumed in f32 arithmetic and must stay exact
        variables = {
            k: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v)
            if k in ("params", "batch_stats") else v
            for k, v in variables.items()}

    def eval_image(variables, pyramid):
        scores = None
        for img in pyramid:
            out = model.apply(variables, img, seg_size=full_size)
            # accumulate in the model dtype (bf16) exactly like the
            # driver's multi_scale_forward: materializing an f32 copy of
            # each 720p score map costs ~0.5 GB/img of HBM tail traffic
            # in an HBM-bound program
            s = out["scores"]
            scores = s if scores is None else scores + s
        scores = scores[0].astype(jnp.float32) / len(pyramid)
        conf = dissum_conf(scores)
        pred = jnp.argmax(scores, axis=-1)
        return jnp.sum(pred), jnp.nansum(conf)

    def eval_stream(variables, pyramids):
        """Scan the full per-image pipeline over a stream of images inside
        ONE dispatch. The axon tunnel costs ~20-30 ms per host->device
        dispatch/readback round trip, which would swamp per-image timing;
        on-device sequencing + a single 4-byte readback (the only sync that
        truly waits over the tunnel) measures the hardware, not the tunnel.
        """
        def body(carry, pyr):
            p, c = eval_image(variables, list(pyr))
            return carry + p, c

        total, confs = jax.lax.scan(body, jnp.zeros((), jnp.int32),
                                    pyramids)
        return total, jnp.sum(confs)

    fn = jax.jit(eval_stream)
    pyramids = tuple(
        jnp.asarray(rng.standard_normal((n_imgs, 1, h, w, 3)), jnp.float32)
        for h, w in pyramid_shapes)

    # warmup / compile
    p, c = fn(variables, pyramids)
    float(c), int(p)

    # per-iteration timing -> best-of-k with a recorded spread, so a ±1%
    # wiggle in BENCH_r*.json is attributable to run-to-run noise rather
    # than mistaken for a regression (each iter = n_imgs full pipelines;
    # best-of-k is the standard steady-state estimator — the slower iters
    # carry scheduling noise, not hardware truth)
    iter_times = []
    for _ in range(n_iters):
        tic = time.perf_counter()
        p, c = fn(variables, pyramids)
        float(c)  # sync: forces completion of the whole stream
        iter_times.append(time.perf_counter() - tic)
    best_dt = min(iter_times) / n_imgs
    spread_pct = 100.0 * (max(iter_times) - min(iter_times)) \
        / min(iter_times)

    imgs_per_sec = 1.0 / best_dt
    line = json.dumps({
        "metric": "streethazards_ood_eval",
        "value": round(imgs_per_sec, 4),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / V100_BASELINE_IMGS_PER_SEC, 4),
        "spread_pct": round(spread_pct, 2),
        "n_iters": n_iters,
    })
    print(line)
    return line


if __name__ == "__main__":
    main()
