#!/usr/bin/env python
"""Cityscapes-eval throughput on one chip (the second headline workload).

BASELINE configs #3/#4 evaluate DeepLabV3+ embedding models on full-res
1024x2048 Cityscapes (DeepLabV3Plus-Pytorch/test_embedding.py): single
forward per image, distance logits vs one-hot centers, argmax. This tool
measures imgs/sec/chip for that program (bf16, and optionally int8 PTQ)
using the same scan-of-images single-dispatch method as bench.py.

Usage:
    python tools/bench_deeplab.py [--quant int8] [--imgs 8] [--iters 2]
        [--height 1024 --width 2048] [--model resnet101] [--batch 1]

``--batch N`` runs N images per dispatch (a throughput mode for offline
sweeps; the recorded per-image number keeps the reference's batch-1
semantics). Measured on v5e: bs1 45-50, bs2 53.2, bs4 55.2 imgs/sec —
batching amortizes the per-image dependency stalls the xplane shows on
the ASPP fusions (tools/probe_deeplab_batch.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(model_depth=101, height=1024, width=2048, n_imgs=8, n_iters=2,
         quant="off", dilated_impl=None, batch=1):
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")
    if dilated_impl:
        os.environ["OWSS_DILATED_IMPL"] = dilated_impl

    import jax
    import jax.numpy as jnp

    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet101,
        deeplabv3plus_embedding_resnet50,
    )

    factory = {101: deeplabv3plus_embedding_resnet101,
               50: deeplabv3plus_embedding_resnet50}[model_depth]
    rng = np.random.default_rng(0)
    model = factory(num_classes=16, dtype=jnp.bfloat16)
    init_x = jnp.zeros((1, height, width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), init_x)
    if quant != "off":
        from open_world_semantic_segmentation_tpu.ops.quant import (
            calibrate_and_prequantize)

        # int8-hybrid on the DeepLab stack = int8 backbone only
        # (models/deeplab.py _split_quant); its calibration twin records
        # amax only where the eval model quantizes
        calib_mode = "calib-hybrid" if quant == "int8-hybrid" else "calib"
        m_cal = factory(num_classes=16, dtype=jnp.bfloat16, quant=calib_mode)
        cal = [rng.standard_normal(
            (1, height, width, 3)).astype(np.float32)]
        variables = calibrate_and_prequantize(m_cal, variables, cal,
                                              mode=quant)
        model = factory(num_classes=16, dtype=jnp.bfloat16, quant=quant)

    def eval_stream(variables, imgs):
        def body(carry, img):
            logits, _, _ = model.apply(variables, img)
            pred = jnp.argmax(logits, axis=-1)
            return carry + jnp.sum(pred), ()

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), imgs)
        return total

    fn = jax.jit(eval_stream)
    n_steps = max(1, n_imgs // batch)
    imgs = jnp.asarray(
        rng.standard_normal((n_steps, batch, height, width, 3)), jnp.float32)
    int(fn(variables, imgs))  # compile + sync (scalar readback)
    tic = time.perf_counter()
    for _ in range(n_iters):
        out = fn(variables, imgs)
    int(out)
    dt = (time.perf_counter() - tic) / (n_iters * n_steps * batch)
    print(json.dumps({
        "metric": f"cityscapes_deeplab{model_depth}_eval",
        "value": round(1.0 / dt, 4),
        "unit": "imgs/sec/chip",
        "quant": quant,
        # under full quant, ConvBN's _quantized_conv takes precedence over
        # the shift path and ASPP uses the concat dataflow — report what
        # ran; int8-hybrid keeps the bf16 head, so its ASPP convs DO run
        # the shift/projection-sum defaults
        "dilated_impl": ("n/a (quant)" if quant in ("int8", "int8-3x3")
                         else os.environ.get("OWSS_DILATED_IMPL", "shift")),
        "batch": batch,
        "input": [height, width],
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=int, default=101, choices=[50, 101])
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--imgs", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--quant", default="off",
                    choices=["off", "int8", "int8-3x3", "int8-hybrid"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dilated-impl", default=None,
                    choices=["shift", "native"],
                    help="override OWSS_DILATED_IMPL (default since round "
                         "4: shift for ASPP-scale dilations; 'native' for "
                         "A/B runs against XLA's conv lowering)")
    args = ap.parse_args()
    main(args.model, args.height, args.width, args.imgs, args.iters,
         args.quant, args.dilated_impl, args.batch)
