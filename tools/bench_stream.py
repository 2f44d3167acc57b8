#!/usr/bin/env python
"""BASELINE config #5 throughput: streaming video segmentation inference.

Measures the demo_video / serving path: SEQUENTIAL single frames (batch
1, no cross-frame batching — a live stream cannot batch ahead) through
the jitted forward + dissum + argmax at a fixed size, INCLUDING the
per-frame host->device transfer and the uint8-label readback. Two input
modes mirror `cli/serve.py`:

- f32: host-normalized float frames (4 bytes/px·ch over the link);
- u8 (``--device-input``): uint8 frames, normalization on device
  (1 byte/px·ch — the transfer-bound win for tunneled/remote chips).

Usage:
    python tools/bench_stream.py [--frames 32] [--height 720 --width 1280]
        [--quant int8] [--device-input]
Prints one JSON line {"metric": "stream_inference", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(height=720, width=1280, n_frames=32, quant="off",
         device_input=False, warmup=3, pipeline_depth=1):
    """``pipeline_depth`` > 1 keeps that many frames in flight (consume
    frame i-depth's labels while dispatching frame i): jax dispatch is
    async, so the host->device transfer of the next frame overlaps the
    current forward — the production streaming configuration. Depth 1 is
    the strict lowest-latency mode (each frame fully consumed before the
    next is sent)."""
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")

    import jax
    import jax.numpy as jnp

    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        dissum_conf)

    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13,
        fc_dim=2048, dtype=jnp.bfloat16, quant=quant)
    rng = np.random.default_rng(0)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, height, width, 3)))
    if quant != "off":
        from open_world_semantic_segmentation_tpu.ops.quant import (
            calibrate_and_prequantize)

        m_cal = ModelBuilder.build_segmentation_model(
            "resnet50dilated", "ppm_deepsup_embedding", num_class=13,
            fc_dim=2048, dtype=jnp.bfloat16, quant="calib")
        cal = [rng.standard_normal((1, height, width, 3)).astype(np.float32)]
        variables = calibrate_and_prequantize(m_cal, variables, cal,
                                              seg_size=(height, width),
                                              mode=quant)

    @jax.jit
    def fwd(variables, frame):
        if device_input:
            from open_world_semantic_segmentation_tpu.data.odgt import (
                device_normalize)

            frame = device_normalize(frame)
        out = model.apply(variables, frame, seg_size=(height, width))
        scores = out["scores"][0]
        return (jnp.argmax(scores, axis=-1).astype(jnp.uint8),
                jnp.nansum(dissum_conf(scores)))

    if device_input:
        frames = [rng.integers(0, 255, (1, height, width, 3), dtype=np.uint8)
                  for _ in range(n_frames)]
    else:
        frames = [rng.standard_normal(
            (1, height, width, 3)).astype(np.float32)
            for _ in range(n_frames)]

    for f in frames[:warmup]:
        pred, c = fwd(variables, f)
    np.asarray(pred)  # full label-map readback = the streaming consumer

    from collections import deque

    tic = time.perf_counter()
    pending = deque()
    for f in frames:
        pending.append(fwd(variables, f))
        if len(pending) >= max(1, pipeline_depth):
            pred, _ = pending.popleft()
            np.asarray(pred)  # consume labels (sync)
    while pending:
        pred, _ = pending.popleft()
        np.asarray(pred)
    dt = (time.perf_counter() - tic) / n_frames
    print(json.dumps({
        "metric": "stream_inference",
        "value": round(1.0 / dt, 4),
        "unit": "frames/sec/chip",
        "input": "uint8" if device_input else "float32",
        "quant": quant,
        "pipeline_depth": pipeline_depth,
        "frame_ms": round(1000 * dt, 2),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--quant", choices=["off", "int8", "int8-3x3", "w4a8"],
                    default="off")
    ap.add_argument("--device-input", action="store_true")
    ap.add_argument("--pipeline-depth", type=int, default=1,
                    help="frames in flight (overlap transfer w/ compute)")
    args = ap.parse_args()
    main(args.height, args.width, args.frames, args.quant,
         args.device_input, pipeline_depth=args.pipeline_depth)
