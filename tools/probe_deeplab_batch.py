#!/usr/bin/env python
"""Probe: does batching the full-res DeepLab eval raise imgs/sec/chip?

BASELINE config #2 (test_embedding.py validate: one 1024x2048 image per
forward) is measured per-image by tools/bench_deeplab.py. This probe runs
the same program with batch 2/4 per dispatch to see whether the per-image
dependency stalls (ASPP fusions at ~15% apparent MXU util in the xplane)
amortize across a batch. Same scan-of-images single-dispatch timing.

Usage: python tools/probe_deeplab_batch.py [--batches 1 2 4] [--imgs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(batch, n_imgs, height, width, model_depth=101):
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
    init_x = jnp.zeros((batch, height, width, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), init_x)

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
        rng.standard_normal((n_steps, batch, height, width, 3)), np.float32)
    int(fn(variables, imgs))  # compile + sync
    best = None
    for _ in range(3):
        tic = time.perf_counter()
        int(fn(variables, imgs))
        dt = (time.perf_counter() - tic) / (n_steps * batch)
        best = dt if best is None else min(best, dt)
    return 1.0 / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--imgs", type=int, default=8)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--model", type=int, default=101)
    args = ap.parse_args()
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")
    out = {}
    for b in args.batches:
        out[f"bs{b}"] = round(run(b, args.imgs, args.height, args.width,
                                  args.model), 2)
        print(json.dumps({"batch": b, "imgs_per_sec": out[f"bs{b}"]}),
              flush=True)
    print(json.dumps({"metric": "deeplab_eval_batch_probe", "results": out}))


if __name__ == "__main__":
    main()
