#!/usr/bin/env python
"""BASELINE config #3 throughput: DML embedding training step.

Measures the StreetHazards DML pretraining program (the reference's
train_embedding.py loop): CSAIL ResNet-50-dilated + PPM-embedding
decoder, batch 8 at 304x536 (the recipe's smallest scale bucket),
loss = CE/n + 0.01*VAR/n, one donated jitted step, bf16 compute.

Timing is amortized-sync (a window of steps enqueued, one blocking
readback): that is how the real training loop runs with async dispatch
and prefetched input. Per-step scalar syncs add the ~10-30 ms fixed
axon-tunnel round trip to every step (docs/DESIGN.md round-3 audit).

Usage:
    python tools/bench_dml_train.py [--batch 8] [--h 304] [--w 536]
Prints one JSON line {"metric": "dml_embedding_train", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step(batch=8, h=304, w=536):
    """Construct the config-#3 training program: returns
    ``(step_fn, state, batch_dict)`` so the bench and the trace tool
    (tools/profile_train.py) measure the SAME program."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_world_semantic_segmentation_tpu.cli._common import (
        build_anomaly_model)
    from open_world_semantic_segmentation_tpu.core.config import Config
    from open_world_semantic_segmentation_tpu.train import (
        TrainState, make_anomaly_train_step)
    from open_world_semantic_segmentation_tpu.train.optim import torch_sgd

    cfg = Config()
    cfg.DATASET.num_class = 13
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 2048
    model = build_anomaly_model(cfg, train=True, use_softmax=False,
                                dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32))
    tx = torch_sgd(lambda s: 0.02, 0.9, 1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    step_fn = make_anomaly_train_step(model, alpha=0.01,
                                      rng=jax.random.PRNGKey(0))
    labels = np.asarray(rng.integers(-1, 13, (batch, h // 8, w // 8)),
                        np.int32)
    batch_np = {
        "img_data": jnp.asarray(
            rng.standard_normal((batch, h, w, 3)), jnp.float32),
        "seg_label": jnp.asarray(labels),
    }
    return step_fn, state, batch_np


def main(batch=8, h=304, w=536, windows=4, window=10):
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")

    step_fn, state, batch_np = build_step(batch, h, w)
    for _ in range(2):
        state, metrics = step_fn(state, batch_np)
    float(metrics["loss"])  # true sync: scalar readback (axon gotcha:
    # block_until_ready returns before execution finishes over the tunnel)

    times = []
    for _ in range(windows):
        tic = time.perf_counter()
        for _ in range(window):
            state, metrics = step_fn(state, batch_np)
        float(metrics["loss"])  # one readback per window
        times.append((time.perf_counter() - tic) / window)
    best = min(times)
    print(json.dumps({
        "metric": "dml_embedding_train",
        "value": round(batch / best, 4),
        "unit": "imgs/sec/chip",
        "batch": batch, "h": h, "w": w,
        "step_ms": round(1000 * best, 2),
        "spread_pct": round(100 * (max(times) - best) / best, 2),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--h", type=int, default=304)
    ap.add_argument("--w", type=int, default=536)
    args = ap.parse_args()
    main(batch=args.batch, h=args.h, w=args.w)
