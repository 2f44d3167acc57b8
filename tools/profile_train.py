#!/usr/bin/env python
"""Capture jax.profiler traces of the two training benches (VERDICT r3 #4).

Traces the EXACT programs tools/bench_dml_train.py (BASELINE config #3:
DML embedding pretrain step) and tools/bench_selfdistill.py (config #4:
FT/PLM self-distillation step) measure — both tools build the program via
the shared ``build_step()`` so the trace is the bench, not a stand-in.

Analyze with tools/analyze_trace.py (remember: its ``ms`` column SUMS over
all events — divide by ``count`` for per-step numbers).

Usage (from the repo root, on the TPU):
    python tools/profile_train.py --which dml        [--out /tmp/dml_train_trace]
    python tools/profile_train.py --which selfdistill [--out /tmp/sd_train_trace]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=["dml", "selfdistill"],
                    required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=8,
                    help="traced steps (after 3 warmup steps)")
    args = ap.parse_args()
    out = args.out or f"/tmp/{args.which}_train_trace"

    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")

    if args.which == "dml":
        from bench_dml_train import build_step
        step_fn, state, batch = build_step()
        loss_of = lambda m: m["loss"]  # noqa: E731
    else:
        from bench_selfdistill import build_step
        step_fn, state, batch = build_step()
        loss_of = lambda m: m  # noqa: E731

    from open_world_semantic_segmentation_tpu.utils.observability import (
        annotate, profile_trace)

    for _ in range(3):  # compile + warm
        state, metrics = step_fn(state, batch)
    float(loss_of(metrics))  # scalar readback = true sync over the tunnel

    with profile_trace(out):
        with annotate(f"{args.which}_train_window"):
            for _ in range(args.steps):
                state, metrics = step_fn(state, batch)
            float(loss_of(metrics))
    print(f"trace written to {out} ({args.steps} steps in window)")


if __name__ == "__main__":
    main()
