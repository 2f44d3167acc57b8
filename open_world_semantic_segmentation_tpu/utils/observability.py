"""Observability: structured metrics + profiler hooks.

Replaces the reference's visdom dashboard (utils/visualizer.py) and raw
prints with a JSONL metrics stream (machine-diffable, TensorBoard-ingestable
via a one-line converter) and wraps ``jax.profiler`` for on-demand TPU
traces — the reference has no profiling beyond cuda-sync wall clocks
(SURVEY §5).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class MetricsWriter:
    """Append-only JSONL metrics: one {"step", "time", **scalars} per line."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None.

    View with TensorBoard or xprof: ``tensorboard --logdir <log_dir>``.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
