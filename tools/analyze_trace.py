#!/usr/bin/env python
"""Summarize a jax.profiler trace: top device ops by self time.

Parses the xplane protobuf written by ``tools/profile_eval.py`` (no
tensorboard UI needed) and prints the top-N ops on the device plane with
their total/self durations and occurrence counts — the input for
perf-roadmap decisions (which fusion/op actually dominates).

Usage:
    python tools/analyze_trace.py /tmp/owss_trace [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import os
from collections import defaultdict


def find_xplane(logdir: str) -> str:
    pats = [os.path.join(logdir, "**", "*.xplane.pb")]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[-1]
    raise SystemExit(f"no .xplane.pb under {logdir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    # the xplane proto ships in different places per TF/tensorboard
    # version; this tool needs any ONE of them (dev-only dependency)
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tensorboard_plugin_profile.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise SystemExit(
            "no xplane proto module available — install tensorflow or "
            "tensorboard_plugin_profile to analyze traces")

    path = find_xplane(args.logdir)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        is_device = plane.name.startswith(("/device:TPU:", "/device:tpu:")) \
            or "TPU" in plane.name or "Device" in plane.name
        if not is_device or "CUPTI" in plane.name:
            continue
        ev_names = dict(plane.event_metadata.items())
        for line in plane.lines:
            totals = defaultdict(lambda: [0.0, 0])  # name -> [ps, count]
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[name][0] += ev.duration_ps
                totals[name][1] += 1
            if not totals:
                continue
            grand = sum(v[0] for v in totals.values())
            print(f"\n== {plane.name} | line: {line.name!r} "
                  f"(sum {grand / 1e12 * 1e3:.2f} ms, "
                  f"{sum(v[1] for v in totals.values())} events) ==")
            print(f"{'op':<58} {'ms':>9} {'%':>6} {'count':>7}")
            for name, (ps, n) in sorted(totals.items(),
                                        key=lambda kv: -kv[1][0])[:args.top]:
                print(f"{name[:58]:<58} {ps / 1e12 * 1e3:9.3f} "
                      f"{100 * ps / grand:6.2f} {n:7d}")


if __name__ == "__main__":
    main()
