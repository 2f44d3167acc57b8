#!/usr/bin/env python
"""Inspect saved eval artifacts: result PNGs, score maps, logit histograms.

Equivalent of the reference's ad-hoc probe scripts ``anomaly/Read_img.py``
and ``DeepLabV3Plus-Pytorch/Read_img.py`` (both mostly commented-out
matplotlib viewers), rebuilt as a real headless-friendly CLI:

- ``artifacts <dir>``: scan an eval results directory (the [image|gt|pred]
  grids from ``utils/visualize.save_result_grid``, the pred PNGs from
  ``cli/test_closed`` / ``cli/test_deeplab --save-val-results``, any
  ``*.npy`` score maps), print shape/range stats, and optionally render a
  contact sheet (reference: Read_img.py:5-33, the Image.open/imshow block).
- ``hist <file>``: per-class score histograms from either a JSON in the
  reference's ``logit_dict.json`` layout (anomaly/Read_img.py:36-43:
  ``len(json_data[i])`` + ``plt.hist``) or a fitted
  ``openset.calibration.ScoreCalibration`` .npz (``samples_<cl>`` arrays).

The third block of the reference's DeepLab Read_img.py (a bdlb
Fishyscapes random-estimator smoke, Read_img.py:36-49) is covered by
``openset/fishyscapes.py`` and its tests.

Usage:
    python tools/inspect_results.py artifacts ckpt/result --out sheet.png
    python tools/inspect_results.py hist logit_dict.json --out hists.png
    python tools/inspect_results.py hist calib.npz --out hists.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _plt(show: bool):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def inspect_artifacts(directory, out=None, show=False, limit=12):
    """Print stats for every PNG/NPY artifact; optionally contact-sheet."""
    from PIL import Image

    names = sorted(os.listdir(directory))
    pngs = [n for n in names if n.lower().endswith(".png")]
    npys = [n for n in names if n.endswith(".npy")]
    entries = []
    for n in pngs[:limit]:
        arr = np.asarray(Image.open(os.path.join(directory, n)))
        entries.append((n, arr, "image"))
        print(f"{n}: shape={arr.shape} dtype={arr.dtype} "
              f"range=[{arr.min()}, {arr.max()}]")
    for n in npys[:limit]:
        arr = np.load(os.path.join(directory, n))
        entries.append((n, arr, "map"))
        print(f"{n}: shape={arr.shape} dtype={arr.dtype} "
              f"range=[{arr.min():.4g}, {arr.max():.4g}] "
              f"mean={arr.mean():.4g}")
    skipped = len(pngs) + len(npys) - len(entries)
    if skipped > 0:
        print(f"... {skipped} more artifacts (raise --limit to include)")
    if not entries:
        print(f"no .png/.npy artifacts under {directory}")
        return []
    if out or show:
        plt = _plt(show)
        cols = min(3, len(entries))
        rows = (len(entries) + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(6 * cols, 3.5 * rows),
                                 squeeze=False)
        for ax in axes.flat:
            ax.axis("off")
        for ax, (n, arr, kind) in zip(axes.flat, entries):
            if kind == "map" or arr.ndim == 2:
                im = ax.imshow(arr, cmap="magma")
                fig.colorbar(im, ax=ax, fraction=0.025)
            else:
                ax.imshow(arr)
            ax.set_title(n, fontsize=8)
        fig.tight_layout()
        if out:
            fig.savefig(out, dpi=110)
            print(f"contact sheet -> {out}")
        if show:
            plt.show()
    return entries


def _load_samples(path):
    """Per-class sample arrays from logit_dict-style JSON or calib npz."""
    if path.endswith(".npz"):
        z = np.load(path)
        classes = sorted(int(k.split("_")[1]) for k in z.files
                         if k.startswith("samples_"))
        return {cl: np.asarray(z[f"samples_{cl}"]) for cl in classes}
    with open(path, encoding="utf8") as fp:
        data = json.load(fp)
    if isinstance(data, dict):
        return {int(k): np.asarray(v, np.float64) for k, v in data.items()}
    return {i: np.asarray(v, np.float64) for i, v in enumerate(data)}


def inspect_hist(path, out=None, show=False, bins=50):
    """Per-class histograms (anomaly/Read_img.py:36-43 made headless)."""
    samples = _load_samples(path)
    for cl, s in sorted(samples.items()):
        print(f"class {cl}: n={s.size}" + (
            f" range=[{s.min():.4g}, {s.max():.4g}] "
            f"mean={s.mean():.4g}" if s.size else ""))
    if out or show:
        plt = _plt(show)
        n = len(samples)
        cols = min(4, max(n, 1))
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(4 * cols, 2.6 * rows),
                                 squeeze=False)
        for ax in axes.flat:
            ax.axis("off")
        for ax, (cl, s) in zip(axes.flat, sorted(samples.items())):
            ax.axis("on")
            if s.size:
                ax.hist(s, bins=bins)
            ax.set_title(f"class {cl} (n={s.size})", fontsize=9)
        fig.tight_layout()
        if out:
            fig.savefig(out, dpi=110)
            print(f"histograms -> {out}")
        if show:
            plt.show()
    return samples


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="mode", required=True)
    a = sub.add_parser("artifacts", help="inspect a results directory")
    a.add_argument("directory")
    a.add_argument("--out", help="contact-sheet PNG path")
    a.add_argument("--show", action="store_true")
    a.add_argument("--limit", type=int, default=12)
    h = sub.add_parser("hist", help="per-class score histograms")
    h.add_argument("path", help="logit_dict.json-style JSON or calib .npz")
    h.add_argument("--out", help="histogram grid PNG path")
    h.add_argument("--show", action="store_true")
    h.add_argument("--bins", type=int, default=50)
    args = ap.parse_args(argv)
    if args.mode == "artifacts":
        inspect_artifacts(args.directory, out=args.out, show=args.show,
                          limit=args.limit)
    else:
        inspect_hist(args.path, out=args.out, show=args.show,
                     bins=args.bins)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into `head`
        sys.exit(0)
