#!/usr/bin/env python
"""Generate miniature synthetic datasets for tests and end-to-end drives.

Creates:
- a StreetHazards-style odgt tree (images/ annotations/ + .odgt lists) with
  720x1280-scaled-down images (default 72x128) and labels 1..14 (raw file
  values; the pipeline shifts to 0..13 where 13 = anomaly);
- a Cityscapes-style tree (leftImg8bit/<split>/<city>/, gtFine/...) with raw
  label ids 0..33.

Usage: python tools/make_synthetic_data.py <out_dir> [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image


def make_streethazards(root, n_train=4, n_val=3, h=72, w=128, seed=0):
    rng = np.random.default_rng(seed)
    records = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        sub = "training" if split == "train" else "test"
        for i in range(n):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            # blocky labels 1..13 plus an anomaly blob (14) in val images
            lab = np.full((h, w), 8, np.uint8)
            for _ in range(6):
                r0, c0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
                lab[r0:r0 + rng.integers(4, h // 2),
                    c0:c0 + rng.integers(4, w // 2)] = rng.integers(1, 14)
            if split == "val":
                r0, c0 = rng.integers(0, h - 12), rng.integers(0, w - 16)
                lab[r0:r0 + 10, c0:c0 + 14] = 14  # anomaly id (raw)
            ip = f"images/{sub}/t1/{i}.png"
            ap = f"annotations/{sub}/t1/{i}.png"
            for p, arr, mode in ((ip, img, "RGB"), (ap, lab, "L")):
                full = os.path.join(root, p)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                Image.fromarray(arr, mode).save(full)
            records[split].append({"fpath_img": ip, "fpath_segm": ap,
                                   "height": h, "width": w,
                                   "dbName": "StreetHazards"})
    for split in ("train", "val"):
        with open(os.path.join(root, f"{split}.odgt"), "w") as f:
            f.write(json.dumps(records[split]) + "\n")
    return root


def make_cityscapes(root, splits=("train", "val"), n=3, h=96, w=192, seed=1):
    rng = np.random.default_rng(seed)
    for split in splits:
        city = "synthcity"
        img_dir = os.path.join(root, "leftImg8bit", split, city)
        gt_dir = os.path.join(root, "gtFine", split, city)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            lab = np.full((h, w), 7, np.uint8)  # road
            for _ in range(8):
                r0, c0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
                lab[r0:r0 + rng.integers(4, h // 2),
                    c0:c0 + rng.integers(4, w // 2)] = rng.integers(0, 34)
            # guarantee some car/truck/bus pixels (ids 26, 27, 28)
            lab[:10, :20] = 26
            lab[-10:, :20] = 27
            lab[-10:, -20:] = 28
            stem = f"{city}_{i:06d}_000019"
            Image.fromarray(img, "RGB").save(
                os.path.join(img_dir, f"{stem}_leftImg8bit.png"))
            Image.fromarray(lab, "L").save(
                os.path.join(gt_dir, f"{stem}_gtFine_labelIds.png"))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    sh = make_streethazards(os.path.join(args.out_dir, "streethazards"),
                            seed=args.seed)
    cs = make_cityscapes(os.path.join(args.out_dir, "cityscapes"),
                         seed=args.seed + 1)
    print(json.dumps({"streethazards": sh, "cityscapes": cs}))


if __name__ == "__main__":
    main()
