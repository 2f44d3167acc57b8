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


def _hsv_palette(n, s=0.85, v=0.9):
    """n well-separated saturated RGB colors (evenly spaced hues)."""
    import colorsys

    cols = []
    for i in range(n):
        r, g, b = colorsys.hsv_to_rgb(i / n, s, v)
        cols.append((int(r * 255), int(g * 255), int(b * 255)))
    return np.array(cols, np.uint8)


ANOMALY_COLOR = (128, 128, 128)  # mid-gray: inside the palette's hull, unseen


def make_streethazards_learnable(root, n_train=48, n_val=13, h=128, w=192,
                                 seed=0, noise=18.0, min_block=16,
                                 n_class=13, class_strip=False, n_blobs=10):
    """A LEARNABLE StreetHazards-style odgt tree (golden convergence task).

    Unlike ``make_streethazards`` (noise images — nothing to learn), every
    class k in 1..n_class has a distinctive saturated color signature
    (+ gaussian pixel noise), so a conv net can learn the pixel->class map
    and the DML embedding head can converge. The anomaly class (raw id
    n_class+1 -> pipeline id n_class, the default ``OOD.out_labels``) appears
    ONLY in val images and carries a held-out color (mid-gray) never seen in
    training — the open-set condition of anomaly/eval_ood_traditional.py.
    """
    rng = np.random.default_rng(seed)
    palette = _hsv_palette(n_class)

    def snap(v):  # align region edges to the /8 label grid so the
        return int(v) // 8 * 8  # downsampled training labels stay pure

    records = {"train": [], "val": []}
    for split, n in (("train", n_train), ("val", n_val)):
        sub = "training" if split == "train" else "test"
        for i in range(n):
            lab = np.full((h, w), 1 + (i % n_class), np.uint8)
            # fewer/larger blobs -> lower boundary density. The /8 logit
            # upsample blurs ~4px around every region edge, so boundary
            # pixels (inherently ambiguous, like the reference's real
            # data) bound both mIoU and the dissum false-positive rate.
            for _ in range(n_blobs):
                r0 = snap(rng.integers(0, h - min_block))
                c0 = snap(rng.integers(0, w - min_block))
                rh = snap(rng.integers(min_block, h // 2)) or 8
                rw = snap(rng.integers(min_block, w // 2)) or 8
                lab[r0:r0 + rh, c0:c0 + rw] = rng.integers(1, n_class + 1)
            # presence guarantee: the base fill cycles through the classes,
            # so with n_val >= n_class every class dominates one val image
            # (a class absent from ALL val images would score IoU 0/0 -> 0
            # under the reference's intersectionAndUnion and unfairly sink
            # the mean). The optional 8px class strip instead guarantees
            # presence in EVERY image but its 1-feature-pixel cells are
            # systematically hard at /8 resolution — off by default.
            if class_strip:
                assert w >= n_class * 8, "image too narrow for class strip"
                for k in range(n_class):
                    lab[0:8, k * 8:(k + 1) * 8] = k + 1
            if split == "val":
                # one anomaly blob per val image, raw id n_class+1 —
                # placed below the class strip so the strip's guarantee
                # holds in every image
                bh, bw = snap(h // 4) or 8, snap(w // 4) or 8
                r0 = 8 + snap(rng.integers(0, h - 8 - bh))
                c0 = snap(rng.integers(0, w - bw))
                lab[r0:r0 + bh, c0:c0 + bw] = n_class + 1
            colors = np.concatenate([palette,
                                     np.array([ANOMALY_COLOR], np.uint8)])
            img = colors[lab - 1].astype(np.float32)
            img += rng.normal(0.0, noise, img.shape)
            img = np.clip(img, 0, 255).astype(np.uint8)
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


def make_streethazards_mixed(root, sizes=((48, 64), (64, 48), (48, 96)),
                             n_per_size=2, seed=0):
    """Heterogeneous-size odgt tree (val only): ``n_per_size`` images per
    (h, w) in ``sizes`` with an anomaly blob each — the eval pipeline
    produces a DIFFERENT pyramid shape set per source size, exercising the
    evaluator's shape-group batching (SURVEY §7 "Dynamic shapes")."""
    rng = np.random.default_rng(seed)
    records = []
    i = 0
    for h, w in sizes:
        for _ in range(n_per_size):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            lab = np.full((h, w), 8, np.uint8)
            for _ in range(5):
                r0, c0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
                lab[r0:r0 + rng.integers(4, h // 2),
                    c0:c0 + rng.integers(4, w // 2)] = rng.integers(1, 14)
            r0, c0 = rng.integers(0, h - 10), rng.integers(0, w - 12)
            lab[r0:r0 + 8, c0:c0 + 10] = 14  # anomaly id (raw)
            ip = f"images/test/t1/{i}.png"
            ap = f"annotations/test/t1/{i}.png"
            for p, arr, mode in ((ip, img, "RGB"), (ap, lab, "L")):
                full = os.path.join(root, p)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                Image.fromarray(arr, mode).save(full)
            records.append({"fpath_img": ip, "fpath_segm": ap,
                            "height": h, "width": w,
                            "dbName": "StreetHazards"})
            i += 1
    with open(os.path.join(root, "val.odgt"), "w") as f:
        f.write(json.dumps(records) + "\n")
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


# the 19 cityscapes train-class raw label ids (data/cityscapes.py table)
CITYSCAPES_TRAIN_RAW_IDS = (7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24,
                            25, 26, 27, 28, 31, 32, 33)


def make_cityscapes_learnable(root, splits=("train", "val"), n=8, h=96,
                              w=192, seed=1, noise=10.0):
    """A LEARNABLE Cityscapes-style tree (golden NPM task).

    Each of the 19 train classes carries a distinctive color signature; an
    8px class strip guarantees presence of every class in every image, and
    each image additionally features ONE large block of a cycling class —
    images featuring car (raw id 26) are the k-shot NPM support images
    (car covers ~11% > the 5% extraction threshold,
    test_embedding.py:414-415).
    """
    rng = np.random.default_rng(seed)
    raw_ids = np.array(CITYSCAPES_TRAIN_RAW_IDS, np.uint8)
    palette = _hsv_palette(len(raw_ids))
    color_of = np.zeros((34, 3), np.float32)
    color_of[raw_ids] = palette
    assert w >= len(raw_ids) * 8, "image too narrow for class strip"

    def snap(v):
        return int(v) // 8 * 8

    for split in splits:
        city = "synthcity"
        img_dir = os.path.join(root, "leftImg8bit", split, city)
        gt_dir = os.path.join(root, "gtFine", split, city)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        for i in range(n):
            lab = np.full((h, w), raw_ids[(i + 7) % len(raw_ids)], np.uint8)
            for _ in range(8):
                r0, c0 = snap(rng.integers(0, h - 8)), snap(
                    rng.integers(0, w - 8))
                rh = snap(rng.integers(16, h // 2)) or 8
                rw = snap(rng.integers(16, w // 2)) or 8
                lab[r0:r0 + rh, c0:c0 + rw] = rng.choice(raw_ids)
            # presence strip (every class in every image)
            for k, rid in enumerate(raw_ids):
                lab[0:8, k * 8:(k + 1) * 8] = rid
            # featured class block (cycling; car images = NPM support)
            feat = raw_ids[i % len(raw_ids)]
            fh, fw = snap(h // 3) or 8, snap(w // 3) or 8
            r0 = 8 + snap(rng.integers(0, h - 8 - fh))
            c0 = snap(rng.integers(0, w - fw))
            lab[r0:r0 + fh, c0:c0 + fw] = feat
            img = color_of[lab]
            img += rng.normal(0.0, noise, img.shape)
            img = np.clip(img, 0, 255).astype(np.uint8)
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
