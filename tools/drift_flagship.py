#!/usr/bin/env python
"""int8/w4a8 metric drift on TRAINED flagship weights (VERDICT r2 #3).

Trains the flagship model (resnet50dilated + ppm_deepsup_embedding)
briefly on a synthetic StreetHazards tree — enough steps for the score
maps to acquire structure — then evaluates the SAME checkpoint through
the real eval driver at each precision and prints the metric deltas.

The CPU counterpart (resnet18, asserted bounds) is
tests/test_quant_drift.py; this tool produces the chip-measured flagship
numbers recorded in docs/DESIGN.md.

Usage:
    python tools/drift_flagship.py [--steps 60] [--imgs 4]
        [--modes int8 int8-3x3 w4a8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(steps=60, n_eval=4, modes=("int8", "int8-3x3", "w4a8"),
         h=304, w=536, workdir=None):
    from make_synthetic_data import make_streethazards

    from open_world_semantic_segmentation_tpu.cli import (
        eval_ood, train_embedding)
    from open_world_semantic_segmentation_tpu.core.config import Config

    workdir = workdir or tempfile.mkdtemp(prefix="owss_drift_")
    root = make_streethazards(os.path.join(workdir, "sh"),
                              n_train=12, n_val=n_eval, h=h, w=w)
    cfg = Config()
    cfg.DIR = os.path.join(workdir, "ckpt")
    cfg.DATASET.root_dataset = root
    cfg.DATASET.list_train = os.path.join(root, "train.odgt")
    cfg.DATASET.list_val = os.path.join(root, "val.odgt")
    cfg.DATASET.num_class = 13
    # single scale: drift is a numerics question, not a pyramid one, and
    # each extra scale is another cold compile over the tunnel
    cfg.DATASET.imgSizes = (200,)
    cfg.DATASET.imgMaxSize = 500
    cfg.MODEL.arch_encoder = "resnet50dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 2048
    cfg.TRAIN.batch_size_per_gpu = 4
    cfg.TRAIN.num_epoch = 1
    cfg.TRAIN.epoch_iters = steps
    cfg.TRAIN.disp_iter = max(steps // 3, 1)
    cfg.TRAIN.lr_encoder = 0.02
    cfg.TRAIN.lr_decoder = 0.02

    print(f"training flagship for {steps} steps ...", flush=True)
    train_embedding.main(cfg, jnp.bfloat16, max_steps=steps)
    ckpt = os.path.join(cfg.DIR, "model_epoch_1.pkl")

    def run(quant):
        c = cfg.clone()
        c.MODEL.weights_encoder = ckpt
        c.OOD.ood = "dissum"
        kw = {"quant": quant, "calib_images": 2} if quant != "off" else {}
        r = eval_ood.main(c, jnp.bfloat16, max_images=n_eval, **kw)
        return {k: r[k] for k in ("auroc", "aupr", "fpr", "mean_iou",
                                  "accuracy") if k in r}

    base = run("off")
    report = {"bf16": base}
    for mode in modes:
        r = run(mode)
        report[mode] = r
        report[f"{mode}_delta"] = {
            k: (round(r[k] - base[k], 5)
                if r.get(k) is not None and base.get(k) is not None
                else None)
            for k in base}
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--imgs", type=int, default=4)
    ap.add_argument("--modes", nargs="*",
                    default=["int8", "int8-3x3", "w4a8"])
    args = ap.parse_args()
    main(steps=args.steps, n_eval=args.imgs, modes=args.modes)
