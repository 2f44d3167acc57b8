#!/usr/bin/env python
"""Golden convergence run: prove the training stack LEARNS open-set behavior.

Trains an embedding (DML) model with the real ``cli/train_embedding`` recipe
on the LEARNABLE synthetic StreetHazards task (tools/make_synthetic_data.py
make_streethazards_learnable: color-coded classes, a held-out anomaly color
appearing only in val), then runs the real ``cli/eval_ood`` driver with
dissum and msp scoring — the exact pipeline of
anomaly/train_embedding.py:20-75 + anomaly/eval_ood_traditional.py:301-450.

Success criteria (VERDICT r3 #1):
  - closed-set mIoU >= 0.8 on the 13 seen classes,
  - dissum AUROC >= 0.9 on the held-out anomaly class,
  - dissum AUROC >= msp AUROC on the same checkpoint.

The chip flagship run (resnet50dilated + ppm_deepsup_embedding) records its
numbers in docs/DESIGN.md; the scaled-down CPU variant is asserted in
tests/test_golden_convergence.py.

Usage:
    python tools/golden_run.py                       # flagship, on-chip
    python tools/golden_run.py --encoder resnet18dilated --steps 200 \
        --img-size 80 --h 96 --w 144                 # small/CPU probe
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run(encoder="resnet50dilated", decoder="ppm_deepsup_embedding",
        steps=300, bs=8, lr=0.02, img_size=96, h=128, w=192,
        n_train=48, n_val=13, seed=0, workdir=None,
        methods=("dissum", "msp"), precision=jnp.bfloat16,
        eval_precision=None, num_epoch=1, noise=18.0,
        n_blobs=10, min_block=16):
    """Train with the real recipe, eval with the real driver; returns the
    full report dict {"train": {...}, "<method>": {auroc, aupr, fpr,
    mean_iou, accuracy}, "criteria": {...}}."""
    from make_synthetic_data import make_streethazards_learnable

    from open_world_semantic_segmentation_tpu.cli import (
        eval_ood, train_embedding)
    from open_world_semantic_segmentation_tpu.core.config import Config

    workdir = workdir or tempfile.mkdtemp(prefix="owss_golden_")
    root = make_streethazards_learnable(
        os.path.join(workdir, "sh"), n_train=n_train, n_val=n_val,
        h=h, w=w, seed=seed, noise=noise, n_blobs=n_blobs,
        min_block=min_block)

    cfg = Config()
    cfg.DIR = os.path.join(workdir, "ckpt")
    cfg.DATASET.root_dataset = root
    cfg.DATASET.list_train = os.path.join(root, "train.odgt")
    cfg.DATASET.list_val = os.path.join(root, "val.odgt")
    cfg.DATASET.num_class = 13
    cfg.DATASET.imgSizes = (img_size,)
    cfg.DATASET.imgMaxSize = int(img_size * 2.5)
    cfg.MODEL.arch_encoder = encoder
    cfg.MODEL.arch_decoder = decoder
    cfg.MODEL.fc_dim = {"resnet18dilated": 512,
                        "resnet34dilated": 512}.get(encoder, 2048)
    cfg.TRAIN.batch_size_per_gpu = bs
    cfg.TRAIN.num_epoch = num_epoch
    cfg.TRAIN.epoch_iters = (steps + num_epoch - 1) // num_epoch
    cfg.TRAIN.disp_iter = max(steps // 10, 1)
    cfg.TRAIN.lr_encoder = lr
    cfg.TRAIN.lr_decoder = lr
    cfg.TRAIN.seed = seed

    print(f"[golden] training {encoder}+{decoder} for {steps} steps "
          f"(bs={bs}, lr={lr}, img_size={img_size}) ...", flush=True)
    state = train_embedding.main(cfg, precision, max_steps=steps)
    ckpt = os.path.join(cfg.DIR, f"model_epoch_{num_epoch}.pkl")

    report = {"train": {"steps": steps, "encoder": encoder,
                        "decoder": decoder}}
    for method in methods:
        c = cfg.clone()
        c.MODEL.weights_encoder = ckpt
        c.OOD.ood = method
        r = eval_ood.main(c, eval_precision or precision)
        report[method] = {k: r.get(k) for k in
                          ("auroc", "aupr", "fpr", "mean_iou", "accuracy")}
        print(f"[golden] {method}: " + json.dumps(report[method]),
              flush=True)

    miou = report.get("dissum", report[methods[0]])["mean_iou"]
    d_auroc = report.get("dissum", {}).get("auroc")
    m_auroc = report.get("msp", {}).get("auroc")
    report["criteria"] = {
        "closed_miou_ge_0.8": miou is not None and miou >= 0.8,
        "dissum_auroc_ge_0.9": d_auroc is not None and d_auroc >= 0.9,
        "dissum_ge_msp": (d_auroc is not None and m_auroc is not None
                          and d_auroc >= m_auroc),
    }
    print(json.dumps(report, indent=2, default=float))
    return report


def run_cityscapes(model="deeplabv3plus_embedding_resnet50", steps=400,
                   bs=4, lr=0.05, crop=96, h=96, w=192, n_train=19, n_val=4,
                   seed=0, workdir=None, precision=jnp.bfloat16,
                   noise=10.0, shots=5):
    """Cityscapes 16+1 NPM golden shape (VERDICT r3 #1, second half):
    short base train of the 16-class embedding model with the real
    ``cli/main_deeplab`` recipe on the learnable synthetic tree, extract
    k-shot car prototypes with the real ``cli/extract_prototypes``, then
    run the real ``cli/eval_embedding`` NPM eval — the novel-class (car,
    id 16) IoU with the prototype override must beat the no-override
    baseline (which cannot predict 16 at all, test_embedding.py:428-451).
    """
    from make_synthetic_data import make_cityscapes_learnable

    from open_world_semantic_segmentation_tpu.cli import (
        eval_embedding, extract_prototypes, main_deeplab)
    from open_world_semantic_segmentation_tpu.core.config import Config

    workdir = workdir or tempfile.mkdtemp(prefix="owss_golden_cs_")
    root = os.path.join(workdir, "cs")
    make_cityscapes_learnable(root, splits=("train",), n=n_train, h=h, w=w,
                              seed=seed, noise=noise)
    make_cityscapes_learnable(root, splits=("val",), n=n_val, h=h, w=w,
                              seed=seed + 1, noise=noise)

    cfg = Config()
    cfg.DIR = os.path.join(workdir, "ckpt")
    cfg.DATASET.root_dataset = root
    cfg.DEEPLAB.model = model
    cfg.DEEPLAB.num_classes = 16
    cfg.DEEPLAB.crop_size = crop
    cfg.DEEPLAB.batch_size = bs
    cfg.DEEPLAB.lr = lr
    cfg.DEEPLAB.total_itrs = steps
    cfg.DEEPLAB.val_interval = steps  # one validation+best-save at the end
    cfg.DEEPLAB.random_seed = seed
    cfg.FEWSHOT.prototype_file = os.path.join(workdir, "proto_car.json")
    cfg.FEWSHOT.shots = shots

    print(f"[golden-cs] training {model} for {steps} steps ...", flush=True)
    main_deeplab.main(cfg, precision, max_steps=steps)
    cfg.MODEL.weights_encoder = os.path.join(cfg.DIR, "best.pkl")

    protos = extract_prototypes.main(cfg, precision, split="train")
    report = {"train": {"model": model, "steps": steps},
              "prototypes": len(protos)}

    score = eval_embedding.main(cfg, precision)
    novel_iou = float(score["Class IoU"][16])
    base_miou = float(np.mean([score["Class IoU"][i] for i in range(16)]))

    # no-override baseline: threshold no pixel can beat -> the base head
    # alone, which has no class 16
    c0 = cfg.clone()
    c0.FEWSHOT.npm_dis_threshold = 1e9
    score0 = eval_embedding.main(c0, precision)
    novel_iou0 = float(score0["Class IoU"][16])

    report.update({
        "npm": {"novel_iou": novel_iou, "base_miou": base_miou,
                "miou": float(score["Mean IoU"])},
        "no_override": {"novel_iou": novel_iou0,
                        "miou": float(score0["Mean IoU"])},
        "criteria": {"npm_beats_no_override": novel_iou > novel_iou0,
                     "novel_iou_positive": novel_iou > 0.1},
    })
    print(json.dumps(report, indent=2, default=float))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="resnet50dilated")
    ap.add_argument("--decoder", default="ppm_deepsup_embedding")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--img-size", type=int, default=96)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--w", type=int, default=192)
    ap.add_argument("--n-train", type=int, default=48)
    # n_val >= n_class: the presence guarantee (each class dominates one
    # val image) only holds when the val split cycles through all classes
    ap.add_argument("--n-val", type=int, default=13)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=18.0)
    ap.add_argument("--n-blobs", type=int, default=10)
    ap.add_argument("--min-block", type=int, default=16)
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp32"])
    ap.add_argument("--eval-precision", default=None,
                    choices=["bf16", "fp32"],
                    help="eval dtype (default: same as --precision); the "
                         "reference evals fp32")
    ap.add_argument("--task", default="streethazards",
                    choices=["streethazards", "cityscapes"])
    ap.add_argument("--deeplab-model",
                    default="deeplabv3plus_embedding_resnet101")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.task == "cityscapes":
        run_cityscapes(model=args.deeplab_model, steps=args.steps,
                       bs=args.bs, lr=args.lr, h=args.h, w=args.w,
                       crop=args.img_size, seed=args.seed, noise=args.noise,
                       precision=dtype)
        return
    ep = {None: None, "bf16": jnp.bfloat16,
          "fp32": jnp.float32}[args.eval_precision]
    run(encoder=args.encoder, decoder=args.decoder, steps=args.steps,
        bs=args.bs, lr=args.lr, img_size=args.img_size, h=args.h, w=args.w,
        n_train=args.n_train, n_val=args.n_val, seed=args.seed,
        noise=args.noise, precision=dtype, eval_precision=ep,
        n_blobs=args.n_blobs, min_block=args.min_block)


if __name__ == "__main__":
    main()
