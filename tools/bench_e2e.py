#!/usr/bin/env python
"""Real end-to-end OOD-eval throughput (VERDICT r1 #7).

Unlike bench.py (which measures the fused device program on pre-staged
tensors — the driver contract), this measures the ACTUAL cli/eval_ood
path on a synthetic on-disk 720x1280 StreetHazards tree: PNG decode +
pyramid construction + prefetch + device program + AUROC/AUPR/FPR + the
mIoU/accuracy accumulation, for three configurations:

  host-pyramid + host-metrics    (the f64 bit-parity path)
  host-pyramid + device-metrics  (metrics on-chip, conf never transferred)
  device-pyramid + device-metrics (host does only the PNG decode)

Usage (from /root/repo so the axon plugin initializes):
  python tools/bench_e2e.py [--n-imgs 16] [--batch-images 8] [--arch resnet50dilated]

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root, n, h=720, w=1280):
    from PIL import Image

    img_dir = os.path.join(root, "images", "test", "t1")
    ann_dir = os.path.join(root, "annotations", "test", "t1")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    records = []
    for i in range(n):
        name = f"{i}.png"
        if not os.path.exists(os.path.join(img_dir, name)):
            # smooth-ish random image (pure noise PNGs decode slower than
            # any real photo and would understate throughput)
            base = rng.integers(0, 255, (45, 80, 3), dtype=np.uint8)
            img = np.asarray(Image.fromarray(base).resize(
                (w, h), Image.BILINEAR), np.uint8)
            Image.fromarray(img).save(os.path.join(img_dir, name))
            lab = rng.integers(1, 15, (h, w), dtype=np.uint8)
            Image.fromarray(lab, "L").save(os.path.join(ann_dir, name))
        records.append({"fpath_img": f"images/test/t1/{name}",
                        "fpath_segm": f"annotations/test/t1/{name}",
                        "height": h, "width": w,
                        "dbName": "StreetHazards"})
    with open(os.path.join(root, "val.odgt"), "w") as f:
        f.write(json.dumps(records) + "\n")
    return root


def run_config(cfg_name, root, n_imgs, batch_images, arch, fc_dim,
               device_metrics, device_pyramid, dtype):
    import jax.numpy as jnp

    from open_world_semantic_segmentation_tpu.data import ValPipeline
    from open_world_semantic_segmentation_tpu.data.prefetch import (
        iter_prefetch,
    )
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset import OODEvaluator

    model = ModelBuilder.build_segmentation_model(
        arch, "ppm_deepsup_embedding", num_class=13, fc_dim=fc_dim,
        dtype=dtype)
    import jax

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 304, 536, 3), jnp.float32))

    def make_loader():
        pipeline = ValPipeline(root, os.path.join(root, "val.odgt"),
                               use_native=True,
                               device_pyramid=device_pyramid)
        return iter_prefetch(pipeline, depth=2 * max(1, batch_images))

    ev = OODEvaluator(model, variables, num_class=13, method="dissum",
                      out_labels=(13,), device_metrics=device_metrics)
    # warmup epoch: compiles + caches
    ev.evaluate_batched(make_loader(), batch_size=batch_images)

    tic = time.perf_counter()
    ev.evaluate_batched(make_loader(), batch_size=batch_images)
    dt = (time.perf_counter() - tic) / n_imgs
    print(json.dumps({"config": cfg_name,
                      "imgs_per_sec": round(1.0 / dt, 3),
                      "ms_per_img": round(dt * 1000, 1),
                      "n_imgs": n_imgs,
                      "batch_images": batch_images}), flush=True)
    return 1.0 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-imgs", type=int, default=16)
    ap.add_argument("--batch-images", type=int, default=8)
    ap.add_argument("--arch", default="resnet50dilated")
    ap.add_argument("--fc-dim", type=int, default=2048)
    ap.add_argument("--root", default="/tmp/owss_bench_e2e")
    ap.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (sanity runs)")
    ap.add_argument("--configs", default="host,devmetrics,devpyramid",
                    help="comma list of host|devmetrics|devpyramid")
    args = ap.parse_args()

    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    os.environ.setdefault("OWSS_RESIZE_IMPL", "mxu")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    root = make_dataset(args.root, args.n_imgs, args.height, args.width)
    todo = args.configs.split(",")
    if "host" in todo:
        run_config("host-pyramid+host-metrics", root, args.n_imgs,
                   args.batch_images, args.arch, args.fc_dim,
                   False, False, dtype)
    if "devmetrics" in todo:
        run_config("host-pyramid+device-metrics", root, args.n_imgs,
                   args.batch_images, args.arch, args.fc_dim,
                   True, False, dtype)
    if "devpyramid" in todo:
        run_config("device-pyramid+device-metrics", root, args.n_imgs,
                   args.batch_images, args.arch, args.fc_dim,
                   True, True, dtype)


if __name__ == "__main__":
    main()
