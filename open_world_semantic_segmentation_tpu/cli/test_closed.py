"""Closed-set multi-scale evaluation + prediction PNGs (anomaly/test.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.test_closed \
      --cfg configs/test_test.yaml TEST.result ./out

Per image: multi-scale averaged forward, argmax prediction, per-class IoU,
and (TEST.result set) ``pred + 1`` PNGs saved per folder
(anomaly/test.py:39-44, 117-123).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ._common import (
    build_anomaly_model,
    compute_dtype,
    config_parser,
    init_or_load_variables,
    parse_config,
)
from ..data import ValPipeline
from ..openset import OODEvaluator


def main(cfg, precision_dtype=jnp.float32, max_images=None):
    model = build_anomaly_model(cfg, train=False, use_softmax=True,
                                dtype=precision_dtype)
    variables = init_or_load_variables(
        cfg, model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    pipeline = ValPipeline(
        cfg.DATASET.root_dataset, cfg.DATASET.list_val,
        img_sizes=cfg.DATASET.imgSizes,
        img_max_size=cfg.DATASET.imgMaxSize,
        padding_constant=cfg.DATASET.padding_constant,
        max_sample=max_images or -1)

    evaluator = OODEvaluator(model, variables,
                             num_class=cfg.DATASET.num_class,
                             method="msp", out_labels=cfg.OOD.out_labels)
    result_dir = cfg.TEST.result
    for item in pipeline:
        out = evaluator.evaluate_item(item)
        if result_dir:
            # reference saves pred + 1 as L png per source folder
            pred_png = (out["pred"] + 1).astype(np.uint8)
            dst = os.path.join(result_dir,
                               os.path.dirname(item["name"]))
            os.makedirs(dst, exist_ok=True)
            Image.fromarray(pred_png, "L").save(
                os.path.join(result_dir, item["name"]))
    return evaluator.summary()


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

