"""Fishyscapes LostAndFound evaluation (test_eva.py parity, bdlb-free).

The reference wraps its DeepLab model as an ``estimator(image) -> anomaly
map`` for the external ``bdlb`` FishyscapesLAF harness
(test_eva.py:283-310, 436-442). This driver runs the SAME estimator
against a local LostAndFound tree (odgt list from ``cli/make_odgt.py
laf``) and computes the Fishyscapes pooled-pixel AP / AUROC / FPR95
natively — no bdlb/tensorflow required. With ``--bdlb`` it defers to the
external harness exactly like the reference.

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.eval_fishyscapes \
      --cfg configs/cityscapes_embedding.yaml \
      DATASET.root_dataset /data/laf DATASET.list_val laf.odgt \
      [--method entropy|msp|dissum] [--max-images N]
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from ._common import compute_dtype, config_parser, parse_config
from ..openset.fishyscapes import make_estimator, run_bdlb, run_native


def main(cfg, precision_dtype=jnp.bfloat16, method: str = "entropy",
         max_images=None, use_bdlb: bool = False, variables=None):
    from .main_deeplab import build_model, load_deeplab_variables

    model, num_classes = build_model(cfg, train=False,
                                     dtype=precision_dtype)
    if variables is None:
        example = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(cfg.DEEPLAB.random_seed), example)
        if cfg.DEEPLAB.ckpt:
            # handles reference .pth and package pickles alike
            variables, _ = load_deeplab_variables(
                cfg, model, variables, cfg.DEEPLAB.ckpt)

    estimator = make_estimator(model, variables, method=method)
    if use_bdlb:
        return run_bdlb(estimator)
    result = run_native(estimator, cfg.DATASET.root_dataset,
                        cfg.DATASET.list_val, max_images=max_images)
    print(json.dumps(result))
    return result


def _entry():
    parser = config_parser(__doc__)
    parser.add_argument("--method", default="entropy",
                        choices=["entropy", "msp", "dissum"])
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--bdlb", action="store_true",
                        help="use the external bdlb harness instead of "
                             "the native pooled-pixel evaluation")
    args = parser.parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args), method=args.method,
         max_images=args.max_images, use_bdlb=args.bdlb)


if __name__ == "__main__":
    _entry()
