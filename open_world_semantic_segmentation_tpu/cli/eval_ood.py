"""Open-set (OOD) evaluation (anomaly/eval_ood_traditional.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.eval_ood \
      --cfg configs/test_ood_street.yaml OOD.ood dissum

Prints per-class IoU, mean IoU / accuracy / mean inference time, and the
mean per-image AUROC / AUPR / FPR95 in the reference's format
(eval_ood_traditional.py:634-641).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from ._common import (
    build_anomaly_model,
    compute_dtype,
    config_parser,
    init_or_load_variables,
    parse_config,
)
from ..data import ValPipeline
from ..data.prefetch import iter_prefetch
from ..openset import OODEvaluator


def main(cfg, precision_dtype=jnp.float32, max_images=None,
         batch_images: int = 1, device_metrics: bool = False,
         device_pyramid: bool = False, quant: str = "off",
         calib_images: int = 4):
    """``quant``: opt-in int8 PTQ inference ("int8"/"int8-hybrid"/
    "int8-3x3", ops/quant.py) — activation scales are calibrated on the
    first ``calib_images`` val images before evaluation. "off" (default)
    is the reference-parity path; "int8-hybrid" (int8 backbone +
    concat-free bf16 fuse head) is the fastest measured policy."""
    model = build_anomaly_model(cfg, train=False, use_softmax=True,
                                dtype=precision_dtype, quant=quant)
    example = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = init_or_load_variables(cfg, model, example)
    if quant != "off":
        from ..ops.quant import calibrate, prequantize

        m_cal = build_anomaly_model(cfg, train=False, use_softmax=True,
                                    dtype=precision_dtype, quant="calib")
        cal_pipe = ValPipeline(
            cfg.DATASET.root_dataset, cfg.DATASET.list_val,
            img_sizes=cfg.DATASET.imgSizes,
            img_max_size=cfg.DATASET.imgMaxSize,
            padding_constant=cfg.DATASET.padding_constant,
            max_sample=calib_images)
        # calibrate on the SMALLEST and LARGEST pyramid scales so the
        # recorded amax bounds the whole 5-scale range evaluation runs
        # (all scales share the per-tensor amax variables); group by
        # (input shape, seg size) so each shape compiles ONE calibration
        # program reused across its images
        groups = {}
        for item in cal_pipe:
            pyr = item["img_data"]
            for im in {id(pyr[0]): pyr[0], id(pyr[-1]): pyr[-1]}.values():
                key = (im.shape, tuple(item["seg_label"].shape[1:3]))
                groups.setdefault(key, []).append(im)
        for (_, seg), imgs in groups.items():
            variables = calibrate(m_cal, dict(variables), imgs,
                                  seg_size=seg)
        if quant != "w4a8":  # w4a8 quantizes kernels in-program
            variables = prequantize(variables, mode=quant)
        print(f"int8 calibration done on {calib_images} images")

    pipeline = ValPipeline(
        cfg.DATASET.root_dataset, cfg.DATASET.list_val,
        img_sizes=cfg.DATASET.imgSizes,
        img_max_size=cfg.DATASET.imgMaxSize,
        padding_constant=cfg.DATASET.padding_constant,
        max_sample=max_images or -1,
        use_native=(precision_dtype != jnp.float32),
        device_pyramid=device_pyramid)
    # background host decode/resample overlapped with device compute
    loader = iter_prefetch(pipeline, depth=2 * max(1, batch_images))

    evaluator = OODEvaluator(
        model, variables,
        num_class=cfg.DATASET.num_class,
        method=cfg.OOD.ood,
        out_labels=cfg.OOD.out_labels,
        exclude_back=cfg.OOD.exclude_back,
        visualize_dir=os.path.join(cfg.DIR, "result")
        if cfg.VAL.visualize else None,
        device_metrics=device_metrics)
    if batch_images > 1:
        result = evaluator.evaluate_batched(loader,
                                            batch_size=batch_images,
                                            progress=True)
    else:
        result = evaluator.evaluate(loader, progress=False)
    print("Evaluation Done!")
    return result


def _entry():
    parser = config_parser(__doc__)
    parser.add_argument("--batch-images", type=int, default=8,
                        help="images per device dispatch (1 = per-image)")
    parser.add_argument("--device-metrics", action="store_true",
                        help="compute AUROC/AUPR/FPR on-chip (fast path; "
                             "the host f64 sweep is the parity default)")
    parser.add_argument("--quant",
                        choices=["off", "int8", "int8-hybrid",
                                 "int8-3x3", "w4a8"],
                        default="off",
                        help="opt-in PTQ inference (ops/quant.py): int8 "
                             "activations+weights, or w4a8 (int4 weights); "
                             "bounded numeric drift, ~1.2-1.5x throughput")
    args = parser.parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args), batch_images=args.batch_images,
         device_metrics=args.device_metrics, quant=args.quant)


if __name__ == "__main__":
    _entry()

