"""Export the eval model as a self-contained AOT artifact (jax.export).

The artifact bakes in the weights and the whole eval computation (forward
+ score upsample + OOD confidence + argmax) as serialized StableHLO; it
loads with ``core.export.load_exported`` and runs with no framework code.
No reference equivalent — this is the TPU-native deployment story.

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.export_model \
      --cfg configs/test_ood_street.yaml --height 720 --width 1280 \
      --out model.owss [--platforms tpu] [--method dissum]
"""

from __future__ import annotations

import jax.numpy as jnp

from ._common import (
    build_anomaly_model,
    compute_dtype,
    config_parser,
    init_or_load_variables,
    parse_config,
)
from ..core.export import (
    export_eval_fn,
    export_pyramid_eval_fn,
    save_exported,
)


def _export_npm(cfg, precision_dtype, height, width, batch, platforms, out):
    """--npm: the few-shot NPM 16+1 inference (cli/eval_embedding.py
    semantics) with the prototype as a runtime artifact input."""
    import jax

    from .main_deeplab import build_model
    from ..core.export import export_npm_eval_fn
    from ..train import load_checkpoint_lenient

    model, num_classes = build_model(cfg, train=False, dtype=precision_dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    w = cfg.MODEL.weights_encoder or cfg.MODEL.weights_decoder
    if w:
        # strict first, partial LOUDLY on mismatch — a wrong-architecture
        # checkpoint must not silently export a half-random artifact
        variables, _ = load_checkpoint_lenient(w, target=variables)
    blob, feat_dim = export_npm_eval_fn(
        model, variables, (height, width), batch=batch,
        novel_id=num_classes, dis_threshold=cfg.FEWSHOT.npm_dis_threshold,
        platforms=platforms)
    meta = {
        "model": cfg.DEEPLAB.model,
        "input": [batch, height, width, 3],
        "npm": True,
        "prototype_dim": feat_dim,
        "novel_id": num_classes,
        "dis_threshold": float(cfg.FEWSHOT.npm_dis_threshold),
        "platforms": list(platforms) if platforms else None,
    }
    save_exported(out, blob, meta)
    print(f"exported NPM {meta['model']} ({len(blob) / 1e6:.1f} MB) -> {out}")
    return out


def main(cfg, precision_dtype=jnp.bfloat16, height=720, width=1280,
         batch=1, method="dissum", platforms=None, out="model.owss",
         quant="off", calib_glob=None, pyramid=False, npm=False):
    """``pyramid=True`` exports the FULL multi-scale eval pipeline (one
    forward per cfg.DATASET.imgSizes scale, scores averaged at
    (height, width), conf + argmax) as one artifact; otherwise a
    single-scale forward at (height, width). ``npm=True`` exports the
    few-shot NPM override pipeline instead (prototype as runtime input)."""
    if npm:
        return _export_npm(cfg, precision_dtype, height, width, batch,
                           platforms, out)
    model = build_anomaly_model(cfg, train=False, use_softmax=True,
                                dtype=precision_dtype, quant=quant)
    variables = init_or_load_variables(
        cfg, model, jnp.zeros((1, 64, 64, 3), jnp.float32))
    if quant != "off":
        # int8 artifact: calibrated scales + int8 weight constants (4x
        # smaller serialized payload than f32)
        from ._common import calibrate_for_quant

        variables = calibrate_for_quant(
            cfg, variables, (height, width), dtype=precision_dtype,
            use_softmax=True, calib_glob=calib_glob, quant=quant)
    if pyramid:
        from ..data.odgt import eval_pyramid_shapes

        shapes = eval_pyramid_shapes(
            height, width, cfg.DATASET.imgSizes, cfg.DATASET.imgMaxSize,
            cfg.DATASET.padding_constant)
        blob = export_pyramid_eval_fn(
            model, variables, shapes, (height, width), batch=batch,
            method=method, platforms=platforms)
        input_spec = [[batch, h, w, 3] for h, w in shapes]
    else:
        blob = export_eval_fn(model, variables, (height, width),
                              batch=batch, method=method,
                              platforms=platforms)
        input_spec = [batch, height, width, 3]
    meta = {
        "model": f"{cfg.MODEL.arch_encoder}+{cfg.MODEL.arch_decoder}",
        "input": input_spec,
        "full_size": [height, width],
        "pyramid": bool(pyramid),
        "method": method,
        "quant": quant,
        "platforms": list(platforms) if platforms else None,
    }
    save_exported(out, blob, meta)
    print(f"exported {meta['model']} ({len(blob) / 1e6:.1f} MB) -> {out}")
    return out


def _entry():
    parser = config_parser(__doc__)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--method", default="dissum",
                        choices=["dissum", "msp", "maxlogit", "none"])
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="lowering targets (e.g. tpu cpu); default = "
                             "current backend")
    parser.add_argument("--out", default="model.owss")
    parser.add_argument("--quant", choices=["off", "int8", "int8-hybrid",
                                          "int8-3x3"],
                        default="off",
                        help="export with int8 PTQ weights/activations")
    parser.add_argument("--calib-glob", default=None,
                        help="glob of representative images for int8 "
                             "activation calibration")
    parser.add_argument("--pyramid", action="store_true",
                        help="export the full multi-scale eval pipeline "
                             "(one input per DATASET.imgSizes scale)")
    parser.add_argument("--npm", action="store_true",
                        help="export the few-shot NPM override pipeline "
                             "(DEEPLAB.model embedding net; prototype is a "
                             "runtime input)")
    args = parser.parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args), args.height, args.width, args.batch,
         args.method, args.platforms, args.out, quant=args.quant,
         calib_glob=args.calib_glob, pyramid=args.pyramid, npm=args.npm)


if __name__ == "__main__":
    _entry()
