#!/usr/bin/env python
"""Programmatic API quickstart (runs on synthetic data, CPU or TPU).

Walks the full open-world pipeline:
  1. build the flagship DML model
  2. train a few steps
  3. run the OOD evaluation (dissum scoring -> AUROC/AUPR/FPR95)
  4. extract a novel-class prototype and apply the NPM override

Usage:  python examples/quickstart.py  (from the repo root)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax
import jax.numpy as jnp
import numpy as np

from make_synthetic_data import make_streethazards
from open_world_semantic_segmentation_tpu.data import (
    TrainPipeline, ValPipeline, prefetch_to_device)
from open_world_semantic_segmentation_tpu.fewshot import (
    extract_prototype, npm_override)
from open_world_semantic_segmentation_tpu.models import ModelBuilder
from open_world_semantic_segmentation_tpu.openset import OODEvaluator
from open_world_semantic_segmentation_tpu.train import (
    TrainState, make_anomaly_train_step, poly_schedule,
    two_group_optimizer)


def main():
    root = make_streethazards(
        os.path.join(tempfile.mkdtemp(), "sh"), n_train=4, n_val=2,
        h=48, w=64)

    # 1. flagship model: CSAIL ResNet-18-dilated + PPM embedding (tiny here)
    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13, train=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 24, 32, 3)))

    # 2. a few DML training steps (CE/n + 0.01*VAR/n)
    tx = two_group_optimizer(
        variables["params"],
        lr_encoder=poly_schedule(0.02, 100),
        lr_decoder=poly_schedule(0.02, 100),
        momentum=0.9, weight_decay=1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    step = make_anomaly_train_step(model, guard=True)
    pipe = TrainPipeline(root, os.path.join(root, "train.odgt"),
                         batch_per_gpu=2, img_sizes=(24, 32), img_max_size=80)
    batches = prefetch_to_device(pipe, size=2)
    for i in range(3):
        state, metrics = step(state, next(batches))
        print(f"step {i}: loss={float(metrics['loss']):.3f} "
              f"acc={float(metrics['acc']):.3f}")

    # 3. OOD eval with dissum scoring
    eval_model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}
    val = ValPipeline(root, os.path.join(root, "val.odgt"),
                      img_sizes=(24, 32), img_max_size=80)
    ev = OODEvaluator(eval_model, eval_vars, num_class=13, method="dissum")
    result = ev.evaluate_batched(val, batch_size=2)
    print("AUROC:", result["auroc"], "AUPR:", result["aupr"],
          "FPR95:", result["fpr"])

    # 4. few-shot: prototype extraction + NPM override
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 8, 8, 13)).astype(np.float32))
    labels = jnp.asarray((rng.random((1, 8, 8)) < 0.3).astype(np.int32) * 12)
    proto, ok = extract_prototype(feats, labels, novel_class=12)
    logits = jnp.asarray(
        rng.standard_normal((8, 8, 13)).astype(np.float32) - 10)
    preds = jnp.zeros((8, 8), jnp.int32)
    new_preds, dis = npm_override(preds, feats[0], logits, proto,
                                  novel_id=13)
    print("prototype ok:", bool(ok),
          "| pixels claimed by novel class:",
          int((np.asarray(new_preds) == 13).sum()))

    # 5. deployment: int8 PTQ + a self-contained AOT artifact
    from open_world_semantic_segmentation_tpu.ops.quant import (
        calibrate_and_prequantize)
    from open_world_semantic_segmentation_tpu.core.export import (
        export_eval_fn, load_exported, save_exported)

    m_cal = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        quant="calib")
    m_int8 = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        quant="int8")
    cal_img = rng.standard_normal((1, 48, 64, 3)).astype(np.float32)
    q_vars = calibrate_and_prequantize(m_cal, eval_vars, [cal_img],
                                       seg_size=(48, 64))
    blob = export_eval_fn(m_int8, q_vars, (48, 64), method="dissum")
    path = os.path.join(root, "model_int8.owss")
    save_exported(path, blob, {"model": "quickstart-int8"})
    fn, meta = load_exported(path)
    pred, conf = fn(jnp.asarray(cal_img))
    print(f"int8 artifact: {os.path.getsize(path) / 1e6:.1f} MB,",
          "pred shape", pred.shape)

    # 6. the FULL multi-scale eval pipeline as one artifact (per-scale
    # inputs -> averaged scores -> conf + argmax)
    from open_world_semantic_segmentation_tpu.core.export import (
        export_pyramid_eval_fn)

    shapes = [(24, 32), (32, 48)]
    blob = export_pyramid_eval_fn(eval_model, eval_vars, shapes, (48, 64),
                                  method="dissum")
    pyr_path = os.path.join(root, "model_pyramid.owss")
    save_exported(pyr_path, blob, {"pyramid": True})
    fn_p, _ = load_exported(pyr_path)
    pred_p, conf_p = fn_p(*[jnp.zeros((1, h, w, 3), jnp.float32)
                            for h, w in shapes])
    print("pyramid artifact pred shape:", pred_p.shape)


if __name__ == "__main__":
    main()
