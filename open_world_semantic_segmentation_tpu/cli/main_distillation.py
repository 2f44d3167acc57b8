"""Teacher-student incremental distillation (main_distillation.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.main_distillation \
      MODEL.weights_encoder ckpt/base16.pkl DEEPLAB.lr 0.01 ...

Two embedding models (main_distillation.py:276-477): a frozen 16-class
teacher loaded from the base checkpoint and a 17-class student whose
backbone initializes from the same checkpoint (classifier excluded,
:380-383). Per step: pseudo-labels — ignore pixels take the teacher's
argmax, support pixels labeled 0 become the novel class 16 (:423, 430) —
then ``CrossEntropyLoss_dis`` (CE/n active path; the feature-distillation
term behind FEWSHOT flags) on the student.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from .main_deeplab import get_transforms
from ..data import Cityscapes
from ..data.loader import batch_iterator
from ..models import deeplabv3plus_embedding_resnet101
from ..train import (
    TrainState,
    backbone_classifier_optimizer,
    load_checkpoint,
    poly_schedule,
    save_checkpoint,
)
from ..train.losses import distillation_loss


def main(cfg, precision_dtype=jnp.bfloat16, max_steps=None,
         teacher_variables=None, student_variables=None):
    d = cfg.DEEPLAB
    base_classes = d.num_classes or 16
    novel_id = base_classes  # 16

    # the reference hard-codes the resnet101 embedding model
    # (main_distillation.py:380); honor DEEPLAB.model when it names another
    # embedding composition (e.g. the resnet50 variant)
    factory = deeplabv3plus_embedding_resnet101
    if "embedding" in d.model and "self_distillation" not in d.model:
        from .main_deeplab import MODEL_MAP

        factory = MODEL_MAP[d.model]
    teacher = factory(
        num_classes=base_classes, output_stride=d.output_stride,
        train=False, dtype=precision_dtype)
    student = factory(
        num_classes=base_classes + 1, output_stride=d.output_stride,
        train=True, dtype=precision_dtype)

    example = jnp.zeros((1, 64, 64, 3), jnp.float32)
    if teacher_variables is None:
        teacher_variables = teacher.init(jax.random.PRNGKey(0), example)
        if cfg.MODEL.weights_encoder:
            teacher_variables, _ = load_checkpoint(
                cfg.MODEL.weights_encoder, target=teacher_variables,
                partial=True)
    if student_variables is None:
        student_variables = student.init(jax.random.PRNGKey(1), example)
        if cfg.MODEL.weights_encoder:
            # backbone (and shape-compatible head parts) from the teacher
            # ckpt; the 17-class classifier keeps its fresh init (:380-383)
            student_variables, _ = load_checkpoint(
                cfg.MODEL.weights_encoder, target=student_variables,
                partial=True)

    tx = backbone_classifier_optimizer(
        student_variables["params"],
        lr=poly_schedule(d.lr, d.total_itrs, 0.9, min_lr=1e-6),
        momentum=0.9, weight_decay=d.weight_decay)
    state = TrainState.create(params=student_variables["params"],
                              batch_stats=student_variables["batch_stats"],
                              tx=tx)
    use_dis = cfg.FEWSHOT.variant == "distillation_feature"

    def loss_fn(params, batch_stats, batch, step):
        t_logits, _, t_feats = teacher.apply(teacher_variables,
                                             batch["image"])
        (s_logits, _, s_feats), mutated = student.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"],
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(
                jax.random.PRNGKey(d.random_seed), step)})
        labels = batch["label"]
        labels = jnp.where(labels == 0, novel_id, labels)
        t_pred = jnp.argmax(t_logits, axis=-1)
        labels = jnp.where(labels == 255, t_pred, labels)
        loss = distillation_loss(s_logits, labels, t_feats, s_feats,
                                 novel_class=novel_id,
                                 use_distillation_term=use_dis)
        return loss, mutated["batch_stats"]

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step)
        return state.apply_gradients(grads).replace(batch_stats=new_bs), loss

    train_tf, _ = get_transforms(d.crop_size)
    split = f"test_car_{cfg.FEWSHOT.shots}_shot" \
        if cfg.FEWSHOT.shots in (1, 5) else "train"
    try:
        ds = Cityscapes(cfg.DATASET.root_dataset, split=split,
                        transform=train_tf,
                        unknown_target=tuple(d.unknown_target))
    except RuntimeError:
        ds = Cityscapes(cfg.DATASET.root_dataset, split="train",
                        transform=train_tf,
                        unknown_target=tuple(d.unknown_target))

    cur = 0
    for image, target, _ in batch_iterator(ds, d.batch_size,
                                           seed=d.random_seed):
        cur += 1
        state, loss = step_fn(state, {
            "image": jnp.asarray(image),
            "label": jnp.asarray(target.astype(np.int32))})
        if cur % 10 == 0:
            print("Itrs %d/%d, Loss=%f" % (cur, d.total_itrs, float(loss)),
                  flush=True)
        if cur >= d.total_itrs or (max_steps is not None and cur >= max_steps):
            break
    os.makedirs(cfg.DIR, exist_ok=True)
    save_checkpoint(os.path.join(cfg.DIR, "distillation_student.pkl"),
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, {"step": cur})
    return state


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

