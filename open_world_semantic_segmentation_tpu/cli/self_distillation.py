"""FT / PLM incremental few-shot training + eval
(test_self_distillation.py + main_self_distillation.py).

Train (--mode train): multi-head model with frozen backbone + base head;
labels 0 -> novel id, ignore pixels pseudo-labeled from the frozen base
head; CE on the newest head only.

Eval (--mode eval): merged open-world prediction with the FEWSHOT.variant
(plm_all = base-head start, plm_latest = last-head start), NPM label remap,
streaming mIoU.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from .main_deeplab import build_model, get_transforms
from ..data import Cityscapes
from ..data.loader import batch_iterator
from ..fewshot import (
    merge_head_predictions,
    pseudo_label,
    self_distillation_eval_remap,
)
from ..metrics import StreamSegMetrics
from ..train import (
    TrainState,
    backbone_classifier_optimizer,
    deeplab_cross_entropy,
    load_checkpoint,
    poly_schedule,
    save_checkpoint,
)


def make_self_distillation_step(model, *, novel_cls: int, base_classes: int,
                                rng, fix_bn: bool = True):
    # BN frozen by default during incremental training
    # (main_self_distillation.py:433-435)
    def loss_fn(params, batch_stats, batch, step):
        (logits, centers, features), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(rng, step)})
        labels = pseudo_label(batch["label"], logits, novel_cls=novel_cls,
                              base_classes=base_classes)
        loss = deeplab_cross_entropy(logits[-1], labels, ignore_index=255)
        return loss, mutated["batch_stats"]

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, batch):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, state.step)
        state = state.apply_gradients(grads).replace(
            batch_stats=state.batch_stats if fix_bn else new_bs)
        return state, loss

    return step_fn


def evaluate(cfg, model, variables, num_classes, max_images=None,
             split="val"):
    _, val_tf = get_transforms(cfg.DEEPLAB.crop_size)
    val_ds = Cityscapes(cfg.DATASET.root_dataset, split=split,
                        transform=val_tf,
                        unknown_target=tuple(cfg.DEEPLAB.unknown_target))

    variant = cfg.FEWSHOT.variant

    @jax.jit
    def fwd(variables, image, labels):
        logits, _, _ = model.apply(variables, image)
        preds = merge_head_predictions(logits, variant=variant,
                                       base_classes=num_classes)
        remapped = self_distillation_eval_remap(labels)
        return preds[0], remapped[0]

    metrics = StreamSegMetrics(num_classes + cfg.FEWSHOT.novel_cls)
    metrics.reset()
    for i, (image, target, _) in enumerate(batch_iterator(
            val_ds, 1, shuffle=False, drop_last=False, epochs=1)):
        preds, labels = fwd(variables, jnp.asarray(image),
                            jnp.asarray(target.astype(np.int32)))
        metrics.update(np.asarray(labels)[None].astype(np.int64),
                       np.asarray(preds)[None])
        if max_images is not None and i + 1 >= max_images:
            break
    score = metrics.get_results()
    print(StreamSegMetrics.to_str(score))
    return score


def main(cfg, precision_dtype=jnp.bfloat16, mode="eval", max_steps=None,
         max_images=None, variables=None):
    cfg = cfg.clone()
    cfg.DEEPLAB.model = "deeplabv3plus_embedding_self_distillation_resnet101"
    model, num_classes = build_model(
        cfg, train=(mode == "train"), dtype=precision_dtype)

    if variables is None:
        example = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(cfg.DEEPLAB.random_seed),
                               example)
        w = cfg.MODEL.weights_encoder or cfg.MODEL.weights_decoder
        if w:
            # partial load: base ckpt lacks the new classifier_N head
            # (test_self_distillation.py:511-518)
            variables, _ = load_checkpoint(w, target=variables, partial=True)

    if mode == "eval":
        eval_model, _ = build_model(cfg, train=False, dtype=precision_dtype)
        return evaluate(cfg, eval_model, variables, num_classes,
                        max_images=max_images)

    d = cfg.DEEPLAB
    novel_cls = cfg.FEWSHOT.novel_cls
    split = f"test_car_{cfg.FEWSHOT.shots}_shot" \
        if cfg.FEWSHOT.shots in (1, 5) else "train"
    train_tf, _ = get_transforms(d.crop_size)
    try:
        train_ds = Cityscapes(cfg.DATASET.root_dataset, split=split,
                              transform=train_tf,
                              unknown_target=tuple(d.unknown_target))
    except RuntimeError:
        train_ds = Cityscapes(cfg.DATASET.root_dataset, split="train",
                              transform=train_tf,
                              unknown_target=tuple(d.unknown_target))

    frozen = tuple(["backbone", "classifier"] +
                   [f"classifier_{i}" for i in range(1, novel_cls)])
    tx = backbone_classifier_optimizer(
        variables["params"],
        lr=poly_schedule(d.lr, d.total_itrs, 0.9, min_lr=1e-6),
        momentum=0.9, weight_decay=d.weight_decay, frozen_keys=frozen)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    step_fn = make_self_distillation_step(
        model, novel_cls=novel_cls, base_classes=num_classes,
        rng=jax.random.PRNGKey(d.random_seed))

    cur = 0
    for image, target, _ in batch_iterator(train_ds, d.batch_size,
                                           seed=d.random_seed):
        cur += 1
        batch = {"image": jnp.asarray(image),
                 "label": jnp.asarray(target.astype(np.int32))}
        state, loss = step_fn(state, batch)
        if cur % 10 == 0:
            print("Itrs %d/%d, Loss=%f" % (cur, d.total_itrs, float(loss)),
                  flush=True)
        if cur >= d.total_itrs or (max_steps is not None and cur >= max_steps):
            break
    os.makedirs(cfg.DIR, exist_ok=True)
    save_checkpoint(os.path.join(cfg.DIR, "self_distillation_latest.pkl"),
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, {"step": cur})
    return state


if __name__ == "__main__":
    parser = config_parser(__doc__)
    parser.add_argument("--mode", choices=["train", "eval"], default="eval")
    args = parser.parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args), mode=args.mode)


def _entry():
    parser = config_parser(__doc__)
    parser.add_argument("--mode", choices=["train", "eval"], default="eval")
    args = parser.parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args), mode=args.mode)

