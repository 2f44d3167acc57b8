"""DeepLab training/eval on Cityscapes/VOC (main.py + main_embedding.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.main_deeplab \
      DEEPLAB.model deeplabv3plus_embedding_resnet101 DEEPLAB.lr 0.1 ...

The closed-set recipe (main.py:243-419): crop 768, ColorJitter(.5,.5,.5),
hflip, SGD(momentum .9, backbone at 0.1x lr), PolyLR over total_itrs,
CE loss (CE/n active path of utils/loss.py), val every val_interval with
best-checkpoint save. ``deeplabv3plus_embedding_*`` switches to 16 classes
with the open-world unknown remap (main_embedding.py:336, 401).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from ..data import Cityscapes, transforms as et
from ..data.loader import batch_iterator
from ..metrics import StreamSegMetrics
from ..models import deeplab as deeplab_models
from ..parallel import make_mesh_for_batch, data_sharding, replicate
from ..train import (
    TrainState,
    backbone_classifier_optimizer,
    make_deeplab_train_step,
    poly_schedule,
    save_checkpoint,
    load_checkpoint,
)

MODEL_MAP = {
    "deeplabv3plus_resnet101": deeplab_models.deeplabv3plus_resnet101,
    "deeplabv3plus_resnet50": deeplab_models.deeplabv3plus_resnet50,
    "deeplabv3_resnet101": deeplab_models.deeplabv3_resnet101,
    "deeplabv3plus_mobilenet": deeplab_models.deeplabv3plus_mobilenet,
    "deeplabv3_mobilenet": deeplab_models.deeplabv3_mobilenet,
    "deeplabv3plus_embedding_resnet101":
        deeplab_models.deeplabv3plus_embedding_resnet101,
    "deeplabv3plus_embedding_resnet50":
        deeplab_models.deeplabv3plus_embedding_resnet50,
    "deeplabv3plus_embedding_mobilenet":
        deeplab_models.deeplabv3plus_embedding_mobilenet,
    "deeplabv3plus_embedding_self_distillation_resnet101":
        deeplab_models.deeplabv3plus_embedding_self_distillation_resnet101,
}


def get_transforms(crop_size: int, dataset: str = "cityscapes"):
    if dataset == "voc":
        # main.py:103-110: random scale + pad-if-needed crop, no jitter
        train_tf = et.ExtCompose([
            et.ExtRandomScale((0.5, 2.0)),
            et.ExtRandomCrop(size=(crop_size, crop_size),
                             pad_if_needed=True),
            et.ExtRandomHorizontalFlip(),
            et.ExtToTensor(),
            et.ExtNormalize(),
        ])
    else:
        train_tf = et.ExtCompose([
            et.ExtRandomCrop(size=(crop_size, crop_size)),
            et.ExtColorJitter(brightness=0.5, contrast=0.5, saturation=0.5),
            et.ExtRandomHorizontalFlip(),
            et.ExtToTensor(),
            et.ExtNormalize(),
        ])
    val_tf = et.ExtCompose([et.ExtToTensor(), et.ExtNormalize()])
    return train_tf, val_tf


def get_datasets(cfg, train_tf, val_tf):
    d = cfg.DEEPLAB
    if d.dataset == "voc":
        from ..data import VOCSegmentation

        train_ds = VOCSegmentation(cfg.DATASET.root_dataset,
                                   image_set="train_aug",
                                   transform=train_tf)
        val_ds = VOCSegmentation(cfg.DATASET.root_dataset, image_set="val",
                                 transform=val_tf)
        return train_ds, val_ds
    # embedding models always train open-world; DEEPLAB.unknown_scores
    # activates the remap for plain models too (test.py evaluates plain
    # checkpoints against the remapped val set — reference Cityscapes
    # defaults unknown_target=[14,15], cityscapes.py:71)
    unknown = (tuple(d.unknown_target)
               if ("embedding" in d.model or d.unknown_scores) else None)
    train_ds = Cityscapes(cfg.DATASET.root_dataset, split="train",
                          transform=train_tf, unknown_target=unknown)
    val_ds = Cityscapes(cfg.DATASET.root_dataset, split="val",
                        transform=val_tf, unknown_target=unknown)
    return train_ds, val_ds


def get_val_dataset(cfg, val_tf):
    """Only the val split — eval-only flows must not touch (or require)
    the train tree (a val-only dataset checkout is the normal --test_only
    deployment)."""
    d = cfg.DEEPLAB
    if d.dataset == "voc":
        from ..data import VOCSegmentation

        return VOCSegmentation(cfg.DATASET.root_dataset, image_set="val",
                               transform=val_tf)
    unknown = (tuple(d.unknown_target)
               if ("embedding" in d.model or d.unknown_scores) else None)
    return Cityscapes(cfg.DATASET.root_dataset, split="val",
                      transform=val_tf, unknown_target=unknown)


def load_deeplab_variables(cfg, model, variables, ckpt: str):
    """Load a DeepLab checkpoint into ``variables``: reference .pth
    (test.py --ckpt surface, converted via train.convert) or this
    package's pickle (raw variables or a TrainState tree). Returns
    ``(variables, metadata)``."""
    d = cfg.DEEPLAB
    if ckpt.endswith(".pth"):
        from ..train import convert as tc

        heads = ("classifier",) if "self_distillation" not in d.model \
            else tuple(["classifier"] +
                       [f"classifier_{i}"
                        for i in range(1, cfg.FEWSHOT.novel_cls + 1)])
        conv = (tc.convert_mobilenet_deeplab_checkpoint
                if "mobilenet" in d.model
                else lambda c: tc.convert_deeplab_checkpoint(
                    c, head_names=heads))(tc.load_torch_checkpoint(ckpt))
        tree, meta = {"params": conv["params"],
                      "batch_stats": conv["batch_stats"]}, {}
    else:
        from ..train import load_checkpoint

        tree, meta = load_checkpoint(ckpt)
    if "params" in tree:
        from flax import serialization

        state = serialization.to_state_dict(variables)
        state["params"] = tree["params"]
        if "batch_stats" in tree and "batch_stats" in state:
            state["batch_stats"] = tree["batch_stats"]
        variables = serialization.from_state_dict(variables, state)
    return variables, meta


def build_model(cfg, *, train, dtype):
    d = cfg.DEEPLAB
    is_embedding = "embedding" in d.model
    num_classes = d.num_classes or (16 if is_embedding else 19)
    factory = MODEL_MAP[d.model]
    if "self_distillation" in d.model:
        model = factory(num_classes=num_classes,
                        cls_novel=cfg.FEWSHOT.novel_cls,
                        output_stride=d.output_stride, train=train,
                        dtype=dtype)
    else:
        model = factory(num_classes=num_classes,
                        output_stride=d.output_stride, train=train,
                        dtype=dtype)
    return model, num_classes


def validate(model, variables, val_ds, metrics: StreamSegMetrics,
             batch_size: int = 1):
    metrics.reset()

    @jax.jit
    def fwd(variables, image):
        out = model.apply(variables, image)
        logits = out[0] if isinstance(out, tuple) else out
        if isinstance(logits, (list, tuple)):
            logits = logits[0]
        return jnp.argmax(logits, axis=-1)

    for image, target, _ in batch_iterator(val_ds, batch_size, shuffle=False,
                                           drop_last=False, epochs=1):
        preds = np.asarray(fwd(variables, jnp.asarray(image)))
        metrics.update(target.astype(np.int64), preds)
    return metrics.get_results()


def main(cfg, precision_dtype=jnp.bfloat16, max_steps=None):
    d = cfg.DEEPLAB
    if d.test_only:
        # eval-only surface (main.py --test_only, main.py:156-240)
        from . import test_deeplab

        return test_deeplab.main(cfg, precision_dtype)
    model, num_classes = build_model(cfg, train=True, dtype=precision_dtype)
    eval_model, _ = build_model(cfg, train=False, dtype=precision_dtype)

    train_tf, val_tf = get_transforms(d.crop_size, d.dataset)
    train_ds, val_ds = get_datasets(cfg, train_tf, val_tf)

    example = jnp.zeros((1, d.crop_size, d.crop_size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(d.random_seed), example)

    frozen = ()
    if "self_distillation" in d.model:
        # only the newest novel head trains (test_self_distillation.py:476)
        frozen = tuple(["backbone", "classifier"] +
                       [f"classifier_{i}"
                        for i in range(1, cfg.FEWSHOT.novel_cls)])
    tx = backbone_classifier_optimizer(
        variables["params"],
        lr=poly_schedule(d.lr, d.total_itrs, 0.9, min_lr=1e-6),
        momentum=0.9, weight_decay=d.weight_decay,
        backbone_scale=0.0 if "backbone" in frozen else 0.1,
        frozen_keys=frozen)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)

    if d.continue_training and os.path.exists(cfg.DIR):
        latest = os.path.join(cfg.DIR, "latest.pkl")
        if os.path.exists(latest):
            state, meta = load_checkpoint(latest, target=state)
            print(f"resumed from {latest} at step {int(state.step)}")

    mesh = make_mesh_for_batch(d.batch_size)
    state = replicate(state, mesh)
    sharding = data_sharding(mesh)

    step_fn = make_deeplab_train_step(
        model, loss_kind=d.loss_type,
        rng=jax.random.PRNGKey(d.random_seed), guard=True)
    metrics = StreamSegMetrics(num_classes)

    def collate_to_batch(batch):
        image, target, target_true = batch
        return {"image": jax.device_put(image, sharding),
                "label": jax.device_put(target.astype(np.int32), sharding)}

    best_score = 0.0
    interval_loss = 0.0
    cur_itrs = int(state.step)
    loader = batch_iterator(train_ds, d.batch_size, seed=d.random_seed,
                            # disjoint covering per-host input shards
                            num_hosts=jax.process_count(),
                            host_id=jax.process_index())
    for batch in loader:
        cur_itrs += 1
        state, m = step_fn(state, collate_to_batch(batch))
        interval_loss += float(m["loss"])
        if cur_itrs % 10 == 0:
            print("Itrs %d/%d, Loss=%f" %
                  (cur_itrs, d.total_itrs, interval_loss / 10), flush=True)
            interval_loss = 0.0
        if cur_itrs % d.val_interval == 0:
            os.makedirs(cfg.DIR, exist_ok=True)
            save_checkpoint(os.path.join(cfg.DIR, "latest.pkl"), state,
                            {"cur_itrs": cur_itrs, "best_score": best_score})
            print("validation...")
            val_vars = {"params": state.params,
                        "batch_stats": state.batch_stats}
            score = validate(eval_model, val_vars, val_ds, metrics)
            print(StreamSegMetrics.to_str(score))
            if score["Mean IoU"] > best_score:
                best_score = score["Mean IoU"]
                save_checkpoint(os.path.join(cfg.DIR, "best.pkl"), state,
                                {"cur_itrs": cur_itrs,
                                 "best_score": best_score})
        if cur_itrs >= d.total_itrs or \
                (max_steps is not None and cur_itrs >= max_steps):
            break
    return state


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

