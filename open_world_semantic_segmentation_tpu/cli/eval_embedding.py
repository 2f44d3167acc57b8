"""NPM 16+1 evaluation on Cityscapes (test_embedding.py --test_only).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.eval_embedding \
      FEWSHOT.prototype_file prototype_car_5_shot.json \
      MODEL.weights_encoder ckpt/best.pkl

Pipeline (test_embedding.py:225-653): embedding model forward ->
base-head argmax -> per-pixel distance to the k-shot averaged prototype ->
override prediction with the novel id where the distance beats the
threshold AND the max base logit -> remap ground truth (car->16, shift) ->
streaming 19-class confusion matrix. The distance/override/remap all run
on-device in the same program as the forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from .main_deeplab import build_model, get_transforms
from ..data import Cityscapes
from ..data.loader import batch_iterator
from ..fewshot import load_prototypes, npm_label_remap, npm_override
from ..metrics import StreamSegMetrics
from ..train import load_checkpoint


def main(cfg, precision_dtype=jnp.float32, max_images=None, variables=None,
         split="val"):
    model, num_classes = build_model(cfg, train=False, dtype=precision_dtype)
    _, val_tf = get_transforms(cfg.DEEPLAB.crop_size)
    val_ds = Cityscapes(cfg.DATASET.root_dataset, split=split,
                        transform=val_tf,
                        unknown_target=tuple(cfg.DEEPLAB.unknown_target))

    if variables is None:
        example = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), example)
        w = cfg.MODEL.weights_encoder or cfg.MODEL.weights_decoder
        if w:
            variables, _ = load_checkpoint(w, target=variables, partial=True)

    prototype = load_prototypes(cfg.FEWSHOT.prototype_file)
    novel_id = num_classes  # 16
    threshold = cfg.FEWSHOT.npm_dis_threshold

    @jax.jit
    def fwd(variables, image, labels):
        logits, centers, features = model.apply(variables, image)
        preds = jnp.argmax(logits, axis=-1)
        new_preds, _ = npm_override(
            preds[0], features[0], logits[0], jnp.asarray(prototype),
            novel_id=novel_id, dis_threshold=threshold)
        remapped = npm_label_remap(labels[0], novel_id=novel_id)
        return new_preds, remapped

    metrics = StreamSegMetrics(num_classes + 1)
    metrics.reset()
    count = 0
    for image, target, _ in batch_iterator(val_ds, 1, shuffle=False,
                                           drop_last=False, epochs=1):
        preds, labels = fwd(variables, jnp.asarray(image),
                            jnp.asarray(target.astype(np.int32)))
        metrics.update(np.asarray(labels)[None].astype(np.int64),
                       np.asarray(preds)[None])
        count += 1
        if max_images is not None and count >= max_images:
            break
    score = metrics.get_results()
    print(StreamSegMetrics.to_str(score))
    return score


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

