"""Extract k-shot novel-class prototypes from support images
(the explicit version of test_embedding.py:413-425).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.extract_prototypes \
      MODEL.weights_encoder ckpt/best.pkl \
      FEWSHOT.prototype_file prototype_car_5_shot.json FEWSHOT.shots 5

Walks the support split, computes the masked-mean embedding of novel-class
pixels per image where the class covers > 5% of the image, and stops after
``FEWSHOT.shots`` prototypes; writes the same JSON list-of-vectors format
the reference consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from .main_deeplab import build_model, get_transforms
from ..data import Cityscapes
from ..data.loader import batch_iterator
from ..fewshot import extract_prototype, save_prototypes
from ..train import load_checkpoint_lenient


def main(cfg, precision_dtype=jnp.float32, variables=None,
         novel_true_id: int = 13, split="train"):
    model, num_classes = build_model(cfg, train=False, dtype=precision_dtype)
    _, val_tf = get_transforms(cfg.DEEPLAB.crop_size)
    ds = Cityscapes(cfg.DATASET.root_dataset, split=split, transform=val_tf,
                    unknown_target=tuple(cfg.DEEPLAB.unknown_target))

    if variables is None:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))
        w = cfg.MODEL.weights_encoder or cfg.MODEL.weights_decoder
        if w:
            variables, _ = load_checkpoint_lenient(w, target=variables)

    @jax.jit
    def fwd(variables, image, labels_true):
        _, _, features = model.apply(variables, image)
        proto, valid = extract_prototype(features, labels_true,
                                         novel_true_id)
        return proto, valid

    protos = []
    for image, _, target_true in batch_iterator(ds, 1, shuffle=False,
                                                drop_last=False, epochs=1):
        proto, valid = fwd(variables, jnp.asarray(image),
                           jnp.asarray(target_true.astype(np.int32)))
        if bool(valid):
            protos.append(np.asarray(proto))
            print(f"prototype {len(protos)}/{cfg.FEWSHOT.shots}")
            if len(protos) >= cfg.FEWSHOT.shots:
                break
    save_prototypes(cfg.FEWSHOT.prototype_file, protos)
    print("wrote", cfg.FEWSHOT.prototype_file)
    return protos


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

