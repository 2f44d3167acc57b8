"""FT / PLM incremental learning: pseudo-labels and multi-head merging.

Parity target: DeepLabV3Plus-Pytorch/test_self_distillation.py and
main_self_distillation.py.

Training (:549-617):
- support pixels labeled 0 are relabeled to the new class id
  ``16 + novel_cls - 1`` (:558);
- ignore pixels (255) take the frozen base head's argmax (:565-567);
- earlier novel heads' confident pixels propagate their labels (:568-570);
- loss is CE on the LAST head only (:572-574) and only ``classifier_N``
  parameters are optimized (:476-478) — expressed with
  ``train.optim.backbone_classifier_optimizer(frozen_keys=...)``.

Eval (:292-297 + README.md:76-89):
- ``plm_all``: merged prediction starts from the BASE head's argmax and is
  overridden wherever novel head i predicts its novel class 16+i;
- ``plm_latest``: starts from the LAST head's argmax instead (the commented
  line :293);
- label remap identical to NPM (:351-354).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .prototypes import npm_label_remap

self_distillation_eval_remap = npm_label_remap  # same remap (:351-354)


def pseudo_label(labels, head_logits: Sequence, *, novel_cls: int = 1,
                 base_classes: int = 16, ignore_index: int = 255,
                 support_zero_to_novel: bool = True):
    """Build the training target from the raw labels + frozen heads.

    labels: (B, H, W); head_logits: list of per-head logits (B, H, W, K_i),
    index 0 = base head. Returns the pseudo-labeled target.
    """
    labels = jnp.asarray(labels)
    if support_zero_to_novel:
        labels = jnp.where(labels == 0, base_classes + novel_cls - 1, labels)
    base_pred = jnp.argmax(head_logits[0], axis=-1)
    labels = jnp.where(labels == ignore_index, base_pred, labels)
    for i in range(novel_cls - 1):
        prev_pred = jnp.argmax(head_logits[i + 1], axis=-1)
        labels = jnp.where(prev_pred == base_classes + i, prev_pred, labels)
    return labels


def merge_head_predictions(head_logits: Sequence, *, variant: str = "plm_all",
                           base_classes: int = 16):
    """Merged open-world prediction from the multi-head model.

    head_logits: list of (B, H, W, K_i) logits (base first). Returns (B, H, W)
    int predictions.
    """
    if variant == "plm_latest":
        preds = jnp.argmax(head_logits[-1], axis=-1)
    else:
        preds = jnp.argmax(head_logits[0], axis=-1)
    for i, logits in enumerate(head_logits[1:]):
        head_pred = jnp.argmax(logits, axis=-1)
        novel_id = base_classes + i
        preds = jnp.where(head_pred == novel_id, novel_id, preds)
    return preds
