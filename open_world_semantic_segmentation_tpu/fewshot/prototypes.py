"""Novel-prototype matching (NPM): extraction, storage, and inference.

Parity target: DeepLabV3Plus-Pytorch/test_embedding.py.

- Extraction (:413-425, the commented reference path made explicit): for a
  support image whose ground truth contains the novel class over more than
  ``min_area`` of the image, the prototype is the mean embedding over those
  pixels. On a device mesh the masked sum/count are ``lax.psum``-reduced over
  the data axis (the "prototype allreduce" of BASELINE.json) — tiny vectors,
  one collective.
- NPM inference (:428-451): ``dis = -||f_p - proto||^2`` per pixel; a pixel
  is relabeled as the novel class when ``dis > threshold`` (-1.5) AND
  ``dis > maxlogit`` (the base head's best distance-logit).
- Label remap for 16+1 eval (:448-451): gt car (13) -> 16, higher classes
  shift down by one, 254 -> 255.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import prototype_distance


def extract_prototype(features, labels, novel_class: int,
                      min_area: float = 0.05, axis_name: Optional[str] = None):
    """Masked-mean embedding of novel-class pixels.

    features: (B, H, W, C); labels: (B, H, W). Returns (proto (C,), valid)
    where valid is False when the class covers <= min_area of the batch
    (the reference skips such support images, test_embedding.py:414-415).
    With ``axis_name``, sums are psum-reduced across the mesh first.
    """
    mask = (labels == novel_class).astype(features.dtype)[..., None]
    total = jnp.sum(mask)
    summed = jnp.sum(features * mask, axis=(0, 1, 2))
    count_all = jnp.asarray(float(np.prod(labels.shape)), features.dtype)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        summed = jax.lax.psum(summed, axis_name)
        count_all = jax.lax.psum(count_all, axis_name)
    proto = summed / jnp.maximum(total, 1.0)
    valid = (total / count_all) > min_area
    return proto, valid


def average_prototypes(protos: Sequence[np.ndarray]) -> np.ndarray:
    """k-shot prototype = mean of per-shot prototypes
    (test_embedding.py:255-258)."""
    acc = np.zeros_like(np.asarray(protos[0], dtype=np.float64))
    for p in protos:
        acc += np.asarray(p, dtype=np.float64)
    return (acc / len(protos)).astype(np.float32)


def load_prototypes(path: str) -> np.ndarray:
    """Load a prototype_*.json list of per-shot vectors and average them."""
    with open(path, "r") as f:
        protos = json.load(f)
    return average_prototypes([np.asarray(p, np.float32) for p in protos])


def save_prototypes(path: str, protos: Sequence[np.ndarray]):
    with open(path, "w") as f:
        json.dump([np.asarray(p).tolist() for p in protos], f)


def npm_override(preds, features, logits, prototype, *,
                 novel_id: int, dis_threshold: float = -1.5):
    """Relabel pixels as ``novel_id`` where the prototype distance beats both
    the threshold and the base head's max logit (test_embedding.py:428-445).

    preds: (H, W) int; features: (H, W, C); logits: (H, W, K).
    """
    dis = prototype_distance(features, jnp.asarray(prototype))
    maxlogit = jnp.max(logits, axis=-1)
    take = jnp.logical_and(dis > dis_threshold, dis > maxlogit)
    return jnp.where(take, novel_id, preds), dis


def npm_label_remap(labels, *, novel_train_id: int = 13, novel_id: int = 16):
    """Ground-truth remap for 16+1 eval (test_embedding.py:448-451):
    car (13) -> 16, ids >= 14 shift down, 254 -> 255."""
    labels = jnp.asarray(labels)
    out = jnp.where(labels == novel_train_id, -1, labels)
    out = jnp.where(out >= novel_train_id + 1, out - 1, out)
    out = jnp.where(out == -1, novel_id, out)
    out = jnp.where(out == 254, 255, out)
    return out
