"""Loss functions — vectorized, jit-able equivalents of the reference losses.

The reference computes its DML "VAR" term with a Python loop over
batch x np.unique(classes) x index_select (anomaly/models/models.py:43-78) —
a host-synchronizing hot spot. All terms here are one-hot gathers /
masked segment means: pure XLA, O(BHWK), no host round trips.

Reference semantics preserved exactly:
- ``SegmentationModule`` training loss (models.py:78):
  ``loss = CE/n + alpha * VAR/n`` with alpha=0.01 (models.py:31), where
  CE is a *mean* over valid pixels and VAR sums ``-logit[p, y_p]`` over valid
  pixels per image, normalized by the FULL pixel count of the image
  (np.unique counts include ignore pixels, models.py:56-58). The Inter term
  is computed with beta=0 (models.py:32) — available here behind ``beta``.
- DeepLab ``CrossEntropyLoss`` (utils/loss.py:25-82): the shipped code
  returns ``CE/n`` before the metric terms (loss.py:42) — its active path is
  CE divided (again) by batch size. The full VAR/Inter/Center form follows
  the dead code and activates when ``alpha/beta/gamma`` are nonzero and
  ``use_metric_terms=True``.
- ``CrossEntropyLoss_dis`` (utils/loss.py:84-122): active path ``CE/n``;
  the feature-distillation term (0.01 * DIS/n over non-novel pixels) behind
  ``use_distillation_term``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _gather_logit(logits, labels):
    """logits (..., C), labels (...) -> logit at the label index (labels
    clipped so ignore values index safely; mask separately).

    Formulated as a one-hot select-and-sum rather than
    ``jnp.take_along_axis``: per-pixel gathers along the minor (lane)
    dimension serialize on TPU — the round-3 trace of the
    self-distillation train step showed the gather fusion alone at 49%
    of the whole step (45.8 ms for 2.9M pixels). The masked sum is
    bit-exact (the selected logit is returned unchanged; non-selected
    lanes contribute exact zeros, and ``where`` keeps NaN/inf logits in
    dead lanes from polluting the result) and its VJP is an elementwise
    mask-broadcast instead of a scatter."""
    c = logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    onehot = safe[..., None] == jnp.arange(c, dtype=safe.dtype)
    return jnp.sum(jnp.where(onehot, logits, 0), axis=-1)


def cross_entropy(logits, labels, ignore_index: int = -1):
    """Mean cross entropy over valid pixels (torch CrossEntropyLoss parity).

    logits: (B, H, W, C) raw scores; labels: (B, H, W) int.
    """
    valid = labels != ignore_index
    lse = jax.nn.logsumexp(logits, axis=-1)
    nll = lse - _gather_logit(logits, labels)
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def pixel_acc(logits, labels):
    """models.py:15-21: accuracy over labels >= 0."""
    preds = jnp.argmax(logits, axis=-1)
    valid = (labels >= 0)
    acc_sum = jnp.sum(valid & (preds == labels))
    pixel_sum = jnp.sum(valid)
    return acc_sum.astype(jnp.float32) / (pixel_sum.astype(jnp.float32) + 1e-10)


def dml_segmentation_loss(logits, labels, *, alpha: float = 0.01,
                          beta: float = 0.0, ignore_index: int = -1):
    """SegmentationModule training loss (models.py:34-84), vectorized.

    Returns (loss, (ce, var, inter, acc)).
    """
    n = logits.shape[0]
    hw = logits.shape[1] * logits.shape[2]
    valid = labels != ignore_index

    ce = cross_entropy(logits, labels, ignore_index)

    picked = _gather_logit(logits, labels)                  # (B, H, W)
    var_per_img = jnp.sum(jnp.where(valid, -picked, 0.0), axis=(1, 2)) / hw
    var = jnp.sum(var_per_img)

    total_per_pix = jnp.sum(logits, axis=-1)                # (B, H, W)
    inter_per_img = jnp.sum(
        jnp.where(valid, total_per_pix - picked, 0.0), axis=(1, 2)) / hw
    inter = jnp.sum(inter_per_img)

    loss = ce / n + alpha * var / n + beta * inter / n
    acc = pixel_acc(logits, labels)
    return loss, (ce, var, inter, acc)


def deeplab_cross_entropy(logits, labels, features_in=None, *,
                          alpha: float = 0.0, beta: float = 0.0,
                          gamma: float = 0.0, ignore_index: int = 255,
                          use_metric_terms: bool = False,
                          num_classes: Optional[int] = None):
    """utils/loss.py:25-82. Active reference path: ``CE / n``.

    With ``use_metric_terms`` the dead-code VAR/Inter/Center terms activate:
    loss = (CE + alpha*VAR + beta*Inter + gamma*Center) / n, with VAR/Inter
    normalized per-image by the full pixel count and Center the within-class
    embedding variance of ``features_in``.
    """
    n = logits.shape[0]
    ce = cross_entropy(logits, labels, ignore_index)
    if not use_metric_terms:
        return ce / n

    hw = logits.shape[1] * logits.shape[2]
    valid = labels != ignore_index
    picked = _gather_logit(logits, labels)
    var = jnp.sum(jnp.sum(jnp.where(valid, -picked, 0.0), axis=(1, 2)) / hw)
    total = jnp.sum(logits, axis=-1)
    inter = jnp.sum(
        jnp.sum(jnp.where(valid, total - picked, 0.0), axis=(1, 2)) / hw)

    center = 0.0
    if gamma and features_in is not None:
        k = num_classes or logits.shape[-1]
        labels_safe = jnp.where(valid, labels, 0)
        onehot = jax.nn.one_hot(labels_safe, k) * valid[..., None]
        # per-image, per-class masked mean of features (B, K, C)
        counts = jnp.einsum("bhwk->bk", onehot)
        sums = jnp.einsum("bhwk,bhwc->bkc", onehot, features_in)
        means = sums / jnp.maximum(counts, 1.0)[..., None]
        centered = features_in[..., None, :] - means[:, None, None, :, :]
        sq = jnp.sum(centered ** 2, axis=-1)                # (B,H,W,K)
        center = jnp.sum(
            jnp.einsum("bhwk,bhwk->b", onehot, sq) / hw)

    return (ce + alpha * var + beta * inter + gamma * center) / n


def focal_loss(logits, labels, *, alpha: float = 1.0, gamma: float = 0.0,
               ignore_index: int = 255, size_average: bool = True):
    """utils/loss.py:7-23."""
    valid = labels != ignore_index
    lse = jax.nn.logsumexp(logits, axis=-1)
    ce = lse - _gather_logit(logits, labels)
    ce = jnp.where(valid, ce, 0.0)
    pt = jnp.exp(-ce)
    fl = alpha * (1 - pt) ** gamma * ce
    fl = jnp.where(valid, fl, 0.0)
    if size_average:
        # torch F.cross_entropy(reduction='none') then .mean() averages over
        # ALL positions (ignored ones contribute 0), matching loss.py:21
        return jnp.mean(fl)
    return jnp.sum(fl)


def distillation_loss(logits, labels, features_1, features_2, *,
                      ignore_index: int = 255, novel_class: int = 16,
                      use_distillation_term: bool = False,
                      dis_weight: float = 0.01):
    """utils/loss.py:84-122 (CrossEntropyLoss_dis).

    Active reference path returns ``CE / n``. With ``use_distillation_term``,
    adds ``dis_weight * mean||f2 - f1||^2`` over non-novel pixels per image
    (features_1 zero-padded by one channel as in loss.py:106-107).
    """
    n = logits.shape[0]
    ce = cross_entropy(logits, labels, ignore_index)
    if not use_distillation_term:
        return ce / n

    f1 = jnp.pad(features_1, ((0, 0), (0, 0), (0, 0), (0, 1)))
    keep = (labels != novel_class)[..., None]
    diff = jnp.where(keep, features_2 - f1, 0.0)
    counts = jnp.maximum(jnp.sum(keep, axis=(1, 2, 3)), 1)
    dis = jnp.sum(
        jnp.sum(diff ** 2, axis=(1, 2, 3)) / counts.astype(diff.dtype))
    return ce / n + dis_weight * dis / n
