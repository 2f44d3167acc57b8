"""Segmentation quality metrics: pixel accuracy, histogram IoU, streaming mIoU.

Covers both metric stacks of the reference:

- ``pixel_accuracy`` / ``intersection_and_union`` mirror
  ``anomaly/utils.py:128-156`` (labels >= 0 are valid; the IoU histogram
  shifts labels by +1 and zeroes predictions on unlabeled pixels).
- ``StreamSegMetrics`` mirrors ``DeepLabV3Plus-Pytorch/metrics/stream_metrics.py``
  *as actually executed*: the reference hard-codes ``self.n_classes = 19``
  in ``__init__`` (stream_metrics.py:30) and every driver calls ``reset()``
  before use, so the running confusion matrix is always 19x19 regardless of
  the constructor argument; labels >= 19 (e.g. the 255 ignore id) fall outside
  the mask and rows for absent classes contribute NaN IoUs that ``nanmean``
  skips. We replicate that semantics with an explicit ``hist_classes=19``
  default so it is visible configuration, not an accident.

Device-side helpers (``confusion_matrix_update``, ``intersection_and_union_jax``)
compute the same histograms with jnp so eval loops can keep per-pixel work on
the TPU and only transfer K*K counts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pixel_accuracy(preds, label):
    """(accuracy, n_valid) over labels >= 0. Parity: anomaly/utils.py:128-133."""
    preds = np.asarray(preds)
    label = np.asarray(label)
    valid = label >= 0
    acc_sum = (valid * (preds == label)).sum()
    valid_sum = valid.sum()
    acc = float(acc_sum) / (valid_sum + 1e-10)
    return acc, valid_sum


def intersection_and_union(im_pred, im_lab, num_class):
    """Histogram intersection/union. Parity: anomaly/utils.py:136-156."""
    im_pred = np.asarray(im_pred).copy()
    im_lab = np.asarray(im_lab).copy()

    im_pred += 1
    im_lab += 1
    # unlabeled pixels (label 0 after shift) do not penalize predictions
    im_pred = im_pred * (im_lab > 0)

    intersection = im_pred * (im_pred == im_lab)
    area_intersection, _ = np.histogram(
        intersection, bins=num_class, range=(1, num_class))
    area_pred, _ = np.histogram(im_pred, bins=num_class, range=(1, num_class))
    area_lab, _ = np.histogram(im_lab, bins=num_class, range=(1, num_class))
    area_union = area_pred + area_lab - area_intersection
    return area_intersection, area_union


def intersection_and_union_jax(im_pred, im_lab, num_class: int):
    """Device-side version of :func:`intersection_and_union`.

    Note np.histogram with ``bins=K, range=(1, K)`` buckets value v into bin
    ``floor((v-1)*K/(K-1))`` clipped to K-1, with values outside [1, K]
    dropped — for integer labels 1..K this collapses classes K-1 and K into
    the last bin only when K > 1 and v==K-1... in fact for integers the edges
    land so that bin i collects v == 1 + i*(K-1)/K rounded — we reproduce the
    exact bucketing numerically by using the same float edges.
    """
    im_pred = im_pred.astype(jnp.int32) + 1
    im_lab = im_lab.astype(jnp.int32) + 1
    im_pred = im_pred * (im_lab > 0)
    intersection = im_pred * (im_pred == im_lab)

    edges = jnp.linspace(1.0, float(num_class), num_class + 1)

    def hist(v):
        v = v.reshape(-1).astype(jnp.float32)
        idx = jnp.searchsorted(edges, v, side="right") - 1
        idx = jnp.where(v == num_class, num_class - 1, idx)
        ok = (v >= 1.0) & (v <= num_class)
        idx = jnp.where(ok, idx, 0)
        return jnp.zeros((num_class,), jnp.int32).at[idx].add(ok.astype(jnp.int32))

    area_intersection = hist(intersection)
    area_pred = hist(im_pred)
    area_lab = hist(im_lab)
    return area_intersection, area_pred + area_lab - area_intersection


def confusion_matrix_update(hist, label_true, label_pred, n_classes: int):
    """Add the (n_classes, n_classes) confusion counts of one batch to ``hist``.

    jnp equivalent of stream_metrics.py:49-55 (`_fast_hist`): only pixels with
    0 <= label < n_classes enter the matrix; predictions index columns.
    Safe to jit; returns the updated histogram.
    """
    lt = label_true.reshape(-1).astype(jnp.int32)
    lp = label_pred.reshape(-1).astype(jnp.int32)
    mask = (lt >= 0) & (lt < n_classes)
    idx = jnp.where(mask, n_classes * lt + jnp.clip(lp, 0, n_classes - 1), 0)
    counts = jnp.zeros((n_classes * n_classes,), hist.dtype).at[idx].add(
        mask.astype(hist.dtype))
    return hist + counts.reshape(n_classes, n_classes)


class StreamSegMetrics:
    """Streaming confusion-matrix segmentation metrics.

    ``hist_classes`` defaults to 19, reproducing the reference's hard-coded
    behavior (see module docstring). Pass ``hist_classes=n_classes`` for the
    "fixed" semantics.
    """

    def __init__(self, n_classes: int, hist_classes: int = 19):
        # the reference hard-codes 19 outright; for n_classes > 19 (VOC's 21)
        # that makes its _fast_hist bincount overflow the 19x19 reshape the
        # moment a prediction exceeds 18 — i.e. the reference's VOC metrics
        # crash. Keep the quirk for n <= 19 (it affects which labels enter
        # the matrix) and use the true class count beyond it.
        self.n_classes = max(n_classes, hist_classes)
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes))

    def update(self, label_trues, label_preds):
        for lt, lp in zip(label_trues, label_preds):
            self.confusion_matrix += self._fast_hist(lt.flatten(), lp.flatten())

    def update_hist(self, hist):
        """Merge a device-computed confusion matrix (see confusion_matrix_update)."""
        self.confusion_matrix += np.asarray(hist)

    @staticmethod
    def to_str(results):
        string = "\n"
        for k, v in results.items():
            if k != "Class IoU":
                string += "%s: %f\n" % (k, v)
        return string

    def _fast_hist(self, label_true, label_pred):
        mask = (label_true >= 0) & (label_true < self.n_classes)
        hist = np.bincount(
            self.n_classes * label_true[mask].astype(int) + label_pred[mask],
            minlength=self.n_classes ** 2,
        ).reshape(self.n_classes, self.n_classes)
        return hist

    def get_results(self, verbose: bool = False):
        import warnings

        hist = self.confusion_matrix
        with np.errstate(divide="ignore", invalid="ignore"), \
                warnings.catch_warnings():
            # nanmean of an all-NaN row (empty matrix / no observed class)
            # warns through the warnings module, not errstate; NaN is the
            # correct reference-parity result there
            warnings.filterwarnings("ignore", "Mean of empty slice",
                                    RuntimeWarning)
            acc = np.diag(hist).sum() / hist.sum()
            acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
            iu = np.diag(hist) / (
                hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
            mean_iu = np.nanmean(iu)
            freq = hist.sum(axis=1) / hist.sum()
            fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
        if verbose:
            print(iu)
        cls_iu = dict(zip(range(self.n_classes), iu))
        return {
            "Overall Acc": acc,
            "Mean Acc": acc_cls,
            "FreqW Acc": fwavacc,
            "Mean IoU": mean_iu,
            "Class IoU": cls_iu,
        }

    def reset(self):
        self.confusion_matrix = np.zeros((self.n_classes, self.n_classes))
