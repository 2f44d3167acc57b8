"""Device-side (jnp) OOD metrics: AUROC / AUPR / FPR@recall on-chip.

The host path (``metrics.anom``, the bit-parity port of
anomaly/anom_utils.py:7-116) sorts a ~1e6-element f64 vector per image on
the CPU — ~1.5 s/image on a small host, which throttles a ~50 imgs/sec
device pipeline to <1 img/sec end to end. This module computes the same
three numbers inside the jitted eval program so the host only ever sees
three scalars per image (and the 3.7 MB/img conf-map transfer disappears).

Same math, reformulated with static shapes for XLA:

- the sklearn threshold sweep (distinct-score thresholds = tie-block ends)
  becomes a descending sort + boundary mask; "value at the previous
  threshold" becomes a cummax of boundary-masked monotone series;
- AUROC uses the tie-averaged-rank (Mann-Whitney) identity, which equals
  the grouped trapezoid of the ROC curve exactly;
- AUPR is the boundary-masked step sum  AP = sum_k (R_k - R_{k-1}) P_k;
- FPR@recall ports anom_utils.py:25-65 including the reversed-slice
  argmin tie-breaking (largest threshold index wins ties; the appended
  (recall=1, fps=0) endpoint loses ties).

Numerics: counts are exact in f32 up to 2^24 pixels (a 720x1280 image is
9.2e5); the AUROC numerator is a difference of ~1e10-scale sums whose
tree-reduction error is ~1e-6 relative — parity with the f64 host path is
asserted to 1e-5 in tests. The host path remains the oracle; this is the
throughput path.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

RECALL_LEVEL_DEFAULT = 0.95


def _shift_right(x, fill):
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


@partial(jax.jit, static_argnames=("out_labels", "recall_level"))
def ood_measures_from_maps(conf, seg_label, out_labels: Sequence[int] = (13,),
                           recall_level: float = RECALL_LEVEL_DEFAULT):
    """(auroc, aupr, fpr, valid) from a confidence map and a label map.

    Mirrors ``metrics.anom.eval_ood_measure`` (eval_ood_traditional.py:
    128-148): score = -conf, positives are pixels whose label is in
    ``out_labels``, ALL pixels participate. ``valid`` is False when the
    image is single-class (the host path returns None there); the metric
    outputs are zeros in that case and must be ignored.
    """
    score = -conf.reshape(-1).astype(jnp.float32)
    lab = seg_label.reshape(-1)
    y = jnp.zeros(lab.shape, bool)
    for out in out_labels:
        y = y | (lab == out)
    n = score.shape[0]

    order = jnp.argsort(-score)  # descending, stable
    s = jnp.take(score, order)
    t = jnp.take(y, order).astype(jnp.float32)

    tp = jnp.cumsum(t)
    idx = jnp.arange(n, dtype=jnp.float32)
    fp = (idx + 1.0) - tp
    # tie-block ends == sklearn's distinct-score threshold positions
    b = jnp.concatenate([s[:-1] != s[1:], jnp.ones((1,), bool)])

    p_total = tp[-1]
    n_neg = jnp.float32(n) - p_total
    valid = (p_total > 0) & (n_neg > 0)
    p_safe = jnp.maximum(p_total, 1.0)
    n_safe = jnp.maximum(n_neg, 1.0)

    # ---- AUROC: tie-averaged ascending ranks (Mann-Whitney U) ----------
    # block start a_i / end e_i in descending-position space
    prev_b = _shift_right(
        lax.associative_scan(jnp.maximum, jnp.where(b, idx, -1.0)), -1.0)
    a = prev_b + 1.0
    e = lax.associative_scan(
        jnp.minimum, jnp.where(b, idx, jnp.float32(n)), reverse=True)
    # ascending rank of descending position i is n - i; block average:
    avg_rank = jnp.float32(n) - 0.5 * (a + e)
    u_sum = jnp.sum(avg_rank * t)
    auroc = (u_sum - 0.5 * p_safe * (p_safe + 1.0)) / (p_safe * n_safe)

    # ---- AUPR: step sum over threshold points ---------------------------
    prev_tp = _shift_right(
        lax.associative_scan(jnp.maximum, jnp.where(b, tp, 0.0)), 0.0)
    precision = tp / (tp + fp)
    aupr = jnp.sum(jnp.where(b, (tp - prev_tp) * precision, 0.0)) / p_safe

    # ---- FPR@recall: anom_utils.py:25-65 port ---------------------------
    # first boundary position with full recall (tps.searchsorted(tps[-1]))
    full = b & (tp >= p_total)
    p_star = jnp.min(jnp.where(full, idx, jnp.float32(n)))
    cand = b & (idx <= p_star)
    d = jnp.where(cand, jnp.abs(tp / p_safe - recall_level), jnp.inf)
    d_min = jnp.min(d)
    # appended (recall=1, fps=0) endpoint; compute its distance with the
    # SAME f32 arithmetic as the candidates so exact-tie handling (full
    # recall reached at a threshold) resolves like the host's f64 path
    import numpy as _np

    d_virtual = jnp.float32(
        abs(_np.float32(1.0) - _np.float32(recall_level)))
    # ties between candidates: the reversed-array argmin scans from
    # last_ind downward, so the LARGEST threshold index wins; the virtual
    # endpoint is scanned last and loses ties
    best_pos = jnp.max(jnp.where(d == d_min, idx, -1.0))
    fps_best = jnp.sum(jnp.where(idx == best_pos, fp, 0.0))
    fpr = jnp.where(d_min <= d_virtual, fps_best, 0.0) / n_safe

    zero = jnp.zeros((), jnp.float32)
    return (jnp.where(valid, auroc, zero), jnp.where(valid, aupr, zero),
            jnp.where(valid, fpr, zero), valid)
