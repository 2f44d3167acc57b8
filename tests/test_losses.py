"""Loss parity tests vs a direct transliteration of the reference loops
(torch CPU as oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from open_world_semantic_segmentation_tpu.train import (
    cross_entropy,
    pixel_acc,
    dml_segmentation_loss,
    deeplab_cross_entropy,
    focal_loss,
    distillation_loss,
)


def _case(b=2, h=9, w=11, c=13, ignore=-1, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, h, w))
    labels[rng.random((b, h, w)) < 0.15] = ignore
    return logits, labels


def test_cross_entropy_matches_torch():
    logits, labels = _case()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), -1))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels), ignore_index=-1).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_pixel_acc_matches_reference():
    logits, labels = _case()
    got = float(pixel_acc(jnp.asarray(logits), jnp.asarray(labels)))
    preds = logits.argmax(-1)
    valid = labels >= 0
    want = (valid & (preds == labels)).sum() / (valid.sum() + 1e-10)
    assert got == pytest.approx(want, rel=1e-6)


def _reference_var_inter(logits, labels, ignore=-1):
    """Transliteration of the python loop at models.py:46-70 (test oracle)."""
    n, h, w, c = logits.shape
    VAR = 0.0
    Inter = 0.0
    for i in range(n):
        label = labels[i].flatten()
        feats = logits[i].reshape(h * w, c)
        instances, counts = np.unique(label, return_counts=True)
        total = counts.sum()
        for inst in instances:
            if inst == ignore:
                continue
            vecs = feats[label == inst]
            VAR += np.sum(-vecs[:, int(inst)]) / total
            Inter += (np.sum(vecs) - np.sum(vecs[:, int(inst)])) / total
    return VAR, Inter


def test_dml_loss_matches_reference_loop():
    logits, labels = _case(seed=3)
    n = logits.shape[0]
    loss, (ce, var, inter, acc) = dml_segmentation_loss(
        jnp.asarray(logits), jnp.asarray(labels), alpha=0.01, beta=0.0)
    want_var, want_inter = _reference_var_inter(logits, labels)
    assert float(var) == pytest.approx(want_var, rel=1e-4)
    assert float(inter) == pytest.approx(want_inter, rel=1e-4)
    want_ce = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels), ignore_index=-1).item()
    assert float(loss) == pytest.approx(
        want_ce / n + 0.01 * want_var / n, rel=1e-4)


def test_deeplab_ce_active_path_is_ce_over_n():
    logits, labels = _case(c=16, ignore=255, seed=4)
    got = float(deeplab_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), ignore_index=255))
    want = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(), ignore_index=255).item()
    assert got == pytest.approx(want / logits.shape[0], rel=1e-5)


def test_focal_loss_matches_torch_formula():
    logits, labels = _case(c=16, ignore=255, seed=5)
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                           alpha=1.0, gamma=2.0, ignore_index=255))
    ce = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(), reduction="none", ignore_index=255)
    pt = torch.exp(-ce)
    want = (1.0 * (1 - pt) ** 2 * ce).mean().item()
    assert got == pytest.approx(want, rel=1e-5)


def test_distillation_loss_active_and_full_paths():
    logits, labels = _case(c=17, ignore=255, seed=6)
    rng = np.random.default_rng(7)
    f1 = rng.standard_normal((*labels.shape, 16)).astype(np.float32)
    f2 = rng.standard_normal((*labels.shape, 17)).astype(np.float32)
    labels[0, :3] = 16  # some novel pixels

    n = logits.shape[0]
    got = float(distillation_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(f1),
        jnp.asarray(f2), ignore_index=255))
    want_ce = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels).long(), ignore_index=255).item()
    assert got == pytest.approx(want_ce / n, rel=1e-5)

    full = float(distillation_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(f1),
        jnp.asarray(f2), ignore_index=255, use_distillation_term=True))
    # manual: per image mean ||f2 - pad(f1)||^2 over non-novel pixels
    f1p = np.concatenate([f1, np.zeros((*labels.shape, 1), np.float32)], -1)
    dis = 0.0
    for i in range(n):
        keep = labels[i] != 16
        d = (f2[i][keep] - f1p[i][keep])
        dis += (d ** 2).sum() / keep.sum()
    assert full == pytest.approx(want_ce / n + 0.01 * dis / n, rel=1e-4)


def test_dml_loss_log_softmax_mode_matches_reference_nll_path():
    """Closed-set decoders feed log-softmax into SegmentationModule; the VAR
    term then sums -log_prob[y]. CE via NLL on log-probs == CE on logits."""
    import jax

    logits, labels = _case(seed=8)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    loss, (ce, var, inter, acc) = dml_segmentation_loss(
        jnp.asarray(logp), jnp.asarray(labels), alpha=0.01)
    want_var, _ = _reference_var_inter(logp, labels)
    assert float(var) == pytest.approx(want_var, rel=1e-4)
    # CE on log-probs equals CE on original logits
    want_ce = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels), ignore_index=-1).item()
    assert float(ce) == pytest.approx(want_ce, rel=1e-4)
