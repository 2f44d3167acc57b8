"""Opt-in int8 PTQ mode (ops/quant.py + ConvBN quant modes).

int8 is NOT a parity path — these tests pin down (a) the quantization
primitives, (b) that the int8 model shares the exact param pytree with the
normal model (checkpoints load unchanged), and (c) that end-to-end argmax
drift on a random-weight model stays small.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.models import ModelBuilder
from open_world_semantic_segmentation_tpu.ops.quant import (
    calibrate,
    prequantize,
    quantize_act,
    quantize_weight,
)

pytestmark = pytest.mark.e2e


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    # per-channel scales differ by 100x; per-tensor would lose small ones
    w = rng.standard_normal((3, 3, 8, 4)).astype(np.float32)
    w[..., 1] *= 100.0
    w[..., 2] *= 0.01
    w_q, s = quantize_weight(jnp.asarray(w))
    assert w_q.dtype == jnp.int8 and s.shape == (4,)
    deq = np.asarray(w_q, np.float32) * np.asarray(s)
    for c in range(4):
        scale_c = np.abs(w[..., c]).max()
        np.testing.assert_allclose(deq[..., c], w[..., c],
                                   atol=scale_c / 127 * 0.51)


def test_quantize_act_static_scale():
    x = jnp.asarray([[0.5, -2.0, 10.0]], jnp.float32)
    x_q, s = quantize_act(x, jnp.asarray(4.0))  # amax 4 -> 10.0 saturates
    assert x_q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(x_q), [[16, -64, 127]])
    np.testing.assert_allclose(float(s), 4.0 / 127)


@pytest.fixture(scope="module")
def tiny_setup():
    kw = dict(num_class=13, fc_dim=512)
    m_off = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", **kw)
    m_cal = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="calib", **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 48, 48, 3)), jnp.float32)
    v = m_off.init(jax.random.PRNGKey(0), x)
    imgs = [rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
            for _ in range(2)]
    v_cal = calibrate(m_cal, dict(v), imgs, seg_size=(48, 48))
    out_off = m_off.apply(v, x, seg_size=(48, 48))
    return kw, x, v, v_cal, np.asarray(out_off["scores"][0], np.float32)


@pytest.mark.parametrize("mode", ["int8", "int8-3x3"])
def test_int8_forward_close_to_fp(tiny_setup, mode):
    kw, x, v, v_cal, s_off = tiny_setup
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant=mode, **kw)
    out_q = m_q.apply(v_cal, x, seg_size=(48, 48))
    s_q = np.asarray(out_q["scores"][0], np.float32)
    agree = (s_off.argmax(-1) == s_q.argmax(-1)).mean()
    rel = np.abs(s_off - s_q).max() / np.abs(s_off).max()
    # random weights are the worst case for PTQ; trained nets do better
    assert agree > 0.9, f"argmax agreement {agree}"
    assert rel < 0.05, f"relative score error {rel}"


def test_param_tree_identical_across_quant_modes(tiny_setup):
    """quant modes reuse the exact conv/kernel param paths — a checkpoint
    trained with quant='off' loads into the int8 model unchanged."""
    kw, x, v, _, _ = tiny_setup
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="int8", **kw)
    v_q = m_q.init(jax.random.PRNGKey(0), x)
    paths_off = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     v["params"])[0]}
    paths_q = {jax.tree_util.keystr(p)
               for p, _ in jax.tree_util.tree_flatten_with_path(
                   v_q["params"])[0]}
    assert paths_off == paths_q


def test_calibration_records_amax_monotonically():
    kw = dict(num_class=13, fc_dim=512)
    m_cal = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="calib", **kw)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    v = m_cal.init(jax.random.PRNGKey(0), x)
    v1 = calibrate(m_cal, dict(v), [np.asarray(x) * 0.5], seg_size=(32, 32))
    v2 = calibrate(m_cal, dict(v1), [np.asarray(x) * 2.0], seg_size=(32, 32))
    a1 = np.array(jax.tree_util.tree_leaves(v1["quant"]))
    a2 = np.array(jax.tree_util.tree_leaves(v2["quant"]))
    assert (a2 >= a1).all() and (a2 > a1).any()


def test_prequantized_matches_inline_int8(tiny_setup):
    """Offline weight quantization (prequantize) produces bit-identical
    outputs to the inline path — same int8 kernels, same scales, just
    computed once outside the program."""
    kw, x, v, v_cal, _ = tiny_setup
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="int8", **kw)
    out_inline = m_q.apply(v_cal, x, seg_size=(48, 48))
    v_pre = prequantize(v_cal)
    # every calibrated conv kernel is now int8 with a sibling w_scale
    n_int8 = sum(1 for leaf in jax.tree_util.tree_leaves(v_pre["params"])
                 if leaf.dtype == jnp.int8)
    n_amax = sum(1 for p, _ in jax.tree_util.tree_flatten_with_path(
        v_pre["quant"])[0] if "amax" in jax.tree_util.keystr(p))
    assert n_int8 == n_amax > 0
    out_pre = m_q.apply(v_pre, x, seg_size=(48, 48))
    np.testing.assert_array_equal(np.asarray(out_inline["scores"]),
                                  np.asarray(out_pre["scores"]))


def test_w4a8_prequantize_forward_close_to_int8(tiny_setup):
    """mode='w4a8': kernels stored int4 (half the HBM weight bytes of
    int8), upcast in-program; outputs stay close to the int8 path and the
    fp argmax (int4 per-channel is coarser, so a looser bound)."""
    kw, x, v, v_cal, s_off = tiny_setup
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="int8", **kw)
    v4 = prequantize(v_cal, mode="w4a8")
    n_int4 = sum(1 for leaf in jax.tree_util.tree_leaves(v4["params"])
                 if leaf.dtype == jnp.int4)
    assert n_int4 > 0
    out4 = m_q.apply(v4, x, seg_size=(48, 48))
    s4 = np.asarray(out4["scores"][0], np.float32)
    agree = (s_off.argmax(-1) == s4.argmax(-1)).mean()
    # random weights are the WORST case for 4-bit (16 levels/channel):
    # measured ~0.84 here; trained nets are far tighter (the metric-level
    # drift on trained weights is asserted in tests/test_quant_drift.py)
    assert agree > 0.8, f"w4a8 argmax agreement vs fp: {agree}"

    # the INLINE w4a8 path (quant="w4a8" on f32 kernels — the only viable
    # TPU route, since int4 cannot cross the host<->device boundary) is
    # bit-identical to consuming offline-prequantized int4 kernels
    m_w4 = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="w4a8", **kw)
    out_w4 = m_w4.apply(v_cal, x, seg_size=(48, 48))
    np.testing.assert_array_equal(np.asarray(out_w4["scores"]),
                                  np.asarray(out4["scores"]))


def test_prequantized_int8_3x3_keeps_1x1_fp(tiny_setup):
    """mode='int8-3x3' prequantization must leave 1x1 kernels fp32: the
    eval model routes them through the plain conv path, which would
    consume a raw int8 kernel without dequantizing (garbage outputs)."""
    kw, x, v, v_cal, s_off = tiny_setup
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="int8-3x3", **kw)
    out_inline = m_q.apply(v_cal, x, seg_size=(48, 48))
    v_pre = prequantize(v_cal, mode="int8-3x3")
    # 1x1 kernels stayed fp32
    for p, leaf in jax.tree_util.tree_flatten_with_path(
            v_pre["params"])[0]:
        if "kernel" in jax.tree_util.keystr(p) and leaf.ndim == 4 \
                and leaf.shape[0] == leaf.shape[1] == 1:
            assert leaf.dtype == jnp.float32, jax.tree_util.keystr(p)
    out_pre = m_q.apply(v_pre, x, seg_size=(48, 48))
    np.testing.assert_array_equal(np.asarray(out_inline["scores"]),
                                  np.asarray(out_pre["scores"]))
    # and the result is still close to the fp reference (i.e. not garbage)
    s_pre = np.asarray(out_pre["scores"][0], np.float32)
    assert (s_off.argmax(-1) == s_pre.argmax(-1)).mean() > 0.9


def test_int8_hybrid_forward_and_prequantize(tiny_setup):
    """quant='int8-hybrid': int8 backbone + PPM branches, concat-free
    PPMFuse head. Inline (fp32 fuse kernel) must track the fp path; the
    prequantized tree stores the fuse kernel int8 and PPMFuse dequantizes
    it exactly (per-channel scale applied after the conv), so the
    prequantized output stays close to inline (fuse weight quantization
    is the only difference)."""
    kw, x, v, v_cal, s_off = tiny_setup
    m_h = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="int8-hybrid",
        **kw)
    # param tree identical to the normal model: checkpoints load unchanged
    v_h = m_h.init(jax.random.PRNGKey(0), x)
    paths = {jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(v["params"])[0]}
    paths_h = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(v_h["params"])[0]}
    assert paths == paths_h

    out_inline = m_h.apply(v_cal, x, seg_size=(48, 48))
    s_in = np.asarray(out_inline["scores"][0], np.float32)
    agree = (s_off.argmax(-1) == s_in.argmax(-1)).mean()
    assert agree > 0.9, f"hybrid argmax agreement vs fp: {agree}"

    v_pre = prequantize(v_cal, mode="int8-hybrid")
    fuse_kernel = v_pre["params"]["decoder"]["conv_last"]["fuse"]["conv"][
        "kernel"]
    assert fuse_kernel.dtype == jnp.int8
    out_pre = m_h.apply(v_pre, x, seg_size=(48, 48))
    s_pre = np.asarray(out_pre["scores"][0], np.float32)
    # only the fuse weights differ (int8 per-channel); outputs stay close
    rel = np.abs(s_pre - s_in).max() / np.abs(s_in).max()
    assert rel < 0.05, f"hybrid prequant vs inline rel err {rel}"
    assert (s_off.argmax(-1) == s_pre.argmax(-1)).mean() > 0.9


def test_prequantize_requires_calibration(tiny_setup):
    kw, x, v, _, _ = tiny_setup
    with pytest.raises(ValueError):
        prequantize(dict(v))


def test_deeplab_int8_forward_close_to_fp():
    """quant also wired through the DeepLab stack (backbone + ASPP head)."""
    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet50)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m_off = deeplabv3plus_embedding_resnet50(num_classes=16)
    m_cal = deeplabv3plus_embedding_resnet50(num_classes=16, quant="calib")
    m_q = deeplabv3plus_embedding_resnet50(num_classes=16, quant="int8")
    v = m_off.init(jax.random.PRNGKey(0), x)
    v_cal = calibrate(m_cal, dict(v), [np.asarray(x)])
    logits_off = np.asarray(m_off.apply(v, x)[0], np.float32)
    logits_q = np.asarray(m_q.apply(v_cal, x)[0], np.float32)
    agree = (logits_off.argmax(-1) == logits_q.argmax(-1)).mean()
    assert agree > 0.9, f"argmax agreement {agree}"


def test_deeplab_int8_hybrid_backbone_only():
    """int8-hybrid on the DeepLab stack = int8 BACKBONE only
    (models/deeplab.py _split_quant): head kernels stay f32 (so the
    bf16 head keeps the round-4 fast dataflows), backbone stage kernels
    prequantize to int8, and the hybrid forward tracks the fp forward."""
    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet50)
    from open_world_semantic_segmentation_tpu.ops.quant import (
        calibrate_and_prequantize)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m_off = deeplabv3plus_embedding_resnet50(num_classes=16)
    m_cal = deeplabv3plus_embedding_resnet50(num_classes=16,
                                             quant="calib-hybrid")
    m_q = deeplabv3plus_embedding_resnet50(num_classes=16,
                                           quant="int8-hybrid")
    v = m_off.init(jax.random.PRNGKey(0), x)
    v_q = calibrate_and_prequantize(m_cal, dict(v), [np.asarray(x)],
                                    mode="int8-hybrid")

    # amax recorded ONLY in the backbone; head params untouched (f32)
    assert "backbone" in v_q["quant"] and "head" not in v_q["quant"]
    head_dtypes = {leaf.dtype for leaf in
                   jax.tree_util.tree_leaves(v_q["params"]["head"])}
    assert jnp.int8 not in head_dtypes
    n_int8 = sum(1 for leaf in
                 jax.tree_util.tree_leaves(v_q["params"]["backbone"])
                 if leaf.dtype == jnp.int8)
    assert n_int8 > 0

    logits_off = np.asarray(m_off.apply(v, x)[0], np.float32)
    logits_q = np.asarray(m_q.apply(v_q, x)[0], np.float32)
    agree = (logits_off.argmax(-1) == logits_q.argmax(-1)).mean()
    assert agree > 0.9, f"argmax agreement {agree}"


def test_calibrate_for_quant_with_image_glob(tmp_path):
    """CLI-side calibration helper: real image files via --calib-glob."""
    from PIL import Image

    from open_world_semantic_segmentation_tpu.cli._common import (
        calibrate_for_quant)
    from open_world_semantic_segmentation_tpu.core.config import Config

    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 56, 3),
                                     dtype=np.uint8)).save(
            str(tmp_path / f"cal_{i}.png"))

    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    m_off = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        fc_dim=512)
    v = m_off.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 48, 3), jnp.float32))
    v_q = calibrate_for_quant(cfg, v, (32, 48), dtype=jnp.float32,
                              use_softmax=True,
                              calib_glob=str(tmp_path / "cal_*.png"),
                              quant="int8")
    assert "quant" in v_q
    n_int8 = sum(1 for leaf in jax.tree_util.tree_leaves(v_q["params"])
                 if leaf.dtype == jnp.int8)
    assert n_int8 > 0
    # and the int8 model runs on the calibrated tree
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        fc_dim=512, quant="int8")
    out = m_q.apply(v_q, jnp.zeros((1, 32, 48, 3), jnp.float32),
                    seg_size=(32, 48))
    assert out["scores"].shape == (1, 32, 48, 13)


def test_quant_stages_override():
    enc = ModelBuilder.build_encoder("resnet18dilated", quant="int8",
                                     quant_stages=(0, 1, 2, 3))
    assert enc.quant == "int8" and enc.quant_stages == (0, 1, 2, 3)
    enc_default = ModelBuilder.build_encoder("resnet18dilated", quant="int8")
    assert enc_default.quant_stages == (1, 2, 3)


def test_quant_rejected_for_training_and_unwired_archs():
    with pytest.raises(ValueError):
        ModelBuilder.build_segmentation_model(
            "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
            quant="int8", train=True)
    with pytest.raises(ValueError):
        ModelBuilder.build_encoder("hrnetv2", quant="int8")
    with pytest.raises(ValueError):
        ModelBuilder.build_decoder("c1", quant="int8")
