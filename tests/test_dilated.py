"""Shift+matmul dilated-conv formulation (ops/dilated.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.ops.dilated import (
    dilated_conv3x3_shift,
)

pytestmark = pytest.mark.e2e


@pytest.mark.parametrize("dilation", [(1, 1), (6, 6), (12, 12), (18, 18)])
def test_shift_matches_native_conv(dilation):
    """Nine shifted matmuls == lax dilated conv with symmetric padding,
    including the zero-padding border semantics."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 52, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(dilation[0],) * 2, (dilation[1],) * 2],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = dilated_conv3x3_shift(x, w, dilation)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_aspp_forward_argmax_equal_under_env(monkeypatch):
    """The DeepLab model routed through the shift formulation produces the
    same predictions as the native lowering (shift is the DEFAULT since
    round 4 — pin 'native' explicitly for the reference side)."""
    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet50)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 96, 128, 3)), jnp.float32)
    model = deeplabv3plus_embedding_resnet50(num_classes=16)
    v = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("OWSS_DILATED_IMPL", "native")
    logits_native = np.asarray(model.apply(v, x)[0], np.float32)
    monkeypatch.setenv("OWSS_DILATED_IMPL", "shift")
    logits_shift = np.asarray(model.apply(v, x)[0], np.float32)

    # f32 compute: formulations agree to accumulation-order rounding
    np.testing.assert_allclose(logits_shift, logits_native,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(logits_shift.argmax(-1),
                                  logits_native.argmax(-1))


def test_default_dataflow_matches_reference_dataflow(monkeypatch):
    """The shipped DEFAULT (concat-free ASPP projection + shift dilated
    convs) equals the materialized reference dataflow (5-way concat +
    native conv lowering) on the same variables — the round-4 +20%
    eval win is a pure dataflow change (docs/DESIGN.md round-4 audit)."""
    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet50)

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 96, 128, 3)), jnp.float32)
    model = deeplabv3plus_embedding_resnet50(num_classes=16)
    v = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.delenv("OWSS_DILATED_IMPL", raising=False)
    monkeypatch.delenv("OWSS_ASPP_PROJECT", raising=False)
    monkeypatch.delenv("OWSS_STEM_IMPL", raising=False)
    logits_default = np.asarray(model.apply(v, x)[0], np.float32)

    monkeypatch.setenv("OWSS_DILATED_IMPL", "native")
    monkeypatch.setenv("OWSS_ASPP_PROJECT", "concat")
    monkeypatch.setenv("OWSS_STEM_IMPL", "native")
    logits_ref = np.asarray(model.apply(v, x)[0], np.float32)

    np.testing.assert_allclose(logits_default, logits_ref,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(logits_default.argmax(-1),
                                  logits_ref.argmax(-1))
