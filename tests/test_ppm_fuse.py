"""ppm_fuse: pooled-resolution fuse conv vs the materialized-concat path.

The reformulation is exact up to float reassociation (linearity of conv,
bilinear upsample, and concat); the oracle here IS the materialized path
(upsample -> concat -> conv), which itself is parity-tested against torch
in test_reference_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_world_semantic_segmentation_tpu.ops.ppm_fuse import (
    ppm_fuse_conv, upsampled_conv3x3)
from open_world_semantic_segmentation_tpu.ops.resize import bilinear_resize


def _conv3x3(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


@pytest.mark.parametrize("pool,out", [
    (1, (7, 9)), (2, (8, 8)), (3, (11, 5)), (6, (13, 17)),
    (6, (4, 3)),  # out smaller than the pooled grid (downsample branch)
])
def test_upsampled_conv3x3_matches_materialized(pool, out):
    rng = np.random.default_rng(pool * 31 + out[0])
    c, cout = 24, 16
    p = jnp.asarray(rng.standard_normal((pool, pool, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.1, jnp.float32)
    want = _conv3x3(bilinear_resize(p, out)[None], k)[0]
    got = upsampled_conv3x3(p, k, out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ppm_fuse_conv_matches_concat_conv():
    rng = np.random.default_rng(0)
    n, h, w, c5, cp, cout = 2, 10, 14, 40, 24, 16
    scales = (1, 2, 3, 6)
    conv5 = jnp.asarray(rng.standard_normal((n, h, w, c5)), jnp.float32)
    pools = [jnp.asarray(rng.standard_normal((n, s, s, cp)), jnp.float32)
             for s in scales]
    ctot = c5 + cp * len(scales)
    k = jnp.asarray(rng.standard_normal((3, 3, ctot, cout)) * 0.1,
                    jnp.float32)
    cat = jnp.concatenate(
        [conv5] + [bilinear_resize(p, (h, w)) for p in pools], axis=-1)
    want = _conv3x3(cat, k)
    got = ppm_fuse_conv(conv5, pools, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_ppm_fuse_conv_jits_and_grads():
    # the fuse path runs inside the training step too: grads must flow
    rng = np.random.default_rng(1)
    conv5 = jnp.asarray(rng.standard_normal((1, 6, 6, 8)), jnp.float32)
    pools = [jnp.asarray(rng.standard_normal((1, s, s, 4)), jnp.float32)
             for s in (1, 2)]
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 5)) * 0.1, jnp.float32)

    def loss(k):
        return jnp.sum(ppm_fuse_conv(conv5, pools, k) ** 2)

    g = jax.jit(jax.grad(loss))(k)
    assert g.shape == k.shape and bool(jnp.all(jnp.isfinite(g)))


def test_conv3x3_custom_vjp_matches_autodiff_f32():
    """_conv3x3_f32out's hand-written VJP == jax autodiff (f32, where the
    builtin transpose rule works)."""
    from open_world_semantic_segmentation_tpu.ops.ppm_fuse import (
        _conv3x3_f32out)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 12)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 12, 6)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 9, 11, 6)), jnp.float32)

    def loss_custom(x, w):
        return jnp.sum(_conv3x3_f32out(x, w) * t)

    def loss_raw(x, w):
        return jnp.sum(_conv3x3(x, w) * t)

    gx, gw = jax.grad(loss_custom, argnums=(0, 1))(x, w)
    gx0, gw0 = jax.grad(loss_raw, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw0),
                               rtol=1e-5, atol=1e-5)


def test_ppm_fuse_conv_grads_in_bf16():
    """Regression: jax 0.9's conv transpose rejects the f32 cotangent of a
    bf16 conv with preferred_element_type=f32 — bf16 *training* through the
    fuse path crashed until the custom VJP. Grads must exist, be finite,
    and track the f32 gradients within bf16 tolerance."""
    rng = np.random.default_rng(3)
    conv5 = rng.standard_normal((1, 6, 6, 8))
    pools_np = [rng.standard_normal((1, s, s, 4)) for s in (1, 2)]
    k = rng.standard_normal((3, 3, 16, 5)) * 0.1

    def loss(k, conv5, pools, dt):
        y = ppm_fuse_conv(jnp.asarray(conv5, dt),
                          [jnp.asarray(p, dt) for p in pools],
                          jnp.asarray(k, dt))
        return jnp.sum(y ** 2)

    g_bf16 = jax.jit(jax.grad(loss), static_argnums=3)(
        jnp.asarray(k, jnp.bfloat16), conv5, pools_np, jnp.bfloat16)
    g_f32 = jax.jit(jax.grad(loss), static_argnums=3)(
        jnp.asarray(k, jnp.float32), conv5, pools_np, jnp.float32)
    assert g_bf16.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(g_bf16.astype(jnp.float32))))
    np.testing.assert_allclose(np.asarray(g_bf16, np.float32),
                               np.asarray(g_f32), rtol=0.1, atol=0.3)
