"""Fused bottleneck Pallas kernel vs an XLA reference block.

Interpreter mode on CPU (conftest pins the CPU platform); the real-TPU
numbers live in tools/bench_block.py + docs/DESIGN.md.  The reference
implementation below IS the torch Bottleneck dataflow
(/root/reference/anomaly/models/resnet.py:62-93) with BN already folded —
fold correctness itself is covered by test_reference_parity.py (the
ConvBN modules).  The backbone deliberately does NOT route through this
kernel: on-chip it only ties XLA at flagship geometries (docs/DESIGN.md),
so it ships as a standalone op with these oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_world_semantic_segmentation_tpu.ops.pallas_block import (
    fused_bottleneck, fold_convbn, pick_tile_h, sublane)


def _round_up(x, m):
    return -(-x // m) * m


def ref_block(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, d=1):
    y = jnp.maximum(jnp.einsum("hwc,cm->hwm", x, w1) + b1, 0.0)
    y = jax.lax.conv_general_dilated(
        y[None], w2, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    y = jnp.maximum(y + b2, 0.0)
    y = jnp.einsum("hwm,mo->hwo", y, w3) + b3
    skip = x if wd is None else jnp.einsum("hwc,co->hwo", x, wd) + bd
    return jnp.maximum(y + skip, 0.0)


def _mk(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.3


def _run(h, w, cin, cmid, cout, d, tile_h, down, dtype=jnp.float32,
         garbage_slack=False):
    rng = np.random.default_rng(h * 100 + w + d)
    x = _mk(rng, h, w, cin)
    w1, b1 = _mk(rng, cin, cmid), _mk(rng, cmid)
    w2, b2 = _mk(rng, 3, 3, cmid, cmid) * 0.2, _mk(rng, cmid)
    w3, b3 = _mk(rng, cmid, cout), _mk(rng, cout)
    wd = bd = None
    if down:
        wd, bd = _mk(rng, cin, cout), _mk(rng, cout)
    want = ref_block(x, w1, b1, w2, b2, w3, b3, wd, bd, d=d)

    wp = _round_up(w + d, sublane(dtype))
    xp = jnp.zeros((h, wp, cin), dtype).at[:, :w].set(x.astype(dtype))
    if garbage_slack:  # kernel contract: input slack content is ignored
        xp = xp.at[:, w:].set(jnp.nan)
    got = fused_bottleneck(
        xp, w1, b1, w2, b2, w3, b3, wd, bd, dilation=d, width=w,
        tile_h=tile_h, interpret=True)
    assert got.shape == (h, wp, cout)
    np.testing.assert_array_equal(np.asarray(got[:, w:]), 0.0)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got[:, :w], jnp.float32),
                               np.asarray(want), rtol=tol, atol=tol)


@pytest.mark.parametrize("case", [
    # (h, w, cin, cmid, cout, d, tile_h, down)
    (13, 21, 32, 16, 32, 1, 8, False),    # ragged h, identity skip
    (25, 33, 32, 16, 32, 2, 8, False),    # dilation 2, partial last tile
    (16, 24, 24, 16, 48, 1, 8, True),     # downsample skip, exact tiles
    (5, 11, 16, 8, 16, 2, 8, False),      # single grid step (h < tile_h)
    (17, 19, 16, 8, 16, 4, 4, False),     # dilation 4, tiny tiles
    (9, 130, 16, 8, 16, 1, 8, False),     # w > one lane tile
])
def test_fused_bottleneck_matches_xla(case):
    _run(*case)


def test_fused_bottleneck_ignores_slack_garbage():
    # NaN in the input slack must not leak: masking uses select, and the
    # output slack is exactly zero (the invariant that would let fused
    # blocks chain without repacking)
    _run(13, 21, 32, 16, 32, 1, 8, False, garbage_slack=True)


def test_fused_bottleneck_bf16():
    _run(14, 22, 32, 16, 32, 2, 8, False, dtype=jnp.bfloat16)


def test_fold_convbn_matches_batchnorm():
    rng = np.random.default_rng(0)
    k = _mk(rng, 1, 1, 8, 4)
    scale, bias = _mk(rng, 4) + 1.0, _mk(rng, 4)
    mean, var = _mk(rng, 4), jnp.abs(_mk(rng, 4)) + 0.5
    x = _mk(rng, 6, 6, 8)
    w, b = fold_convbn(k, scale, bias, mean, var, eps=1e-5)
    got = jnp.einsum("hwc,cm->hwm", x, w[0, 0]) + b
    y = jnp.einsum("hwc,cm->hwm", x, k[0, 0])
    want = scale * (y - mean) / jnp.sqrt(var + 1e-5) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pick_tile_h_flagship_geometry():
    # resnet50dilated OS8 at the largest bench scale (568x1000 -> 71x125):
    # layers 1-3 must be feasible, layer4 (12 MB of bf16 weights) must not
    assert pick_tile_h(256, 64, 256, 272, 1, 2) is not None      # layer1
    assert pick_tile_h(512, 128, 512, 144, 1, 2) is not None     # layer2
    assert pick_tile_h(1024, 256, 1024, 144, 2, 2) is not None   # layer3
    assert pick_tile_h(2048, 512, 2048, 144, 4, 2) is None       # layer4
