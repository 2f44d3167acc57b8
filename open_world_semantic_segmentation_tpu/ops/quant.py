"""Post-training int8 quantization for the conv trunk (opt-in).

The flagship eval program (5-scale PSPNet forward, bench.py) is HBM-bound
at ~61% MXU utilization on v5e. int8 attacks both walls at once: the MXU
runs s8xs8->s32 at twice the bf16 rate, and int8 activations/weights halve
the HBM bytes per conv. This module provides the building blocks; the model
side lives in ``models/layers.py`` (ConvBN ``quant`` modes).

Scheme (classic symmetric PTQ):
- weights: per-output-channel symmetric int8, ``s_w[c] = max|w[..c]|/127``,
  quantized inline from the fp32 params (tiny vs conv cost; XLA hoists the
  loop-invariant quantization out of image scans);
- activations: per-tensor symmetric int8 with a *static* calibrated scale
  (``amax`` recorded over calibration images, stored in the ``quant``
  variable collection). Static scales let XLA fuse the requantize chain
  (dequant -> BN -> ReLU -> quant) into the producing conv's epilogue, so
  inter-layer activations travel HBM as 1-byte int8 instead of 2-byte bf16.

This is an OPT-IN precision mode: bit-exact reference parity holds only for
fp32/bf16; int8 trades bounded numeric drift for ~1.5-2x throughput. The
parity test asserts argmax agreement on random-weight forwards
(tests/test_quant.py).

No reference equivalent (the reference evaluates in fp32 CUDA only); this
is a TPU-native extension.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_weight(w):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns ``(w_q int8, scale f32[out])`` with ``w ~= w_q * scale``.
    """
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def quantize_act(x, amax):
    """Per-tensor symmetric int8 with a static scale ``amax/127``.

    Returns ``(x_q int8, scale f32 scalar)``.
    """
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                   -127, 127).astype(jnp.int8)
    return x_q, scale


def calibrate(model, variables, images, seg_size=None):
    """Record per-layer activation amax over calibration images.

    ``model`` must be built with ``quant="calib"`` (ConvBN then maximizes
    its ``quant/amax`` variable over observed inputs). Returns ``variables``
    with the updated ``quant`` collection merged in; feed the result to a
    ``quant="int8"`` model.
    """
    for img in images:
        if img.ndim == 3:
            img = img[None]
        kw = {} if seg_size is None else {"seg_size": seg_size}
        _, updates = model.apply(variables, jnp.asarray(img),
                                 mutable=["quant"], **kw)
        variables = {**variables, "quant": updates["quant"]}
    return variables
