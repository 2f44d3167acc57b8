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


def quantize_weight_int4(w):
    """Per-output-channel symmetric int4 quantization of an HWIO kernel.

    Returns ``(w_q int4, scale f32[out])`` with ``w ~= w_q * scale``.
    The w4a8 mode: after int8 activations, the weights are the residual
    HBM traffic of the flagship HBM-bound program — int4 halves those
    bytes again. The conv itself still runs s8 x s8 on the MXU (the int4
    tensor upcasts in-register); only the HBM representation shrinks.
    """
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / 7.0
    w_q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int4)
    return w_q, scale.astype(jnp.float32)


def quantize_act(x, amax):
    """Per-tensor symmetric int8 with a static scale ``amax/127``.

    Returns ``(x_q int8, scale f32 scalar)``. An uncalibrated scale
    (``amax <= 0`` — the init value before :func:`calibrate` runs)
    poisons the returned scale with NaN so the layer's output (scaled by
    it) is loudly NaN instead of silently saturating every activation to
    ±127; the offline path additionally rejects such trees in
    :func:`prequantize`.
    """
    scale = jnp.where(amax > 0, amax, jnp.nan) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                   -127, 127).astype(jnp.int8)
    return x_q, scale


def prequantize(variables, mode: str = "int8"):
    """Quantize conv kernels OFFLINE into the variables tree.

    The inline path re-derives int8 kernels from the f32 params inside the
    program — per pyramid scale, that re-reads every f32 kernel from HBM
    (~190 MB for resnet50+PPM) unless XLA happens to hoist/CSE it. This
    pass makes it explicit: each calibrated conv's ``conv/kernel`` is
    replaced by its int8 tensor and the per-channel scale is stored as
    ``w_scale`` next to the layer's ``amax`` in the ``quant`` collection.
    ConvBN's int8 path detects the int8 kernel dtype and skips the inline
    quantization. Quantized convs are identified by the presence of their
    ``amax`` (i.e. run :func:`calibrate` first).

    ``mode`` must match the eval model's quant mode: under "int8-3x3" the
    model routes 1x1 convs through the plain (un-quantized) conv path,
    which would consume a raw int8 kernel without dequantizing — so their
    kernels must stay fp32. ``mode="w4a8"`` stores int4 weight tensors
    instead of int8 (eval model still runs with ``quant="int8"`` — the
    layer upcasts int4 kernels in-program). ``mode="int8-hybrid"``
    quantizes the same layer set as "int8" — the PPM fuse conv consumer
    (``models/decoders.py PPMFuse``) dequantizes its int8 kernel exactly
    by applying the per-channel scale after the conv.
    """
    import jax

    variables = jax.tree_util.tree_map(lambda a: a, variables)  # copy
    params = variables["params"]
    quant = variables.get("quant")
    if quant is None:
        raise ValueError("prequantize requires a calibrated 'quant' "
                         "collection (run calibrate first)")
    skip_1x1 = mode == "int8-3x3"
    w_quantizer = quantize_weight_int4 if mode == "w4a8" else quantize_weight
    # ONE batched host readback for the amax>0 validation (per-layer
    # float() readbacks are O(layers) tunnel round trips)
    quant_host = jax.device_get(quant)

    def walk(p, q, qh):
        if not isinstance(q, dict):
            return p, q
        if "amax" in q and isinstance(p, dict) and "conv" in p:
            if float(qh["amax"]) <= 0.0:
                raise ValueError(
                    "uncalibrated quant tree: a layer's amax is 0 — run "
                    "calibrate() on at least one image first")
            kernel = p["conv"]["kernel"]
            if kernel.dtype in (jnp.int8, jnp.int4):  # already done: no-op
                return p, q
            if skip_1x1 and kernel.shape[0] == kernel.shape[1] == 1:
                return p, q
            w_q, s_w = w_quantizer(kernel)
            p = {**p, "conv": {**p["conv"], "kernel": w_q}}
            q = {**q, "w_scale": s_w}
            return p, q
        p = dict(p)
        q = dict(q)
        for k in q:
            if k in p:
                p[k], q[k] = walk(p[k], q[k], qh[k])
        return p, q

    new_params, new_quant = walk(dict(params), dict(quant), quant_host)
    return {**variables, "params": new_params, "quant": new_quant}


def calibrate_and_prequantize(calib_model, variables, images, seg_size=None,
                              mode: str = "int8"):
    """One-call PTQ preparation: record activation scales over ``images``
    with the ``quant="calib"`` twin model, then quantize the weights
    offline for a ``quant=mode`` eval model.

    ``mode="w4a8"`` skips the offline step on TPU-bound flows: the axon
    PJRT stack cannot move int4 tensors host<->device, so the w4a8 model
    quantizes its kernels to int4 IN-PROGRAM instead (ConvBN inline
    path); only the calibrated activation scales are needed here."""
    variables = calibrate(calib_model, dict(variables), images,
                          seg_size=seg_size)
    if mode == "w4a8":
        return variables
    return prequantize(variables, mode=mode)


def calibrate(model, variables, images, seg_size=None):
    """Record per-layer activation amax over calibration images.

    ``model`` must be built with ``quant="calib"`` (ConvBN then maximizes
    its ``quant/amax`` variable over observed inputs). Returns ``variables``
    with the updated ``quant`` collection merged in; feed the result to a
    ``quant="int8"`` model.

    The pass is jitted per input shape — an un-jitted full-res apply would
    dispatch op-by-op (minutes over a remote-device link).
    """
    import jax

    kw = {} if seg_size is None else {"seg_size": tuple(seg_size)}

    @jax.jit
    def step(v, img):
        _, updates = model.apply(v, img, mutable=["quant"], **kw)
        return updates["quant"]

    for img in images:
        if img.ndim == 3:
            img = img[None]
        quant = step(variables, jnp.asarray(img))
        variables = {**variables, "quant": quant}
    return variables
