"""Shared Flax building blocks: conv + batch-norm + activation, NHWC.

Cross-replica batch statistics — the reference's thread-based SyncBN
(anomaly/lib/nn/modules/batchnorm.py) — come for free on TPU: under a single
pjit-compiled SPMD program, BN reduces over the *global* batch dimension and
XLA inserts the ICI collectives. When running under ``shard_map``/``pmap``
instead, set ``BNConfig.axis_name`` to the data mesh axis and Flax's
BatchNorm performs the ``lax.pmean`` explicitly. No replication callbacks, no
master/slave pipes.

Parameter naming mirrors the reference's torch attribute paths so the
checkpoint converter (train/convert.py) is a pure name/layout map.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

# torch kaiming_normal_(fan_in) == he_normal; used by decoder weights_init
kaiming_normal = nn.initializers.he_normal()
# CSAIL ResNet conv init: normal(0, sqrt(2 / (kh*kw*out_ch))) == fan_out
kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


@dataclasses.dataclass(frozen=True)
class BNConfig:
    """Batch-norm behavior shared across a model.

    momentum is the torch convention (new = (1-m)*running + m*batch);
    the reference uses 0.1 for the anomaly stack and 0.01 for DeepLab
    backbones (main.py:290 set_bn_momentum).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None  # set for shard_map/pmap cross-replica BN
    bias_init: Callable = nn.initializers.zeros_init()
    scale_init: Callable = nn.initializers.ones_init()

    def make(self, use_running_average: bool, dtype=None, name=None):
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name,
            dtype=dtype,
            param_dtype=jnp.float32,
            bias_init=self.bias_init,
            scale_init=self.scale_init,
            name=name,
        )


def conv_init_for(style: str):
    if style == "fan_out":
        return kaiming_fan_out
    if style == "fan_in":
        return kaiming_normal
    raise ValueError(style)


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNorm + optional ReLU, NHWC.

    ``padding`` follows torch semantics: an int p means p pixels both sides.

    ``quant`` (opt-in int8 inference, ops/quant.py):
    - "off"   — normal path (reference parity);
    - "calib" — normal path, but records ``max|input|`` into the ``quant``
                variable collection (run apply with ``mutable=["quant"]``);
    - "int8"  — s8xs8->s32 conv using the calibrated static activation scale
                and inline per-channel weight quantization; dequant + BN +
                ReLU fuse into the conv epilogue.
    - "int8-3x3" — int8 only for spatial (non-1x1) convs: on v5e the 1x1
                bottleneck convs are bandwidth-bound and the requant chain
                costs more than the MXU saves (tools/probe_int8.py), while
                3x3 convs gain 1.2-1.5x.
    - "int8-hybrid" — identical to "int8" at the ConvBN level; the PPM
                decoder keeps its fuse conv on the concat-free bf16
                PPMFuse dataflow (models/decoders.py) — the fastest
                measured PSPNet eval policy (docs/DESIGN.md round 3).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    relu: bool = True
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32
    conv_init: Callable = kaiming_fan_out
    quant: str = "off"

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        quant = self.quant
        if quant == "int8-3x3":
            quant = "int8" if tuple(self.kernel_size) != (1, 1) else "off"
        elif quant == "int8-hybrid":
            quant = "int8"  # the hybrid split lives in the PPM decoder
        if quant in ("calib", "int8", "w4a8"):
            x = self._quantized_conv(x, pad, quant)
        elif self._use_s2d_stem(x, pad):
            # OWSS_STEM_IMPL=s2d (opt-in A/B formulation): the stride-2
            # image-stem conv as space-to-depth + stride-1 conv
            # (ops/stem.py). Dodges XLA's phase-split lowering but pays
            # the relayout in the explicit transpose instead — e2e it
            # TIES the native lowering (negative probe, docs/DESIGN.md
            # round 5). Exact reassociation; same conv/kernel param.
            # Read at TRACE time, validated — see core/flags.py.
            from ..ops.stem import conv_stride2_s2d

            kernel = self.variable(
                "params", "conv",
                lambda: {"kernel": self.conv_init(
                    self.make_rng("params"),
                    (*self.kernel_size, x.shape[-1], self.features),
                    jnp.float32)},
            ).value["kernel"]
            x = conv_stride2_s2d(
                x.astype(self.dtype), kernel.astype(self.dtype),
                pad[0][0], preferred_element_type=self.dtype)
        elif self._use_shift_dilated(pad):
            # OWSS_DILATED_IMPL=shift: large-dilation 3x3 as nine shifted
            # MXU matmuls (ops/dilated.py) — XLA's native lowering tiles
            # poorly at ASPP-scale dilations
            from ..ops.dilated import dilated_conv3x3_shift

            kernel = self.variable(
                "params", "conv",
                lambda: {"kernel": self.conv_init(
                    self.make_rng("params"),
                    (*self.kernel_size, x.shape[-1], self.features),
                    jnp.float32)},
            ).value["kernel"]
            x = dilated_conv3x3_shift(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.dilation)
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=pad,
                kernel_dilation=self.dilation,
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=self.conv_init,
                name="conv",
            )(x)
        x = self.bn.make(not self.train, dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x

    def _use_s2d_stem(self, x, pad) -> bool:
        # Opt-in for the stride-2 image-stem conv (Cin <= 4 — only the
        # conv that sees the RGB image qualifies): see __call__ comment
        # and ops/stem.py. Requires even H/W and symmetric torch padding.
        from ..core.flags import dataflow_flag

        kh, kw = self.kernel_size
        return (dataflow_flag("OWSS_STEM_IMPL") != "native"
                and tuple(self.strides) == (2, 2)
                and self.groups == 1
                and tuple(self.dilation) == (1, 1)
                and kh % 2 == 1 and kh == kw
                and x.ndim == 4 and x.shape[-1] <= 4
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and pad[0] == pad[1] and pad[0][0] == pad[0][1])

    def _use_shift_dilated(self, pad) -> bool:
        # DEFAULT for ASPP-scale dilations (round-4 audit, docs/DESIGN.md):
        # together with the concat-free ASPP projection this lifts the
        # DeepLab OS16 1024x2048 eval from 51 to 61 imgs/sec — XLA's
        # native lowering of d>=6 convs picks a T(2,128)-tiled layout that
        # runs at ~1/3 the isolated conv's speed, while the nine shifted
        # dot_generals tile cleanly. OWSS_DILATED_IMPL=native opts out
        # (A/B runs). Read at TRACE time, validated — see core/flags.py.
        from ..core.flags import dataflow_flag

        d = self.dilation
        return (dataflow_flag("OWSS_DILATED_IMPL") != "native"
                and tuple(self.kernel_size) == (3, 3)
                and tuple(self.strides) == (1, 1)
                and self.groups == 1
                and max(d) >= 6
                and pad == ((d[0], d[0]), (d[1], d[1])))

    def _quantized_conv(self, x, pad, quant):
        """int8 conv path sharing the fp32 ``conv/kernel`` param."""
        import jax

        from ..ops.quant import quantize_act, quantize_weight

        in_ch = x.shape[-1] // self.groups
        # reuse the exact param path of nn.Conv ("conv"/"kernel") so
        # checkpoints load identically in all quant modes
        kernel = self.variable(
            "params", "conv",
            lambda: {"kernel": self.conv_init(
                self.make_rng("params"),
                (*self.kernel_size, in_ch, self.features), jnp.float32)},
        ).value["kernel"]
        # init 0.0 (not 1.0) so calibration records the TRUE activation max
        # even when it is < 1; prequantize() rejects amax == 0 so an
        # uncalibrated tree fails loudly instead of silently saturating
        amax = self.variable("quant", "amax",
                             lambda: jnp.zeros((), jnp.float32))
        if quant == "calib":
            amax.value = jnp.maximum(
                amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, pad, rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=self.dtype)
            return y
        x_q, s_x = quantize_act(x, amax.value)
        if kernel.dtype in (jnp.int8, jnp.int4):
            # ops.quant.prequantize already converted this kernel offline;
            # its per-channel scale lives next to amax. int4 upcasts
            # in-register — HBM stores half the weight bytes, the MXU
            # still runs s8 x s8
            w_q = kernel.astype(jnp.int8)
            s_w = self.variable(
                "quant", "w_scale",
                lambda: jnp.ones((self.features,), jnp.float32)).value
        elif quant == "w4a8":
            # INLINE int4: quantize the f32 kernel to int4 in-program.
            # This PJRT stack cannot transfer int4 host<->device (probed:
            # RecursionError on device_put args, UNIMPLEMENTED on
            # readback), so int4-at-rest must be produced on device: XLA
            # hoists this loop-invariant quantization out of image scans
            # and keeps the int4 tensors resident in HBM
            from ..ops.quant import quantize_weight_int4

            w4, s_w = quantize_weight_int4(kernel)
            w_q = w4.astype(jnp.int8)
        else:
            w_q, s_w = quantize_weight(kernel)
        y = jax.lax.conv_general_dilated(
            x_q, w_q, self.strides, pad, rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s_x * s_w)).astype(self.dtype)


class Conv(nn.Module):
    """Plain torch-style Conv2D wrapper (bias optional), NHWC."""

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    conv_init: Callable = kaiming_fan_out

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=pad,
            kernel_dilation=self.dilation,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.conv_init,
            name="conv",
        )(x)
