"""MobileNetV2 backbone, NHWC Flax, output-stride aware.

One implementation covers both reference variants, which share the inverted
residual topology but differ in padding details:

- ``style="torchvision"`` (DeepLabV3Plus-Pytorch/network/backbone/
  mobilenetv2.py): the stem 3x3/s2 conv has padding 0 (their modification),
  and each InvertedResidual pads its *input* by ``fixed_padding(3, dilation)``
  before the expand 1x1 conv — so the pad ring passes through expand-BN-ReLU6
  and is nonzero when it reaches the depthwise conv. Reproduced exactly.
- ``style="csail"`` (anomaly/models/mobilenet.py + the dilation surgery of
  anomaly/models/models.py:348-387): stem pads 1, the depthwise 3x3 pads by
  its own dilation, no pre-block padding.

Dilation is derived from ``output_stride`` by stride tracking (the
torchvision bookkeeping), which provably produces the same per-block
stride/dilation assignment as the CSAIL ``_nostride_dilate`` surgery: when a
stage's stride collapses, its first block keeps the previous dilation and
later blocks use the doubled one.

The forward returns every block output; adapters slice:
- DeepLab: low_level = block 3 output (24ch, stride 4), out = block 17
  output (320ch) — the final 1280-ch 1x1 is built but unused by the heads
  (network/modeling.py:46-61).
- anomaly MobileNetV2Dilated: outputs at down_idx (2, 4, 7, 14) + last
  (models.py:389-397), final 1x1 dropped.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BNConfig, ConvBN

# (expand t, channels c, repeats n, stride s)
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNReLU6(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.features, self.kernel_size, self.strides,
                   padding=self.padding, dilation=(self.dilation,) * 2,
                   groups=self.groups, relu=False, bn=self.bn,
                   train=self.train, dtype=self.dtype, name="cb")(x)
        return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    oup: int
    stride: int
    dilation: int
    expand_ratio: int
    style: str = "torchvision"
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.oup

        if self.style == "torchvision":
            # fixed_padding(3, d) == (d, d) per side, applied to block input
            d = self.dilation
            y = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
            dw_pad = 0
        else:
            y = x
            dw_pad = self.dilation

        if self.expand_ratio != 1:
            y = _ConvBNReLU6(hidden, (1, 1), bn=self.bn, train=self.train,
                             dtype=self.dtype, name="expand")(y)
        y = _ConvBNReLU6(hidden, (3, 3), (self.stride, self.stride),
                         padding=dw_pad, dilation=self.dilation, groups=hidden,
                         bn=self.bn, train=self.train, dtype=self.dtype,
                         name="dw")(y)
        y = ConvBN(self.oup, (1, 1), relu=False, bn=self.bn, train=self.train,
                   dtype=self.dtype, name="project")(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    output_stride: int = 8
    width_mult: float = 1.0
    style: str = "torchvision"
    include_last_conv: bool = True
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List:
        input_channel = _make_divisible(32 * self.width_mult) \
            if self.style == "torchvision" else int(32 * self.width_mult)
        stem_pad = 0 if self.style == "torchvision" else 1
        x = _ConvBNReLU6(input_channel, (3, 3), (2, 2), padding=stem_pad,
                         bn=self.bn, train=self.train, dtype=self.dtype,
                         name="stem")(x)
        outs = [x]
        current_stride = 2
        dilation = 1
        idx = 0
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            previous_dilation = dilation
            if current_stride == self.output_stride:
                stride = 1
                dilation *= s
            else:
                stride = s
                current_stride *= s
            out_ch = int(c * self.width_mult)
            for i in range(n):
                idx += 1
                x = InvertedResidual(
                    oup=out_ch,
                    stride=stride if i == 0 else 1,
                    dilation=previous_dilation if i == 0 else dilation,
                    expand_ratio=t,
                    style=self.style,
                    bn=self.bn,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"block{idx}",
                )(x)
                outs.append(x)
        if self.include_last_conv:
            last_channel = _make_divisible(1280 * max(1.0, self.width_mult)) \
                if self.style == "torchvision" else (
                    int(1280 * self.width_mult)
                    if self.width_mult > 1.0 else 1280)
            x = _ConvBNReLU6(last_channel, (1, 1), bn=self.bn,
                             train=self.train, dtype=self.dtype,
                             name="last_conv")(x)
            outs.append(x)
        return outs


class _MobileNetForDeepLab(nn.Module):
    """Adapter returning {'low_level', 'out'} (network/modeling.py:46-61)."""

    net: MobileNetV2

    @nn.compact
    def __call__(self, x):
        outs = self.net(x)
        # outs[0]=stem, outs[1..17]=blocks, [-1]=last 1x1 (unused by head)
        return {"low_level": outs[3], "out": outs[17]}


def mobilenet_v2(output_stride=8, width_mult=1.0, train=False,
                 dtype=jnp.float32, style="torchvision", name=None):
    net = MobileNetV2(output_stride=output_stride, width_mult=width_mult,
                      style=style, include_last_conv=False, train=train,
                      dtype=dtype, name=None if name else "mobilenet")
    return _MobileNetForDeepLab(net=net, name=name)


class MobileNetV2Dilated(nn.Module):
    """anomaly adapter: feature maps at down_idx (2,4,7,14) + final block
    (anomaly/models/models.py:389-397); the 1280-ch 1x1 conv is dropped."""

    output_stride: int = 8
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = BNConfig()

    @nn.compact
    def __call__(self, x):
        outs = MobileNetV2(output_stride=self.output_stride, style="csail",
                           include_last_conv=False, bn=self.bn,
                           train=self.train, dtype=self.dtype,
                           name="net")(x)
        # reference down_idx indexes self.features (0=stem conv); our outs
        # list is aligned the same way (outs[0]=stem).
        return [outs[2], outs[4], outs[7], outs[14], outs[17]]
