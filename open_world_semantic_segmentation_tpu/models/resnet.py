"""ResNet backbones, NHWC Flax, with declarative dilation.

One implementation covers both reference ResNet families:

- CSAIL "deep stem" variant (three 3x3 convs, inplanes 128) used by the
  anomaly stack (anomaly/models/resnet.py:95-158) with the ``dilate_scale``
  surgery of ``ResnetDilated._nostride_dilate``
  (anomaly/models/models.py:315-328);
- torchvision-style 7x7-stem variant with ``replace_stride_with_dilation``
  used by the DeepLab stack (DeepLabV3Plus-Pytorch/network/backbone/resnet.py).

Instead of mutating stride/dilation attributes post-hoc, dilation is derived
from ``output_stride`` at construction: when a stage's stride is converted to
1, its first block keeps the *previous* dilation and later blocks use the
doubled one — exactly what both reference mechanisms produce.

The forward returns the four stage outputs (``return_feature_maps=True``
semantics, models.py:267-282); callers slice what they need (('low_level',
'out') for DeepLabV3+, conv4/conv5 for PPM deep supervision).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BNConfig, ConvBN, kaiming_fan_out
from ..core.flags import dataflow_flag
from ..ops.pool import max_pool_3x3_s2_p1


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32
    groups: int = 1       # unused; signature-compat across block types
    base_width: int = 64  # unused
    quant: str = "off"

    expansion = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     padding=self.first_dilation, dilation=(self.first_dilation,) * 2,
                     relu=True, bn=self.bn, train=self.train, dtype=self.dtype,
                     quant=self.quant, name="c1")(x)
        out = ConvBN(self.planes, (3, 3), padding=self.dilation,
                     dilation=(self.dilation,) * 2, relu=False, bn=self.bn,
                     train=self.train, dtype=self.dtype, quant=self.quant,
                     name="c2")(out)
        if self.downsample:
            residual = ConvBN(self.planes, (1, 1), (self.stride, self.stride),
                              relu=False, bn=self.bn, train=self.train,
                              dtype=self.dtype, quant=self.quant,
                              name="down")(x)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32
    groups: int = 1
    base_width: int = 64
    quant: str = "off"

    expansion = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        residual = x
        out = ConvBN(width, (1, 1), relu=True, bn=self.bn, train=self.train,
                     dtype=self.dtype, quant=self.quant, name="c1")(x)
        # the 3x3 carries stride and dilation (torch Bottleneck layout)
        out = ConvBN(width, (3, 3), (self.stride, self.stride),
                     padding=self.first_dilation, dilation=(self.first_dilation,) * 2,
                     groups=self.groups, relu=True, bn=self.bn,
                     train=self.train, dtype=self.dtype, quant=self.quant,
                     name="c2")(out)
        out = ConvBN(self.planes * 4, (1, 1), relu=False, bn=self.bn,
                     train=self.train, dtype=self.dtype, quant=self.quant,
                     name="c3")(out)
        if self.downsample:
            residual = ConvBN(self.planes * 4, (1, 1),
                              (self.stride, self.stride), relu=False,
                              bn=self.bn, train=self.train, dtype=self.dtype,
                              quant=self.quant, name="down")(x)
        return nn.relu(out + residual)


def _stage_plan(output_stride: int) -> Sequence[Tuple[int, int]]:
    """(stride, dilation) per stage for layers 1-4.

    output_stride 32: strides (1,2,2,2) dilations (1,1,1,1)
    output_stride 16: strides (1,2,2,1) dilations (1,1,1,2)
    output_stride 8:  strides (1,2,1,1) dilations (1,1,2,4)
    """
    if output_stride == 32:
        return [(1, 1), (2, 1), (2, 1), (2, 1)]
    if output_stride == 16:
        return [(1, 1), (2, 1), (2, 1), (1, 2)]
    if output_stride == 8:
        return [(1, 1), (2, 1), (1, 2), (1, 4)]
    raise ValueError(f"unsupported output_stride {output_stride}")


class ResNet(nn.Module):
    """Feature-pyramid ResNet returning [c1out..c4out] (strides 4,8,16,32/OS)."""

    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    stem: str = "deep"  # "deep" (CSAIL 3x3x3) or "7x7" (torchvision)
    output_stride: int = 8
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32
    groups: int = 1
    base_width: int = 64
    planes: Sequence[int] = (64, 128, 256, 512)
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM when
    # training large crops/batches (jax.checkpoint over each residual block)
    quant: str = "off"   # int8 PTQ mode for ConvBN (ops/quant.py)
    quant_stages: Sequence[int] = (1, 2, 3)  # stages (0-based) quantized
    # when quant != "off"; stage 0 (layer1, 1/4-res) and the stem stay in
    # the compute dtype by default — early layers are the most
    # quantization-sensitive and carry the least HBM traffic per FLOP

    @nn.compact
    def __call__(self, x):
        if self.stem == "deep":
            x = ConvBN(64, (3, 3), (2, 2), padding=1, bn=self.bn,
                       train=self.train, dtype=self.dtype, name="stem1")(x)
            x = ConvBN(64, (3, 3), padding=1, bn=self.bn, train=self.train,
                       dtype=self.dtype, name="stem2")(x)
            x = ConvBN(128, (3, 3), padding=1, bn=self.bn, train=self.train,
                       dtype=self.dtype, name="stem3")(x)
        else:
            x = ConvBN(64, (7, 7), (2, 2), padding=3, bn=self.bn,
                       train=self.train, dtype=self.dtype, name="stem1")(x)
        # probe flag (trace-time, core/flags.py): the round-4 DeepLab audit
        # left a ~1.6 ms/img in-program-vs-isolated gap on the stem fusion;
        # optimization_barrier pins a schedule/fusion boundary to test
        # whether the gap is fusion-scheduling (it is layout-neutral)
        barrier = dataflow_flag("OWSS_STEM_BARRIER")
        if barrier in ("conv", "both"):
            x = jax.lax.optimization_barrier(x)
        x = max_pool_3x3_s2_p1(x)
        if barrier in ("pool", "both"):
            x = jax.lax.optimization_barrier(x)

        outs = []
        plan = _stage_plan(self.output_stride)
        planes = self.planes
        prev_dilation = 1
        block_cls = nn.remat(self.block) if self.remat else self.block
        for stage, (nblocks, (stride, dilation)) in enumerate(
                zip(self.layers, plan)):
            for b in range(nblocks):
                is_first = b == 0
                in_ch = x.shape[-1]
                out_ch = planes[stage] * self.block.expansion
                x = block_cls(
                    planes=planes[stage],
                    stride=stride if is_first else 1,
                    dilation=dilation,
                    # first block of a dilated stage keeps the previous
                    # dilation (torchvision previous_dilation; CSAIL
                    # _nostride_dilate dilate//2 on the strided conv)
                    first_dilation=prev_dilation if is_first else dilation,
                    downsample=is_first and (stride != 1 or in_ch != out_ch),
                    bn=self.bn,
                    train=self.train,
                    dtype=self.dtype,
                    groups=self.groups,
                    base_width=self.base_width,
                    quant=self.quant if stage in self.quant_stages
                    else "off",
                    name=f"layer{stage + 1}_{b}",
                )(x)
            prev_dilation = dilation
            outs.append(x)
        return outs


def resnet18(**kw):
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), **kw)


def resnet_deeplab(depth: int = 101, output_stride: int = 16,
                   bn: BNConfig = BNConfig(momentum=0.01), **kw):
    """torchvision-stem ResNet as used by the DeepLab stack (OS16 default)."""
    layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    return ResNet(block=Bottleneck, layers=layers, stem="7x7",
                  output_stride=output_stride, bn=bn, **kw)
