"""ResNeXt-101 encoder (CSAIL deep-stem variant, anomaly/models/resnext.py).

The GroupBottleneck has expansion 2, per-stage widths (128, 256, 512, 1024),
and 32 groups on the 3x3; the reference wraps it in the plain ``Resnet``
feature extractor (no dilation surgery, models.py:168-170), i.e. output
stride 32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import BNConfig, ConvBN
from .resnet import ResNet


class GroupBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32
    groups: int = 32
    base_width: int = 64  # unused; signature-compat with ResNet blocks
    quant: str = "off"

    expansion = 2

    @nn.compact
    def __call__(self, x):
        residual = x
        out = ConvBN(self.planes, (1, 1), relu=True, bn=self.bn,
                     train=self.train, dtype=self.dtype, quant=self.quant,
                     name="c1")(x)
        out = ConvBN(self.planes, (3, 3), (self.stride, self.stride),
                     padding=self.first_dilation,
                     dilation=(self.first_dilation,) * 2, groups=self.groups,
                     relu=True, bn=self.bn, train=self.train,
                     dtype=self.dtype, quant=self.quant, name="c2")(out)
        out = ConvBN(self.planes * 2, (1, 1), relu=False, bn=self.bn,
                     train=self.train, dtype=self.dtype, quant=self.quant,
                     name="c3")(out)
        if self.downsample:
            residual = ConvBN(self.planes * 2, (1, 1),
                              (self.stride, self.stride), relu=False,
                              bn=self.bn, train=self.train, dtype=self.dtype,
                              quant=self.quant, name="down")(x)
        return nn.relu(out + residual)


def resnext101(output_stride: int = 32, **kw):
    return ResNet(block=GroupBottleneck, layers=(3, 4, 23, 3), stem="deep",
                  output_stride=output_stride, groups=32,
                  planes=(128, 256, 512, 1024), **kw)
