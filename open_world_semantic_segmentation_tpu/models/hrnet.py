"""HRNetV2-W48 encoder, NHWC Flax (anomaly/models/hrnet.py parity).

Topology (hrnet.py:263-265 config):
  stem: two 3x3/s2 conv-bn-relu (64ch) -> layer1: 4x Bottleneck(64) -> 256ch
  stage2: 1 module,  2 branches, 4x BasicBlock, (48, 96)
  stage3: 4 modules, 3 branches, 4x BasicBlock, (48, 96, 192)
  stage4: 3 modules, 4 branches, 4x BasicBlock, (48, 96, 192, 384)
  output: branches 1-3 bilinearly upsampled to branch-0 resolution and
  concatenated -> 720 channels at stride 4 (hrnet.py:426-437); the anomaly
  config pairs this with fc_dim 720 and the C1 decoder.

Every fuse path mirrors hrnet.py:186-252: j > i uses 1x1 conv-bn +
upsample; j < i uses (i-j) strided 3x3 conv-bn chains with ReLU on all but
the last; identity on the diagonal; branch sums pass through a final ReLU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BNConfig, ConvBN
from .resnet import BasicBlock, Bottleneck
from ..ops.resize import bilinear_resize

W48_CHANNELS = ((48, 96), (48, 96, 192), (48, 96, 192, 384))
W48_MODULES = (1, 4, 3)


class _FuseDown(nn.Module):
    """j < i path: (i-j) strided 3x3 conv-bn [+relu except last]."""

    out_channels: int
    mid_channels: int
    steps: int
    bn: BNConfig
    train: bool
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for k in range(self.steps):
            last = k == self.steps - 1
            x = ConvBN(self.out_channels if last else self.mid_channels,
                       (3, 3), (2, 2), padding=1, relu=not last, bn=self.bn,
                       train=self.train, dtype=self.dtype, name=f"d{k}")(x)
        return x


class HighResolutionModule(nn.Module):
    num_channels: Sequence[int]
    num_blocks: int = 4
    multi_scale_output: bool = True
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        nb = len(self.num_channels)
        # branches
        ys = []
        for i in range(nb):
            x = xs[i]
            for b in range(self.num_blocks):
                x = BasicBlock(planes=self.num_channels[i],
                               downsample=(b == 0 and
                                           x.shape[-1] != self.num_channels[i]),
                               bn=self.bn, train=self.train, dtype=self.dtype,
                               name=f"branch{i}_{b}")(x)
            ys.append(x)
        if nb == 1:
            return ys

        # fuse
        out_branches = nb if self.multi_scale_output else 1
        fused = []
        for i in range(out_branches):
            size_i = ys[i].shape[-3:-1]
            if i == 0:
                y = ys[0]
            else:
                y = _FuseDown(self.num_channels[i], self.num_channels[0],
                              i, self.bn, self.train, self.dtype,
                              name=f"fuse{i}_0")(ys[0])
            for j in range(1, nb):
                if i == j:
                    y = y + ys[j]
                elif j > i:
                    up = ConvBN(self.num_channels[i], (1, 1), relu=False,
                                bn=self.bn, train=self.train,
                                dtype=self.dtype, name=f"fuse{i}_{j}")(ys[j])
                    y = y + bilinear_resize(up, size_i)
                else:
                    y = y + _FuseDown(self.num_channels[i],
                                      self.num_channels[j], i - j, self.bn,
                                      self.train, self.dtype,
                                      name=f"fuse{i}_{j}")(ys[j])
            fused.append(nn.relu(y))
        return fused


class HRNetV2(nn.Module):
    stage_channels: Sequence[Sequence[int]] = W48_CHANNELS
    stage_modules: Sequence[int] = W48_MODULES
    bn: BNConfig = BNConfig()
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(64, (3, 3), (2, 2), padding=1, bn=self.bn,
                   train=self.train, dtype=self.dtype, name="stem1")(x)
        x = ConvBN(64, (3, 3), (2, 2), padding=1, bn=self.bn,
                   train=self.train, dtype=self.dtype, name="stem2")(x)
        for b in range(4):
            x = Bottleneck(planes=64, downsample=(b == 0), bn=self.bn,
                           train=self.train, dtype=self.dtype,
                           name=f"layer1_{b}")(x)

        xs = [x]
        for s, (channels, n_modules) in enumerate(
                zip(self.stage_channels, self.stage_modules)):
            # transition: adapt existing branches if channels differ, grow a
            # new branch by strided conv from the last previous branch
            new_xs = []
            for i, ch in enumerate(channels):
                if i < len(xs):
                    if xs[i].shape[-1] != ch:
                        new_xs.append(ConvBN(ch, (3, 3), padding=1,
                                             bn=self.bn, train=self.train,
                                             dtype=self.dtype,
                                             name=f"trans{s}_{i}")(xs[i]))
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(ConvBN(ch, (3, 3), (2, 2), padding=1,
                                         bn=self.bn, train=self.train,
                                         dtype=self.dtype,
                                         name=f"trans{s}_{i}")(xs[-1]))
            xs = new_xs
            for m in range(n_modules):
                xs = HighResolutionModule(channels, bn=self.bn,
                                          train=self.train, dtype=self.dtype,
                                          name=f"stage{s + 2}_{m}")(xs)

        size0 = xs[0].shape[-3:-1]
        out = jnp.concatenate(
            [xs[0]] + [bilinear_resize(b, size0) for b in xs[1:]], axis=-1)
        return [out]


def hrnetv2(**kw):
    return HRNetV2(**kw)
