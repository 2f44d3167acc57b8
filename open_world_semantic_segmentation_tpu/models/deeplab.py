"""DeepLabV3 / DeepLabV3+ heads and model wrappers (NHWC Flax).

Parity targets (DeepLabV3Plus-Pytorch/):
- ASPP / ASPPConv / ASPPPooling : network/utils.py:308-361
- DeepLabHeadV3Plus             : network/utils.py:8-40
- DeepLabHead (V3)              : network/utils.py:254-276
- plain / embedding / self-distillation wrappers : network/utils.py:42-193
- factory functions             : network/modeling.py:6-170

The embedding wrapper reproduces network/utils.py:84-118: classifier output
(K channels) upsampled to input resolution, then per-pixel distance logits
against fixed one-hot centers (magnitude 3, rebuilt from K each forward —
here simply a closed form, see ops/distance.py). It returns
``(logits, centers, features)`` like the reference, with ``features`` the raw
K-dim embedding in NHWC.

The self-distillation wrapper shares one backbone across a base 16-class head
plus ``cls_novel`` incremental heads of 16+i classes
(network/utils.py:120-193); outputs are per-head lists.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..core.flags import dataflow_flag
from .layers import BNConfig, Conv, ConvBN, kaiming_normal
from .resnet import resnet_deeplab
from .mobilenet import mobilenet_v2
from ..ops.pool import global_avg_pool
from ..ops.resize import bilinear_resize
from ..ops.distance import one_hot_center_logits

HEAD_BN = BNConfig(momentum=0.1)


class ASPPProject(nn.Module):
    """The ASPP 1x1 projection computed per-branch, without the 5-way
    concat (reference network/utils.py:355-361 concatenates then projects).

    Exact split: a 1x1 conv is linear in its input channels, so
    ``conv1x1(cat(b_0..b_4), K) == sum_i conv1x1(b_i, K[slice_i])``, and
    the image-pool branch — whose bilinear upsample from 1x1 is a constant
    broadcast — is projected at 1x1 resolution and broadcast-added.

    Why this exists (round-4 xplane audit, docs/DESIGN.md): the 1280-ch
    concat is the sole consumer of the three dilated-conv branches, and
    XLA's layout assignment propagates a concat-friendly T(2,128) tiling
    back into two of them, slowing each 77-GF conv from its isolated
    0.9 ms to 2.4-2.5 ms in-program. Removing the concat removes the
    layout pressure. The slices are taken from the UNCHANGED
    ``project/conv/kernel`` parameter (identical param tree to
    ``ConvBN(256, (1, 1), name="project")``), so checkpoints, the .pth
    converter, and the quant tools are unaffected.

    The per-branch matmuls use ``jnp.einsum`` (dot_general) rather than
    ``lax.conv`` so bf16 training gradients avoid jax's conv-transpose
    dtype restriction (see ops/ppm_fuse._conv3x3_f32out).
    """

    features: int = 256
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = HEAD_BN

    @nn.compact
    def __call__(self, branches, pool):
        cin = sum(b.shape[-1] for b in branches) + pool.shape[-1]
        kernel = self.variable(
            "params", "conv",
            lambda: {"kernel": kaiming_normal(
                self.make_rng("params"), (1, 1, cin, self.features),
                jnp.float32)},
        ).value["kernel"]
        k2d = kernel[0, 0]
        cdt = self.dtype
        acc = None
        off = 0
        for b in branches:
            c = b.shape[-1]
            t = jnp.einsum("nhwc,cd->nhwd", b.astype(cdt),
                           k2d[off:off + c].astype(cdt),
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
            off += c
        tp = jnp.einsum("nc,cd->nd", pool[:, 0, 0].astype(cdt),
                        k2d[off:].astype(cdt),
                        preferred_element_type=jnp.float32)
        y = acc + tp[:, None, None, :]
        y = self.bn.make(not self.train, dtype=self.dtype,
                         name="bn")(y.astype(self.dtype))
        return nn.relu(y)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling: 1x1 + three dilated 3x3 + image pool,
    projected to 256 with dropout 0.1 (network/utils.py:332-361)."""

    atrous_rates: Sequence[int] = (6, 12, 18)
    out_channels: int = 256
    separable: bool = False
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = HEAD_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, x):
        res = [ConvBN(self.out_channels, (1, 1), bn=self.bn, train=self.train,
                      dtype=self.dtype, conv_init=kaiming_normal,
                      quant=self.quant, name="b0")(x)]
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                y = Conv(x.shape[-1], (3, 3), padding=rate,
                         dilation=(rate, rate), groups=x.shape[-1],
                         use_bias=False, dtype=self.dtype,
                         conv_init=kaiming_normal, name=f"b{i + 1}_dw")(x)
                y = ConvBN(self.out_channels, (1, 1), bn=self.bn,
                           train=self.train, dtype=self.dtype,
                           conv_init=kaiming_normal, name=f"b{i + 1}_pw")(y)
            else:
                y = ConvBN(self.out_channels, (3, 3), padding=rate,
                           dilation=(rate, rate), bn=self.bn, train=self.train,
                           dtype=self.dtype, conv_init=kaiming_normal,
                           quant=self.quant, name=f"b{i + 1}")(x)
            res.append(y)
        size = x.shape[-3:-1]
        p = global_avg_pool(x)
        p = ConvBN(self.out_channels, (1, 1), bn=self.bn, train=self.train,
                   dtype=self.dtype, conv_init=kaiming_normal, name="pool")(p)
        # Default dataflow: per-branch projection sum (no 1280-ch concat)
        # — exact, same param tree, and it frees the dilated branches from
        # the concat's layout pressure (round-4 audit, docs/DESIGN.md).
        # OWSS_ASPP_PROJECT=concat keeps the materialized reference
        # dataflow (also used by the int8 quant path, whose calibrated
        # projection conv needs the literal concat input). Read at TRACE
        # time, validated — see core/flags.py.
        impl = dataflow_flag("OWSS_ASPP_PROJECT")
        if self.quant == "off" and impl != "concat":
            y = ASPPProject(self.out_channels, train=self.train,
                            dtype=self.dtype, bn=self.bn,
                            name="project")(res, p)
        else:
            res.append(bilinear_resize(p, size))
            y = jnp.concatenate(res, axis=-1)
            y = ConvBN(self.out_channels, (1, 1), bn=self.bn,
                       train=self.train, dtype=self.dtype,
                       conv_init=kaiming_normal, quant=self.quant,
                       name="project")(y)
        return nn.Dropout(0.1, deterministic=not self.train, name="drop")(y)


class DeepLabHeadV3Plus(nn.Module):
    """Low-level projection (48ch) + ASPP + 3x3 fuse + 1x1 classifier
    (network/utils.py:8-40). Input: dict with 'low_level' and 'out'."""

    num_classes: int
    aspp_dilate: Sequence[int] = (12, 24, 36)
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = HEAD_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, feature):
        low = ConvBN(48, (1, 1), bn=self.bn, train=self.train,
                     dtype=self.dtype, conv_init=kaiming_normal,
                     quant=self.quant, name="project")(feature["low_level"])
        out = ASPP(self.aspp_dilate, train=self.train, dtype=self.dtype,
                   bn=self.bn, quant=self.quant, name="aspp")(feature["out"])
        out = bilinear_resize(out, low.shape[-3:-1])
        x = jnp.concatenate([low, out], axis=-1)
        # the final 1x1 classifier stays in the compute dtype (score
        # precision feeds mIoU / the distance head)
        x = ConvBN(256, (3, 3), padding=1, bn=self.bn, train=self.train,
                   dtype=self.dtype, conv_init=kaiming_normal,
                   quant=self.quant, name="fuse")(x)
        return Conv(self.num_classes, (1, 1), conv_init=kaiming_normal,
                    dtype=self.dtype, name="classifier")(x)


class DeepLabHead(nn.Module):
    """V3 (no low-level fusion) head (network/utils.py:254-276)."""

    num_classes: int
    aspp_dilate: Sequence[int] = (12, 24, 36)
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = HEAD_BN
    quant: str = "off"

    @nn.compact
    def __call__(self, feature):
        x = ASPP(self.aspp_dilate, train=self.train, dtype=self.dtype,
                 bn=self.bn, quant=self.quant, name="aspp")(feature["out"])
        x = ConvBN(256, (3, 3), padding=1, bn=self.bn, train=self.train,
                   dtype=self.dtype, conv_init=kaiming_normal,
                   quant=self.quant, name="fuse")(x)
        return Conv(self.num_classes, (1, 1), conv_init=kaiming_normal,
                    dtype=self.dtype, name="classifier")(x)


def _backbone_features(backbone_outs):
    """Map the 4 stage outputs to the reference's IntermediateLayerGetter dict
    ({'low_level': layer1, 'out': layer4}, network/modeling.py:23)."""
    return {"low_level": backbone_outs[0], "out": backbone_outs[-1]}


class DeepLabV3Plus(nn.Module):
    """Plain wrapper: backbone -> head -> bilinear upsample to input size
    (network/utils.py:42-53)."""

    backbone: nn.Module
    head: nn.Module
    low_level_from_backbone: bool = True

    @nn.compact
    def __call__(self, x):
        input_size = x.shape[-3:-1]
        feats = self.backbone(x)
        if isinstance(feats, (list, tuple)):
            feats = _backbone_features(feats)
        logits = self.head(feats)
        return bilinear_resize(logits, input_size)


class DeepLabV3PlusEmbedding(nn.Module):
    """Embedding wrapper (network/utils.py:56-118): upsampled K-dim embedding
    -> distance logits vs one-hot centers (magnitude 3).

    Returns (logits, centers, features): logits NHWK distance scores,
    centers (K, K), features NHWC raw embedding — reference order/meaning.
    """

    backbone: nn.Module
    head: nn.Module
    magnitude: float = 3.0

    @nn.compact
    def __call__(self, x):
        input_size = x.shape[-3:-1]
        feats = self.backbone(x)
        if isinstance(feats, (list, tuple)):
            feats = _backbone_features(feats)
        emb = self.head(feats)
        emb = bilinear_resize(emb, input_size)
        logits = one_hot_center_logits(emb, self.magnitude)
        k = emb.shape[-1]
        centers = self.magnitude * jnp.eye(k, dtype=emb.dtype)
        return logits, centers, emb


class DeepLabV3PlusSelfDistillation(nn.Module):
    """Shared backbone + base 16-class head + per-novel-class heads
    (network/utils.py:120-193). Returns (logits_list, centers_list,
    features_list), one entry per head; head i+1 has base_classes + i + 1
    output classes."""

    backbone: nn.Module
    base_classes: int = 16
    cls_novel: int = 1
    aspp_dilate: Sequence[int] = (6, 12, 18)
    magnitude: float = 3.0
    train: bool = False
    dtype: Any = jnp.float32
    bn: BNConfig = HEAD_BN

    @nn.compact
    def __call__(self, x):
        input_size = x.shape[-3:-1]
        feats = self.backbone(x)
        if isinstance(feats, (list, tuple)):
            feats = _backbone_features(feats)

        logits_list, centers_list, features_list = [], [], []
        for i in range(self.cls_novel + 1):
            ncls = self.base_classes + i
            name = "classifier" if i == 0 else f"classifier_{i}"
            emb = DeepLabHeadV3Plus(ncls, self.aspp_dilate, train=self.train,
                                    dtype=self.dtype, bn=self.bn,
                                    name=name)(feats)
            emb = bilinear_resize(emb, input_size)
            logits_list.append(one_hot_center_logits(emb, self.magnitude))
            centers_list.append(self.magnitude * jnp.eye(ncls, dtype=emb.dtype))
            features_list.append(emb)
        return logits_list, centers_list, features_list


def _aspp_rates(output_stride: int) -> Tuple[int, int, int]:
    """network/modeling.py:12-18: OS8 -> (12,24,36), OS16 -> (6,12,18)."""
    return (12, 24, 36) if output_stride == 8 else (6, 12, 18)


def _split_quant(quant: str) -> Tuple[str, str]:
    """Map a user-facing quant mode to ``(backbone_mode, head_mode)``.

    On the DeepLab stack ``"int8-hybrid"`` means int8 BACKBONE ONLY:
    full int8 LOSES at OS16 full-res eval (34.8 vs 60.7 imgs/sec) both
    because the requant chains ride the head/tail and because the
    quantized ASPP must abandon the concat-free round-4 dataflows for
    its calibrated concat projection. The hybrid keeps the head in the
    compute dtype with the fast dataflows and quantizes only the
    bandwidth-heavy ResNet stages. ``"calib-hybrid"`` is its calibration
    twin — ``amax`` is recorded only where the eval model quantizes, so
    ``ops.quant.prequantize`` touches exactly the backbone kernels.
    (The flagship PSPNet stack resolves the same mode differently —
    there the PPM decoder keeps the concat-free FUSE only; see
    models/decoders.py.)
    """
    if quant == "int8-hybrid":
        return "int8", "off"
    if quant == "calib-hybrid":
        return "calib", "off"
    return quant, quant


def _resnet_backbone(depth, output_stride, train, dtype,
                     bn_momentum: float = 0.01, quant: str = "off"):
    return resnet_deeplab(depth=depth, output_stride=output_stride,
                          bn=BNConfig(momentum=bn_momentum), train=train,
                          dtype=dtype, quant=quant, name="backbone")


def deeplabv3plus_resnet101(num_classes=21, output_stride=16, train=False,
                            dtype=jnp.float32, quant="off"):
    bq, hq = _split_quant(quant)
    bb = _resnet_backbone(101, output_stride, train, dtype, quant=bq)
    head = DeepLabHeadV3Plus(num_classes, _aspp_rates(output_stride),
                             train=train, dtype=dtype, quant=hq,
                             name="head")
    return DeepLabV3Plus(backbone=bb, head=head)


def deeplabv3plus_resnet50(num_classes=21, output_stride=16, train=False,
                           dtype=jnp.float32):
    bb = _resnet_backbone(50, output_stride, train, dtype)
    head = DeepLabHeadV3Plus(num_classes, _aspp_rates(output_stride),
                             train=train, dtype=dtype, name="head")
    return DeepLabV3Plus(backbone=bb, head=head)


def deeplabv3_resnet101(num_classes=21, output_stride=16, train=False,
                        dtype=jnp.float32):
    bb = _resnet_backbone(101, output_stride, train, dtype)
    head = DeepLabHead(num_classes, _aspp_rates(output_stride), train=train,
                       dtype=dtype, name="head")
    return DeepLabV3Plus(backbone=bb, head=head)


def deeplabv3plus_mobilenet(num_classes=21, output_stride=16, train=False,
                            dtype=jnp.float32):
    bb = mobilenet_v2(output_stride=output_stride, train=train, dtype=dtype,
                      name="backbone")
    head = DeepLabHeadV3Plus(num_classes, _aspp_rates(output_stride),
                             train=train, dtype=dtype, name="head")
    return DeepLabV3Plus(backbone=bb, head=head)


def deeplabv3_mobilenet(num_classes=21, output_stride=16, train=False,
                        dtype=jnp.float32):
    bb = mobilenet_v2(output_stride=output_stride, train=train, dtype=dtype,
                      name="backbone")
    head = DeepLabHead(num_classes, _aspp_rates(output_stride), train=train,
                       dtype=dtype, name="head")
    return DeepLabV3Plus(backbone=bb, head=head)


def deeplabv3plus_embedding_resnet101(num_classes=16, output_stride=16,
                                      train=False, dtype=jnp.float32,
                                      quant="off"):
    bq, hq = _split_quant(quant)
    bb = _resnet_backbone(101, output_stride, train, dtype, quant=bq)
    head = DeepLabHeadV3Plus(num_classes, _aspp_rates(output_stride),
                             train=train, dtype=dtype, quant=hq,
                             name="head")
    return DeepLabV3PlusEmbedding(backbone=bb, head=head)


def deeplabv3plus_embedding_resnet50(num_classes=16, output_stride=16,
                                     train=False, dtype=jnp.float32,
                                     quant="off"):
    """ResNet-50 variant of the embedding model. The reference only ships
    the resnet101 composition (network/modeling.py:140-148); this is the
    same head on the lighter backbone — an API extension, not a port."""
    bq, hq = _split_quant(quant)
    bb = _resnet_backbone(50, output_stride, train, dtype, quant=bq)
    head = DeepLabHeadV3Plus(num_classes, _aspp_rates(output_stride),
                             train=train, dtype=dtype, quant=hq,
                             name="head")
    return DeepLabV3PlusEmbedding(backbone=bb, head=head)


def deeplabv3plus_embedding_mobilenet(num_classes=16, output_stride=16,
                                      train=False, dtype=jnp.float32):
    """MobileNetV2 variant of the embedding model — an API extension
    (the reference only composes the embedding wrapper with resnets,
    network/modeling.py:140-157); same distance head on the edge-class
    backbone for cheap open-set deployments."""
    bb = mobilenet_v2(output_stride=output_stride, train=train, dtype=dtype,
                      name="backbone")
    head = DeepLabHeadV3Plus(num_classes, _aspp_rates(output_stride),
                             train=train, dtype=dtype, name="head")
    return DeepLabV3PlusEmbedding(backbone=bb, head=head)


def deeplabv3plus_embedding_self_distillation_resnet101(
        num_classes=16, cls_novel=1, output_stride=16, train=False,
        dtype=jnp.float32):
    bb = _resnet_backbone(101, output_stride, train, dtype)
    return DeepLabV3PlusSelfDistillation(
        backbone=bb, base_classes=num_classes, cls_novel=cls_novel,
        aspp_dilate=_aspp_rates(output_stride), train=train, dtype=dtype)
