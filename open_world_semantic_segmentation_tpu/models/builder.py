"""Encoder/decoder factory mirroring the reference ``ModelBuilder`` surface
(anomaly/models/models.py:122-234) plus the combined segmentation model.

Unlike the reference's stateful SegmentationModule (whose forward computes
the loss inline, models.py:34-88), the Flax model is pure: it maps an image
to decoder outputs; losses are functions in ``train/losses.py`` and the OOD
feature plumbing of SegmentationModuleOOD (models.py:90-119) is just the
``ft`` entry of the decoder output dict.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import BNConfig
from .resnet import resnet18, resnet34, resnet50, resnet101
from .resnext import resnext101
from .mobilenet import MobileNetV2Dilated
from .hrnet import hrnetv2
from .decoders import C1, C1DeepSup, PPM, PPMDeepsup, PPMDeepsupEmbedding, UPerNet


class SegmentationModel(nn.Module):
    """encoder -> decoder; ``seg_size`` given = inference (upsampled scores)."""

    encoder: nn.Module
    decoder: nn.Module

    @nn.compact
    def __call__(self, img, seg_size=None):
        conv_out = self.encoder(img)
        return self.decoder(conv_out, seg_size=seg_size)


class ModelBuilder:
    """Name-compatible factory: arch strings match the reference configs."""

    ENCODER_FC_DIM = {
        "mobilenetv2dilated": 320,
        "resnet18": 512, "resnet18dilated": 512,
        "resnet34": 512, "resnet34dilated": 512,
        "resnet50": 2048, "resnet50dilated": 2048,
        "resnet101": 2048, "resnet101dilated": 2048,
        "resnext101": 2048,
        "hrnetv2": 720,
    }

    @staticmethod
    def build_encoder(arch="resnet50dilated", fc_dim=2048, *, train=False,
                      dtype=jnp.float32, bn: Optional[BNConfig] = None,
                      quant: str = "off", quant_stages=None):
        arch = arch.lower()
        bn = bn or BNConfig()
        kw = dict(train=train, dtype=dtype, bn=bn)
        if quant != "off":
            if not arch.startswith(("resnet", "resnext")):
                raise ValueError(
                    f"int8 quantization is wired for the ResNet/ResNeXt "
                    f"families only (got {arch})")
            kw["quant"] = quant
            if quant_stages is not None:
                kw["quant_stages"] = tuple(quant_stages)
        if arch == "mobilenetv2dilated":
            return MobileNetV2Dilated(output_stride=8, **kw)
        if arch == "resnet18":
            return resnet18(stem="deep", output_stride=32, **kw)
        if arch == "resnet18dilated":
            return resnet18(stem="deep", output_stride=8, **kw)
        if arch == "resnet34":
            # the reference DECLARES these two but raises
            # NotImplementedError (anomaly/models/models.py:148-155);
            # the parameterized ResNet makes them free here
            return resnet34(stem="deep", output_stride=32, **kw)
        if arch == "resnet34dilated":
            return resnet34(stem="deep", output_stride=8, **kw)
        if arch == "resnet50":
            return resnet50(stem="deep", output_stride=32, **kw)
        if arch == "resnet50dilated":
            return resnet50(stem="deep", output_stride=8, **kw)
        if arch == "resnet101":
            return resnet101(stem="deep", output_stride=32, **kw)
        if arch == "resnet101dilated":
            return resnet101(stem="deep", output_stride=8, **kw)
        if arch == "resnext101":
            return resnext101(output_stride=32, **kw)
        if arch == "hrnetv2":
            return hrnetv2(**kw)
        raise ValueError(f"Architecture undefined: {arch}")

    @staticmethod
    def build_decoder(arch="ppm_deepsup", fc_dim=512, num_class=150,
                      use_softmax=False, *, train=False, dtype=jnp.float32,
                      bn: Optional[BNConfig] = None, quant: str = "off"):
        arch = arch.lower()
        kw = dict(num_class=num_class, fc_dim=fc_dim,
                  use_softmax=use_softmax, train=train, dtype=dtype)
        if bn is not None:
            kw["bn"] = bn
        if quant != "off":
            if not arch.startswith("ppm"):
                raise ValueError(
                    f"int8 quantization is wired for the PPM decoder "
                    f"family only (got {arch})")
            kw["quant"] = quant
        if arch == "c1_deepsup":
            return C1DeepSup(**kw)
        if arch == "c1":
            return C1(**kw)
        if arch == "ppm":
            return PPM(**kw)
        if arch == "ppm_deepsup":
            return PPMDeepsup(**kw)
        if arch == "ppm_deepsup_embedding":
            return PPMDeepsupEmbedding(**kw)
        if arch == "upernet_lite":
            return UPerNet(fpn_dim=256, **kw)
        if arch == "upernet":
            return UPerNet(fpn_dim=512, **kw)
        raise ValueError(f"Architecture undefined: {arch}")

    @staticmethod
    def build_segmentation_model(arch_encoder, arch_decoder, num_class,
                                 fc_dim=None, use_softmax=False, *,
                                 train=False, dtype=jnp.float32,
                                 bn: Optional[BNConfig] = None,
                                 quant: str = "off", quant_stages=None):
        """``quant``: "off" (reference parity), or the opt-in int8 PTQ flow
        (ops/quant.py): build with "calib", run ops.quant.calibrate over a
        few images, then rebuild with "int8" and apply with the calibrated
        variables. Eval-only (train=True with quant is unsupported).
        ``quant_stages`` overrides which encoder stages quantize (0-based;
        default layers 2-4)."""
        if quant != "off" and train:
            raise ValueError("int8 PTQ is an inference-only mode")
        fc_dim = fc_dim or ModelBuilder.ENCODER_FC_DIM[arch_encoder.lower()]
        enc = ModelBuilder.build_encoder(arch_encoder, fc_dim, train=train,
                                         dtype=dtype, bn=bn, quant=quant,
                                         quant_stages=quant_stages)
        dec = ModelBuilder.build_decoder(arch_decoder, fc_dim, num_class,
                                         use_softmax, train=train,
                                         dtype=dtype, bn=bn, quant=quant)
        return SegmentationModel(encoder=enc, decoder=dec)
