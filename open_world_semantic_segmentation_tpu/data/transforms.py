"""Joint image+label transforms (host-side PIL/numpy).

Parity target: DeepLabV3Plus-Pytorch/utils/ext_transforms.py — every Ext*
transform applies the geometric op identically to image (bilinear) and label
(nearest) and leaves the label integer-valued. ``ExtToTensor`` here produces
numpy HWC float32 (TPU-native layout) instead of torch CHW; ``ExtNormalize``
operates on the last axis.

Color jitter follows torchvision semantics: factors drawn uniformly from
[max(0, 1-x), 1+x], ops applied in a random order via PIL ImageEnhance
(what torchvision's functional ops use for PIL inputs).

The reference train recipes (main.py:132-147):
  cityscapes: ExtRandomCrop(768|513) -> ExtColorJitter(.5,.5,.5) ->
              ExtRandomHorizontalFlip -> ExtToTensor -> ExtNormalize
  voc:        ExtRandomScale((0.5, 2.0)) -> ExtRandomCrop(513, pad_if_needed)
              -> ExtRandomHorizontalFlip -> ExtToTensor -> ExtNormalize
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class ExtCompose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, lbl):
        for t in self.transforms:
            img, lbl = t(img, lbl)
        return img, lbl


class ExtRandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, lbl):
        if random.random() < self.p:
            return (img.transpose(Image.FLIP_LEFT_RIGHT),
                    lbl.transpose(Image.FLIP_LEFT_RIGHT))
        return img, lbl


class ExtRandomVerticalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, lbl):
        if random.random() < self.p:
            return (img.transpose(Image.FLIP_TOP_BOTTOM),
                    lbl.transpose(Image.FLIP_TOP_BOTTOM))
        return img, lbl


class ExtCenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else size

    def __call__(self, img, lbl):
        th, tw = self.size
        w, h = img.size
        left = int(round((w - tw) / 2.0))
        top = int(round((h - th) / 2.0))
        box = (left, top, left + tw, top + th)
        return img.crop(box), lbl.crop(box)


class ExtRandomScale:
    def __init__(self, scale_range, interpolation=Image.BILINEAR):
        self.scale_range = scale_range
        self.interpolation = interpolation

    def __call__(self, img, lbl):
        assert img.size == lbl.size
        scale = random.uniform(self.scale_range[0], self.scale_range[1])
        target = (int(img.size[0] * scale), int(img.size[1] * scale))
        return (img.resize(target, self.interpolation),
                lbl.resize(target, Image.NEAREST))


class ExtScale:
    def __init__(self, scale, interpolation=Image.BILINEAR):
        self.scale = scale
        self.interpolation = interpolation

    def __call__(self, img, lbl):
        assert img.size == lbl.size
        target = (int(img.size[0] * self.scale),
                  int(img.size[1] * self.scale))
        return (img.resize(target, self.interpolation),
                lbl.resize(target, Image.NEAREST))


class ExtResize:
    """int size = match shorter edge; tuple = exact (h, w)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def _target(self, img):
        if isinstance(self.size, int):
            w, h = img.size
            if w < h:
                return (self.size, int(self.size * h / w))
            return (int(self.size * w / h), self.size)
        return (self.size[1], self.size[0])

    def __call__(self, img, lbl):
        t = self._target(img)
        return (img.resize(t, self.interpolation), lbl.resize(t, Image.NEAREST))


def _pil_pad(img, padding, fill=0):
    if isinstance(padding, int):
        padding = (padding, padding, padding, padding)
    return ImageOps.expand(img, border=padding, fill=fill)


class ExtRandomCrop:
    """ext_transforms.py:328-396: optional fixed padding, optional
    pad-if-needed by half the deficit, then a uniform random crop."""

    def __init__(self, size, padding=0, pad_if_needed=False):
        self.size = (int(size), int(size)) if isinstance(size, (int, float)) \
            else size
        self.padding = padding
        self.pad_if_needed = pad_if_needed

    @staticmethod
    def get_params(img, output_size):
        w, h = img.size
        th, tw = output_size
        if w == tw and h == th:
            return 0, 0, h, w
        i = random.randint(0, h - th)
        j = random.randint(0, w - tw)
        return i, j, th, tw

    def __call__(self, img, lbl):
        assert img.size == lbl.size, \
            f"size of img and lbl should be the same. {img.size}, {lbl.size}"
        if self.padding > 0:
            img = _pil_pad(img, self.padding)
            lbl = _pil_pad(lbl, self.padding)
        if self.pad_if_needed and img.size[0] < self.size[1]:
            p = int((1 + self.size[1] - img.size[0]) / 2)
            img, lbl = _pil_pad(img, p), _pil_pad(lbl, p)
        if self.pad_if_needed and img.size[1] < self.size[0]:
            p = int((1 + self.size[0] - img.size[1]) / 2)
            img, lbl = _pil_pad(img, p), _pil_pad(lbl, p)
        i, j, th, tw = self.get_params(img, self.size)
        box = (j, i, j + tw, i + th)
        return img.crop(box), lbl.crop(box)


class ExtColorJitter:
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    @staticmethod
    def get_params(brightness, contrast, saturation):
        ops = []
        if brightness > 0:
            f = random.uniform(max(0, 1 - brightness), 1 + brightness)
            ops.append(("brightness", f))
        if contrast > 0:
            f = random.uniform(max(0, 1 - contrast), 1 + contrast)
            ops.append(("contrast", f))
        if saturation > 0:
            f = random.uniform(max(0, 1 - saturation), 1 + saturation)
            ops.append(("saturation", f))
        random.shuffle(ops)
        return ops

    def __call__(self, img, lbl):
        for name, f in self.get_params(self.brightness, self.contrast,
                                       self.saturation):
            if name == "brightness":
                img = ImageEnhance.Brightness(img).enhance(f)
            elif name == "contrast":
                img = ImageEnhance.Contrast(img).enhance(f)
            else:
                img = ImageEnhance.Color(img).enhance(f)
        return img, lbl


class ExtToTensor:
    """PIL -> numpy: image HWC float32 in [0,1] (or raw with
    normalize=False), label HW int64 (``target_type``)."""

    def __init__(self, normalize=True, target_type="uint8"):
        self.normalize = normalize
        self.target_type = target_type

    def __call__(self, pic, lbl):
        lbl_arr = np.array(lbl, dtype=self.target_type)
        if self.normalize:
            img = np.asarray(pic, dtype=np.float32) / 255.0
        else:
            img = np.asarray(pic, dtype=np.float32)
        return img, lbl_arr


class ExtNormalize:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, tensor, lbl):
        return (tensor - self.mean) / self.std, lbl
