"""PASCAL VOC 2012 segmentation dataset (+train_aug list support).

Parity target: DeepLabV3Plus-Pytorch/datasets/voc.py — standard
VOCSegmentation layout with the SBD-augmented ``train_aug`` split driven by
an id list file (datasets/data/train_aug.txt, 10 582 ids) whose labels live
under ``SegmentationClassAug``.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def voc_cmap(N=256, normalized=False):
    """The standard VOC color map (voc.py:52-70)."""
    def bitget(byteval, idx):
        return (byteval & (1 << idx)) != 0

    dtype = "float32" if normalized else "uint8"
    cmap = np.zeros((N, 3), dtype=dtype)
    for i in range(N):
        r = g = b = 0
        c = i
        for j in range(8):
            r = r | (bitget(c, 0) << 7 - j)
            g = g | (bitget(c, 1) << 7 - j)
            b = b | (bitget(c, 2) << 7 - j)
            c = c >> 3
        cmap[i] = np.array([r, g, b])
    return cmap / 255 if normalized else cmap


class VOCSegmentation:
    """VOC2012 (+aug) dataset returning (image, target) via joint transform.

    root must contain VOCdevkit/VOC2012. For ``image_set='train_aug'``,
    labels are read from SegmentationClassAug and the id list from
    ImageSets/Segmentation/train_aug.txt.
    """

    cmap = voc_cmap()

    def __init__(self, root, year="2012", image_set="train", transform=None):
        self.root = os.path.expanduser(root)
        self.transform = transform
        voc_root = os.path.join(self.root, "VOCdevkit", f"VOC{year}")
        image_dir = os.path.join(voc_root, "JPEGImages")
        if not os.path.isdir(voc_root):
            raise RuntimeError("Dataset not found or corrupted: " + voc_root)

        if image_set == "train_aug":
            mask_dir = os.path.join(voc_root, "SegmentationClassAug")
            split_f = os.path.join(voc_root, "ImageSets", "Segmentation",
                                   "train_aug.txt")
        else:
            mask_dir = os.path.join(voc_root, "SegmentationClass")
            split_f = os.path.join(voc_root, "ImageSets", "Segmentation",
                                   image_set.rstrip("\n") + ".txt")
        if not os.path.exists(split_f):
            raise ValueError(f"missing split list {split_f}")
        with open(split_f, "r") as f:
            file_names = [x.strip() for x in f.readlines()]
        self.images = [os.path.join(image_dir, x + ".jpg")
                       for x in file_names]
        self.masks = [os.path.join(mask_dir, x + ".png")
                      for x in file_names]
        assert len(self.images) == len(self.masks)

    def __getitem__(self, index):
        img = Image.open(self.images[index]).convert("RGB")
        target = Image.open(self.masks[index])
        if self.transform is not None:
            img, target = self.transform(img, target)
        return img, np.array(target), np.array(target)

    def __len__(self):
        return len(self.images)

    @classmethod
    def decode_target(cls, mask):
        return cls.cmap[mask]
