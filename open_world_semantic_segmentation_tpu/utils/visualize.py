"""Visualization helpers: denormalization and result grids.

Replaces the reference's visdom dashboard + matplotlib dumps
(utils/visualizer.py, eval_ood_traditional.py:112-126) with plain PNG output.
"""

from __future__ import annotations

import os

import numpy as np

from .colors import color_encode, STREETHAZARDS_COLORS

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class Denormalize:
    """Invert ImageNet normalization on a CHW or HWC float image."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, tensor):
        arr = np.asarray(tensor, dtype=np.float32)
        if arr.ndim == 3 and arr.shape[0] == 3:  # CHW
            return arr * self.std[:, None, None] + self.mean[:, None, None]
        return arr * self.std + self.mean


def save_result_grid(img, seg, pred, info, dir_result,
                     colors=STREETHAZARDS_COLORS):
    """Save [image | gt | pred] side-by-side PNG.

    Parity: anomaly/eval_ood_traditional.py:112-126 (visualize_result).
    """
    from PIL import Image

    seg_color = color_encode(seg, colors)
    pred_color = color_encode(pred, colors)
    im_vis = np.concatenate((np.asarray(img), seg_color, pred_color),
                            axis=1).astype(np.uint8)
    img_name = info.split("/")[-1]
    os.makedirs(dir_result, exist_ok=True)
    Image.fromarray(im_vis).save(
        os.path.join(dir_result, img_name.replace(".jpg", ".png")))
