"""odgt-list dataset pipeline (StreetHazards / BDD / Lost&Found).

Host-side numpy/PIL re-implementation of ``anomaly/dataset.py`` with the same
record format and preprocessing semantics:

- records ``{fpath_img, fpath_segm, height, width}`` parsed from a one-line
  JSON array (dataset.py:40-64);
- ImageNet normalization (dataset.py:36-38, 66-71), labels shifted by -1
  (dataset.py:73-76);
- training: aspect-ratio-bucketed sub-batching (h>w vs h<=w,
  dataset.py:100-123), per-batch random short-edge scale from ``img_sizes``
  capped by ``img_max_size`` (dataset.py:136-151), pad to a multiple of
  ``padding_constant`` (8), labels nearest-downsampled by
  ``segm_downsampling_rate`` after rounding up (dataset.py:201-210),
  random horizontal flip;
- validation: per-image pyramid of all ``img_sizes`` resizes (bilinear),
  each rounded up to the padding multiple, plus the untouched label
  (dataset.py:280-298).

TPU note: with fixed-size sources (StreetHazards is uniformly 1280x720) each
scale yields one static shape, so XLA compiles exactly
``len(img_sizes)`` programs for eval and one per (scale, orientation) bucket
for training — no dynamic-shape recompiles. The vendored multiprocessing
DataLoader (anomaly/lib/utils/data/dataloader.py) is replaced by a
thread-pool loader + double-buffered device feed in ``prefetch.py``.
"""

from __future__ import annotations

import json
import os
import threading
import queue as queue_mod
from typing import Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def parse_odgt(odgt, max_sample: int = -1, start_idx: int = -1,
               end_idx: int = -1) -> List[dict]:
    if isinstance(odgt, list):
        records = odgt
    else:
        with open(odgt, "r") as f:
            records = [json.loads(x.rstrip()) for x in f][0]
    if max_sample > 0:
        records = records[:max_sample]
    if start_idx >= 0 and end_idx >= 0:
        records = records[start_idx:end_idx]
    assert len(records) > 0
    return records


def img_transform(img: Image.Image) -> np.ndarray:
    """PIL RGB -> normalized float32 HWC."""
    arr = np.float32(np.array(img)) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def device_normalize(imgs):
    """On-device uint8 NHWC -> ImageNet-normalized float32 (jit-safe).

    The single definition of the device-input normalization used by the
    serving path (cli/serve.py --device-input) and its benchmark
    (tools/bench_stream.py) — keeping them one function guarantees the
    benchmarked program is the served program. Matches img_transform
    (dataset.py:36-38 semantics) bit-for-bit for uint8 inputs.
    """
    import jax.numpy as jnp

    imgs = imgs.astype(jnp.float32) / 255.0
    return (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def segm_transform(segm) -> np.ndarray:
    """label png -> int32 HW, values shifted to -1..C-1."""
    return np.array(segm, dtype=np.int32) - 1


def round2nearest_multiple(x: int, p: int) -> int:
    return ((x - 1) // p + 1) * p


def eval_pyramid_shapes(src_h: int, src_w: int,
                        img_sizes=(300, 375, 450, 525, 600),
                        img_max_size: int = 1000,
                        padding_constant: int = 8):
    """(h, w) of each eval-pyramid scale for a source image: short edge to
    each of ``img_sizes`` capped by ``img_max_size`` on the long edge,
    both rounded up to ``padding_constant`` (dataset.py:281-297)."""
    shapes = []
    for short in img_sizes:
        scale = min(short / float(min(src_h, src_w)),
                    img_max_size / float(max(src_h, src_w)))
        shapes.append((round2nearest_multiple(int(src_h * scale),
                                              padding_constant),
                       round2nearest_multiple(int(src_w * scale),
                                              padding_constant)))
    return shapes


def imresize(im: Image.Image, size, interp="bilinear") -> Image.Image:
    resample = {"nearest": Image.NEAREST, "bilinear": Image.BILINEAR,
                "bicubic": Image.BICUBIC}[interp]
    return im.resize(size, resample)


class TrainPipeline:
    """Infinite iterator of train batches with the reference's bucketing."""

    def __init__(self, root_dataset: str, odgt, *, batch_per_gpu: int = 2,
                 img_sizes=(300, 375, 450, 525, 600), img_max_size=1000,
                 padding_constant=8, segm_downsampling_rate=8,
                 random_flip=True, rec_dataset: Optional[str] = None,
                 seed: int = 304, num_hosts: int = 1, host_id: int = 0,
                 use_native: bool = True):
        # use_native: threaded C++ resample+normalize (native/image_ops.cpp);
        # matches PIL within uint8 quantization — fine for training, switch
        # off for bit-parity input reproduction
        from . import native as native_ops

        self.native = native_ops if (use_native and native_ops.available()) \
            else None
        self.root = root_dataset
        self.records = parse_odgt(odgt)
        self.batch_per_gpu = batch_per_gpu
        self.img_sizes = tuple(img_sizes)
        self.img_max_size = img_max_size
        self.padding_constant = padding_constant
        self.segm_down = segm_downsampling_rate
        self.random_flip = random_flip
        self.rec_dataset = rec_dataset
        if num_hosts > 1:
            from ..parallel.mesh import shard_index_space

            # all hosts agree on the epoch permutation via the shared seed,
            # then take disjoint contiguous shards
            idx = shard_index_space(len(self.records), num_hosts, host_id,
                                    shuffle_seed=seed)
            self.records = [self.records[i] for i in idx]
        self.rng = np.random.default_rng(seed + host_id)
        self._bucket = [[], []]
        self._cursor = 0
        self._order = list(range(len(self.records)))

    def _next_sub_batch(self) -> List[dict]:
        while True:
            rec = self.records[self._order[self._cursor]]
            idx = 0 if rec["height"] > rec["width"] else 1
            self._bucket[idx].append(rec)
            self._cursor += 1
            if self._cursor >= len(self.records):
                self._cursor = 0
                self.rng.shuffle(self._order)
            if len(self._bucket[idx]) == self.batch_per_gpu:
                out = self._bucket[idx]
                self._bucket[idx] = []
                return out

    def _load_pair(self, rec):
        if self.rec_dataset:
            folder, image = rec["fpath_img"].split("/")[-2:]
            image_path = os.path.join(self.rec_dataset, folder, image)
        else:
            image_path = os.path.join(self.root, rec["fpath_img"])
        segm_path = os.path.join(self.root, rec["fpath_segm"])
        img = Image.open(image_path).convert("RGB")
        segm = Image.open(segm_path)
        if self.rec_dataset:
            img = imresize(img, segm.size, "nearest")
        return img, segm

    def __iter__(self) -> Iterator[dict]:
        while True:
            yield self.next_batch()

    def next_batch(self) -> dict:
        records = self._next_sub_batch()
        short = int(self.rng.choice(self.img_sizes))

        widths = np.zeros(self.batch_per_gpu, np.int32)
        heights = np.zeros(self.batch_per_gpu, np.int32)
        for i, rec in enumerate(records):
            h, w = rec["height"], rec["width"]
            scale = min(short / min(h, w), self.img_max_size / max(h, w))
            widths[i] = int(w * scale)
            heights[i] = int(h * scale)
        bw = round2nearest_multiple(int(widths.max()), self.padding_constant)
        bh = round2nearest_multiple(int(heights.max()), self.padding_constant)

        imgs = np.zeros((self.batch_per_gpu, bh, bw, 3), np.float32)
        segs = np.zeros((self.batch_per_gpu, bh // self.segm_down,
                         bw // self.segm_down), np.int32)
        for i, rec in enumerate(records):
            img, segm = self._load_pair(rec)
            assert segm.mode == "L" and img.size == segm.size
            if self.random_flip and self.rng.choice([0, 1]):
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                segm = segm.transpose(Image.FLIP_LEFT_RIGHT)

            if self.native is not None:
                arr = self.native.resize_normalize(
                    np.asarray(img), (int(heights[i]), int(widths[i])))
                seg_full = self.native.resize_label(
                    np.asarray(segm), (int(heights[i]), int(widths[i])),
                    offset=0)
                sw = round2nearest_multiple(int(widths[i]), self.segm_down)
                sh = round2nearest_multiple(int(heights[i]), self.segm_down)
                canvas = np.zeros((sh, sw), np.uint8)
                canvas[:seg_full.shape[0], :seg_full.shape[1]] = \
                    seg_full.astype(np.uint8)
                seg = self.native.resize_label(
                    canvas, (sh // self.segm_down, sw // self.segm_down),
                    offset=-1)
            else:
                img = imresize(img, (widths[i], heights[i]), "bilinear")
                segm = imresize(segm, (widths[i], heights[i]), "nearest")

                sw = round2nearest_multiple(segm.size[0], self.segm_down)
                sh = round2nearest_multiple(segm.size[1], self.segm_down)
                canvas = Image.new("L", (sw, sh), 0)
                canvas.paste(segm, (0, 0))
                segm = imresize(canvas, (sw // self.segm_down,
                                         sh // self.segm_down), "nearest")
                arr = img_transform(img)
                seg = segm_transform(segm)
            imgs[i, :arr.shape[0], :arr.shape[1]] = arr
            segs[i, :seg.shape[0], :seg.shape[1]] = seg

        return {"img_data": imgs, "seg_label": segs}


class ValPipeline:
    """Sequential iterator of per-image multi-scale eval batches."""

    def __init__(self, root_dataset: str, odgt, *,
                 img_sizes=(300, 375, 450, 525, 600), img_max_size=1000,
                 padding_constant=8, rec_dataset: Optional[str] = None,
                 max_sample: int = -1, start_idx: int = -1,
                 end_idx: int = -1, use_native: bool = False,
                 num_hosts: int = 1, host_id: int = 0,
                 device_pyramid: bool = False):
        # use_native defaults OFF here: eval metric bit-parity requires the
        # exact PIL resample (native matches within uint8 quantization only)
        from . import native as native_ops

        self.native = native_ops if (use_native and native_ops.available()) \
            else None
        self.root = root_dataset
        self.records = parse_odgt(odgt, max_sample, start_idx, end_idx)
        if num_hosts > 1:
            # per-host contiguous shard of the sample index space
            # (replaces the reference's dormant DistributedSampler)
            from ..parallel.mesh import shard_index_space

            idx = shard_index_space(len(self.records), num_hosts, host_id)
            self.records = [self.records[i] for i in idx]
        self.img_sizes = tuple(img_sizes)
        self.img_max_size = img_max_size
        self.padding_constant = padding_constant
        self.rec_dataset = rec_dataset
        self.device_pyramid = device_pyramid

    def __len__(self):
        return len(self.records)

    def __getitem__(self, index: int) -> dict:
        rec = self.records[index]
        if self.rec_dataset:
            folder, image = rec["fpath_img"].split("/")[-2:]
            image_path = os.path.join(self.rec_dataset, folder, image)
        else:
            image_path = os.path.join(self.root, rec["fpath_img"])
        segm = Image.open(os.path.join(self.root, rec["fpath_segm"]))
        img = Image.open(image_path).convert("RGB")
        if self.rec_dataset:
            img = imresize(img, segm.size, "nearest")
        assert segm.mode == "L" and img.size == segm.size

        ow, oh = img.size
        shapes = eval_pyramid_shapes(oh, ow, self.img_sizes,
                                     self.img_max_size,
                                     self.padding_constant)

        out = {
            "seg_label": segm_transform(segm)[None],
            "info": rec["fpath_img"],
            "name": os.path.join(*rec["fpath_img"].split("/")[-2:]),
        }
        if self.device_pyramid:
            # throughput input path: ship ONE uint8 image; normalization
            # and the pyramid resizes happen inside the jitted eval program
            # (OODEvaluator builds them with ops.resize — torch-grid
            # bilinear, NOT the PIL triangle filter, so scores deviate
            # from the host path within resampling tolerance)
            out["img_raw"] = np.asarray(img, np.uint8)[None]
            out["pyramid_shapes"] = tuple(shapes)
            out["img_ori"] = out["img_raw"][0]
            return out

        pyramid = []
        for th, tw in shapes:
            if self.native is not None:
                pyramid.append(
                    self.native.resize_normalize(np.asarray(img),
                                                 (th, tw))[None])
            else:
                resized = imresize(img, (tw, th), "bilinear")
                pyramid.append(img_transform(resized)[None])

        out["img_ori"] = np.array(img)
        out["img_data"] = pyramid
        return out

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
