"""Data-layer tests on synthetic StreetHazards/Cityscapes trees."""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_streethazards, make_cityscapes  # noqa

from open_world_semantic_segmentation_tpu.data import (
    TrainPipeline,
    ValPipeline,
    Cityscapes,
    encode_target,
    transforms as et,
    prefetch_to_device,
)


@pytest.fixture(scope="module")
def sh_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sh")
    return make_streethazards(str(root))


@pytest.fixture(scope="module")
def cs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cs")
    return make_cityscapes(str(root))


def test_train_pipeline_shapes_and_labels(sh_root):
    pipe = TrainPipeline(sh_root, os.path.join(sh_root, "train.odgt"),
                         batch_per_gpu=2, img_sizes=(48, 64),
                         img_max_size=120, segm_downsampling_rate=8)
    batch = pipe.next_batch()
    img, seg = batch["img_data"], batch["seg_label"]
    assert img.shape[0] == 2 and img.shape[-1] == 3
    assert img.shape[1] % 8 == 0 and img.shape[2] % 8 == 0
    assert seg.shape == (2, img.shape[1] // 8, img.shape[2] // 8)
    # labels were shifted by -1: synthetic raw 1..14 -> 0..13
    assert seg.min() >= -1 and seg.max() <= 13


def test_val_pipeline_pyramid(sh_root):
    pipe = ValPipeline(sh_root, os.path.join(sh_root, "val.odgt"),
                       img_sizes=(48, 64, 96), img_max_size=200)
    item = pipe[0]
    assert len(item["img_data"]) == 3
    for level in item["img_data"]:
        assert level.ndim == 4 and level.shape[-1] == 3
        assert level.shape[1] % 8 == 0 and level.shape[2] % 8 == 0
    assert item["seg_label"].shape[1:] == (72, 128)
    # anomaly pixels (raw 14 -> 13) present in val
    assert (item["seg_label"] == 13).any()


def test_encode_target_remap_semantics():
    # raw ids -> train ids -> unknown remap (truck=14, bus=15 removed)
    raw = np.array([[7, 8, 26, 27, 28, 31, 33, 0]])  # road sidewalk car truck bus train bicycle void
    target, target_true = encode_target(raw, unknown_target=(14, 15))
    # train ids before remap: 0 1 13 14 15 16 18 255
    np.testing.assert_array_equal(target_true, [[0, 1, 13, 14, 15, 16, 18, 255]])
    # after: truck/bus -> 255; train 16->14, motorcycle 17->15, bicycle 18->16
    np.testing.assert_array_equal(target, [[0, 1, 13, 255, 255, 14, 16, 255]])


def test_encode_target_no_unknown():
    raw = np.arange(34).reshape(1, -1)
    t, tt = encode_target(raw, unknown_target=None)
    np.testing.assert_array_equal(t, tt)


def test_cityscapes_dataset_getitem(cs_root):
    tf = et.ExtCompose([
        et.ExtRandomCrop(size=(64, 64)),
        et.ExtColorJitter(brightness=0.5, contrast=0.5, saturation=0.5),
        et.ExtRandomHorizontalFlip(),
        et.ExtToTensor(),
        et.ExtNormalize(),
    ])
    ds = Cityscapes(cs_root, split="train", transform=tf)
    assert len(ds) == 3
    img, target, target_true = ds[0]
    assert img.shape == (64, 64, 3)
    assert target.shape == (64, 64)
    assert set(np.unique(target)) <= set(range(17)) | {255}

    # full-image (no crop): guaranteed car pixels (raw 26 -> train 13)
    ds_full = Cityscapes(cs_root, split="train")
    _, target_f, target_true_f = ds_full[0]
    assert (target_true_f == 13).any()
    assert (target_f == 13).any()       # car train-id stays 13 after remap
    assert (target_true_f == 14).any()  # truck present pre-remap
    # truck/bus pixels become 255 after the unknown remap
    assert np.all(target_f[target_true_f == 14] == 255)
    assert np.all(target_f[target_true_f == 15] == 255)


def test_ext_random_crop_pad_if_needed():
    img = Image.new("RGB", (30, 20))
    lbl = Image.new("L", (30, 20), 255)
    crop = et.ExtRandomCrop(size=(64, 64), pad_if_needed=True)
    ci, cl = crop(img, lbl)
    assert ci.size == (64, 64) and cl.size == (64, 64)


def test_prefetch_to_device_order_and_completion():
    data = [{"x": np.full((2, 2), i)} for i in range(7)]
    out = list(prefetch_to_device(data, size=3))
    assert len(out) == 7
    for i, item in enumerate(out):
        assert int(np.asarray(item["x"])[0, 0]) == i


def test_prefetch_propagates_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise ValueError("boom")

    it = prefetch_to_device(gen(), size=2)
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_pipelines_shard_across_hosts(sh_root):
    """Multi-host input sharding: hosts see disjoint (covering) records."""
    pipes = [ValPipeline(sh_root, os.path.join(sh_root, "val.odgt"),
                         img_sizes=(24,), num_hosts=2, host_id=h)
             for h in range(2)]
    names = [tuple(r["fpath_img"] for r in p.records) for p in pipes]
    all_names = set(names[0]) | set(names[1])
    full = ValPipeline(sh_root, os.path.join(sh_root, "val.odgt"),
                       img_sizes=(24,))
    assert all_names == {r["fpath_img"] for r in full.records}
    assert len(names[0]) == len(names[1])

    tp = [TrainPipeline(sh_root, os.path.join(sh_root, "train.odgt"),
                        batch_per_gpu=1, img_sizes=(24,), img_max_size=80,
                        num_hosts=2, host_id=h) for h in range(2)]
    tr_names = [set(r["fpath_img"] for r in p.records) for p in tp]
    full_tr = TrainPipeline(sh_root, os.path.join(sh_root, "train.odgt"),
                            batch_per_gpu=1, img_sizes=(24,), img_max_size=80)
    assert tr_names[0] | tr_names[1] == \
        {r["fpath_img"] for r in full_tr.records}
    # both host pipelines produce batches
    for p in tp:
        b = p.next_batch()
        assert b["img_data"].shape[0] == 1


def test_iter_prefetch_order_and_errors():
    from open_world_semantic_segmentation_tpu.data.prefetch import (
        iter_prefetch)

    assert list(iter_prefetch(range(9), depth=3)) == list(range(9))

    def gen():
        yield 1
        raise RuntimeError("host decode failed")

    with pytest.raises(RuntimeError, match="host decode failed"):
        list(iter_prefetch(gen(), depth=2))


def test_batch_iterator_shards_across_hosts():
    """Driver-level multi-host input: the DeepLab batch_iterator's host
    shards are disjoint, cover the dataset, and share the per-epoch
    permutation (the SPMD DistributedSampler replacement the drivers now
    pass process_count/index into)."""
    from open_world_semantic_segmentation_tpu.data.loader import (
        batch_iterator,
    )

    data = list(range(12))
    per_host = []
    for host in range(2):
        it = batch_iterator(data, 2, seed=7, epochs=2, num_workers=0,
                            num_hosts=2, host_id=host)
        per_host.append([int(x) for b in it for x in b])
    # each epoch: disjoint covering shards
    for ep in range(2):
        a = per_host[0][ep * 6:(ep + 1) * 6]
        b = per_host[1][ep * 6:(ep + 1) * 6]
        assert set(a) | set(b) == set(data)
        assert not set(a) & set(b)
    # epochs use different shared permutations
    assert per_host[0][:6] != per_host[0][6:]

    # single-host stream is unchanged in coverage
    full = [int(x) for b in batch_iterator(data, 2, seed=7, epochs=1,
                                           num_workers=0) for x in b]
    assert sorted(full) == data
