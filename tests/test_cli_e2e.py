"""End-to-end driver tests on tiny synthetic datasets (CPU, tiny models)."""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_streethazards, make_cityscapes  # noqa

from open_world_semantic_segmentation_tpu.core.config import Config

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def sh_root(tmp_path_factory):
    return make_streethazards(
        str(tmp_path_factory.mktemp("sh")), n_train=4, n_val=2, h=48, w=64)


@pytest.fixture(scope="module")
def cs_root(tmp_path_factory):
    return make_cityscapes(
        str(tmp_path_factory.mktemp("cs")), n=3, h=64, w=96)


def _anomaly_cfg(sh_root, tmp_path):
    cfg = Config()
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.DATASET.root_dataset = sh_root
    cfg.DATASET.list_train = os.path.join(sh_root, "train.odgt")
    cfg.DATASET.list_val = os.path.join(sh_root, "val.odgt")
    cfg.DATASET.num_class = 13
    cfg.DATASET.imgSizes = (24, 32)
    cfg.DATASET.imgMaxSize = 80
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.TRAIN.batch_size_per_gpu = 2
    cfg.TRAIN.num_epoch = 1
    cfg.TRAIN.epoch_iters = 3
    cfg.TRAIN.disp_iter = 2
    return cfg


def test_train_embedding_then_eval_ood(sh_root, tmp_path, capsys):
    from open_world_semantic_segmentation_tpu.cli import train_embedding
    from open_world_semantic_segmentation_tpu.cli import eval_ood

    cfg = _anomaly_cfg(sh_root, tmp_path)
    state = train_embedding.main(cfg, jnp.float32, max_steps=3)
    assert int(state.step) == 3
    ckpt = os.path.join(cfg.DIR, "model_epoch_1.pkl")
    assert os.path.exists(ckpt)

    # eval from the saved checkpoint
    cfg2 = cfg.clone()
    cfg2.DATASET.root_dataset = sh_root
    cfg2.MODEL.weights_encoder = ckpt
    cfg2.OOD.ood = "dissum"
    result = eval_ood.main(cfg2, jnp.float32, max_images=2)
    out = capsys.readouterr().out
    assert "Mean IoU" in out and "mean auroc" in out
    assert result["auroc"] is not None


def test_eval_ood_quant_int8(sh_root, tmp_path, capsys):
    """--quant int8 through the real eval driver: calibrate on the first
    val images, prequantize, evaluate — reference-format summary out."""
    from open_world_semantic_segmentation_tpu.cli import eval_ood

    cfg = _anomaly_cfg(sh_root, tmp_path)
    cfg.OOD.ood = "dissum"
    result = eval_ood.main(cfg, jnp.float32, max_images=2, quant="int8",
                           calib_images=1)
    out = capsys.readouterr().out
    assert "int8 calibration done" in out and "mean auroc" in out
    assert result["auroc"] is not None


def test_eval_ood_all_methods(sh_root, tmp_path, monkeypatch):
    import functools

    from open_world_semantic_segmentation_tpu.cli import eval_ood
    from open_world_semantic_segmentation_tpu.openset import crf as crf_mod

    # this test checks driver plumbing for every method; the CRF mean-field
    # numerics have dedicated oracle tests (test_crf.py), so 5 iterations
    # instead of 100 keeps the single-CPU runtime sane
    monkeypatch.setattr(crf_mod, "gaussian_crf_conf",
                        functools.partial(crf_mod.gaussian_crf_conf,
                                          iters=5))
    monkeypatch.setattr(crf_mod, "bilateral_crf_conf",
                        functools.partial(crf_mod.bilateral_crf_conf,
                                          iters=5))
    for method in ("msp", "maxlogit", "background", "knn", "crf-gauss",
                   "crf"):
        cfg = _anomaly_cfg(sh_root, tmp_path)
        cfg.OOD.ood = method
        result = eval_ood.main(cfg, jnp.float32, max_images=1)
        assert result["mean_iou"] >= 0.0


def test_test_closed_saves_pngs(sh_root, tmp_path):
    from open_world_semantic_segmentation_tpu.cli import test_closed

    cfg = _anomaly_cfg(sh_root, tmp_path)
    cfg.MODEL.arch_decoder = "ppm_deepsup"
    cfg.TEST.result = str(tmp_path / "results")
    test_closed.main(cfg, jnp.float32, max_images=1)
    saved = []
    for root, _, files in os.walk(cfg.TEST.result):
        saved += [f for f in files if f.endswith(".png")]
    assert saved


def _deeplab_cfg(cs_root, tmp_path):
    cfg = Config()
    cfg.DIR = str(tmp_path / "dl")
    cfg.DATASET.root_dataset = cs_root
    cfg.DEEPLAB.model = "deeplabv3plus_mobilenet"
    cfg.DEEPLAB.num_classes = 16
    cfg.DEEPLAB.crop_size = 32
    cfg.DEEPLAB.batch_size = 2
    cfg.DEEPLAB.total_itrs = 3
    cfg.DEEPLAB.val_interval = 3
    cfg.FEWSHOT.novel_cls = 1
    return cfg


def test_main_deeplab_train_and_validate(cs_root, tmp_path, capsys):
    from open_world_semantic_segmentation_tpu.cli import main_deeplab

    cfg = _deeplab_cfg(cs_root, tmp_path)
    # embedding model so the open-world remap is active; resnet50 rather
    # than 101 — half the CPU compile, same driver surface (the resnet101
    # topology is covered by the parity suite)
    cfg.DEEPLAB.model = "deeplabv3plus_embedding_resnet50"
    state = main_deeplab.main(cfg, jnp.float32, max_steps=3)
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(cfg.DIR, "latest.pkl"))
    out = capsys.readouterr().out
    assert "Mean IoU" in out


def test_main_deeplab_test_only_saves_val_results(cs_root, tmp_path,
                                                  capsys):
    """Eval-only surface (main.py --test_only + --save_val_results +
    test.py): train briefly, then evaluate the saved checkpoint standalone
    through the SAME driver via DEEPLAB.test_only, dumping the reference's
    five result PNGs (main.py:209-234) and the per-image open-set
    AUROC/FPR95/AUPR prints (test.py:287-289)."""
    from PIL import Image

    from open_world_semantic_segmentation_tpu.cli import main_deeplab

    cfg = _deeplab_cfg(cs_root, tmp_path)
    cfg.DEEPLAB.model = "deeplabv3plus_mobilenet"
    cfg.DEEPLAB.unknown_scores = True  # open-world remap, as in test.py
    state = main_deeplab.main(cfg, jnp.float32, max_steps=3)
    assert os.path.exists(os.path.join(cfg.DIR, "latest.pkl"))
    capsys.readouterr()

    cfg2 = cfg.clone()
    cfg2.DEEPLAB.test_only = True
    cfg2.DEEPLAB.ckpt = os.path.join(cfg.DIR, "latest.pkl")
    cfg2.DEEPLAB.save_val_results = True
    cfg2.DEEPLAB.unknown_scores = True
    score, ood = main_deeplab.main(cfg2, jnp.float32)
    out = capsys.readouterr().out
    assert "Mean IoU" in out
    assert 0.0 <= score["Mean IoU"] <= 1.0

    results = os.path.join(cfg.DIR, "results")
    files = sorted(os.listdir(results))
    for suffix in ("image", "target", "pred", "scores", "overlay"):
        assert f"0_{suffix}.png" in files
    # shapes: RGB for image/target/pred/overlay, grayscale for scores,
    # all at the dataset's full resolution (synthetic tree is 64x96)
    img = np.asarray(Image.open(os.path.join(results, "0_image.png")))
    tgt = np.asarray(Image.open(os.path.join(results, "0_target.png")))
    sc = np.asarray(Image.open(os.path.join(results, "0_scores.png")))
    assert img.shape == tgt.shape == (64, 96, 3)
    assert sc.shape == (64, 96)


def test_self_distillation_train_and_eval(cs_root, tmp_path, capsys):
    from open_world_semantic_segmentation_tpu.cli import self_distillation

    cfg = _deeplab_cfg(cs_root, tmp_path)
    cfg.DEEPLAB.total_itrs = 2
    cfg.FEWSHOT.shots = 0  # use train split
    state = self_distillation.main(cfg, jnp.float32, mode="train",
                                   max_steps=2)
    score = self_distillation.main(
        cfg, jnp.float32, mode="eval", max_images=2,
        variables={"params": state.params,
                   "batch_stats": state.batch_stats})
    assert 0.0 <= score["Mean IoU"] <= 1.0


def test_extract_prototypes_and_npm_eval(cs_root, tmp_path, capsys):
    from open_world_semantic_segmentation_tpu.cli import (
        extract_prototypes, eval_embedding)

    cfg = _deeplab_cfg(cs_root, tmp_path)
    cfg.DEEPLAB.model = "deeplabv3plus_embedding_resnet101"
    cfg.FEWSHOT.shots = 2
    cfg.FEWSHOT.prototype_file = str(tmp_path / "prototype_car_2_shot.json")
    protos = extract_prototypes.main(cfg, jnp.float32, novel_true_id=13)
    assert len(protos) >= 1
    with open(cfg.FEWSHOT.prototype_file) as f:
        assert len(json.load(f)) == len(protos)

    score = eval_embedding.main(cfg, jnp.float32, max_images=2)
    assert 0.0 <= score["Mean IoU"] <= 1.0


def test_eval_embedding_calibrated_scores(cs_root, tmp_path, capsys):
    """GMM/ECDF score calibration end to end (the reference's dormant
    main_embedding.py:175-226 design as a working opt-in): collection pass
    -> per-class fit -> calibrated OOD measures + saved .npz state."""
    from open_world_semantic_segmentation_tpu.cli import (
        extract_prototypes, eval_embedding)
    from open_world_semantic_segmentation_tpu.openset import ScoreCalibration

    cfg = _deeplab_cfg(cs_root, tmp_path)
    cfg.DEEPLAB.model = "deeplabv3plus_embedding_resnet101"
    cfg.FEWSHOT.shots = 2
    cfg.FEWSHOT.prototype_file = str(tmp_path / "prototype_car_2_shot.json")
    extract_prototypes.main(cfg, jnp.float32, novel_true_id=13)

    cfg.FEWSHOT.calibrate_scores = True
    cfg.FEWSHOT.calib_images = 2
    cfg.FEWSHOT.calib_rate = 1  # tiny images: keep every agreeing pixel
    cfg.FEWSHOT.calib_save = str(tmp_path / "calib.npz")
    score = eval_embedding.main(cfg, jnp.float32, max_images=2)
    assert 0.0 <= score["Mean IoU"] <= 1.0
    # the synthetic val tree guarantees unknown (255) pixels, so the
    # calibrated OOD measures must have been computed and printed
    assert "calib_auroc" in score
    assert 0.0 <= score["calib_auroc"] <= 1.0
    out = capsys.readouterr().out
    assert "calibrated-score OOD" in out
    back = ScoreCalibration.load(cfg.FEWSHOT.calib_save)
    assert back.num_classes == 16


def test_make_odgt_streethazards(sh_root, tmp_path):
    from open_world_semantic_segmentation_tpu.cli import make_odgt

    make_odgt.main(["streethazards", "--root", sh_root,
                    "--img-dir", "images/test", "--ann-dir",
                    "annotations/test", "--out", "rebuilt.odgt"])
    with open(os.path.join(sh_root, "rebuilt.odgt")) as f:
        records = json.load(f)
    assert len(records) == 2  # n_val synthetic test images
    assert {"fpath_img", "fpath_segm", "height", "width"} <= set(records[0])


def test_config_yaml_roundtrip(tmp_path):
    import yaml

    from open_world_semantic_segmentation_tpu.core.config import load_config

    cfg = load_config("configs/train_embedding.yaml",
                      ["TRAIN.num_epoch", "5", "OOD.ood", "dissum"])
    assert cfg.DATASET.num_class == 13
    assert cfg.DATASET.imgSizes == (300, 375, 450, 525, 600)
    assert cfg.TRAIN.num_epoch == 5
    assert cfg.OOD.ood == "dissum"
    assert cfg.TRAIN.weight_decay == 1e-4  # "1e-4" string coerced to float


def test_hrnet_and_c1_pipeline(sh_root, tmp_path):
    """hrnetv2 encoder + c1 decoder wiring through the eval driver."""
    from open_world_semantic_segmentation_tpu.cli import eval_ood

    cfg = _anomaly_cfg(sh_root, tmp_path)
    cfg.MODEL.arch_encoder = "hrnetv2"
    cfg.MODEL.arch_decoder = "c1"
    cfg.MODEL.fc_dim = 720
    cfg.OOD.ood = "msp"
    result = eval_ood.main(cfg, jnp.float32, max_images=1)
    assert result["mean_iou"] >= 0.0


def test_mobilenet_dilated_pipeline(sh_root, tmp_path):
    from open_world_semantic_segmentation_tpu.cli import eval_ood

    cfg = _anomaly_cfg(sh_root, tmp_path)
    cfg.MODEL.arch_encoder = "mobilenetv2dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 320
    result = eval_ood.main(cfg, jnp.float32, max_images=1)
    assert result["mean_iou"] >= 0.0


def test_eval_ood_bdd_style_exclude_back(sh_root, tmp_path):
    """BDD/LAF preset shape: 19 classes, out_labels=(1,), exclude_back."""
    from open_world_semantic_segmentation_tpu.cli import eval_ood

    cfg = _anomaly_cfg(sh_root, tmp_path)
    cfg.DATASET.num_class = 19
    cfg.OOD.ood = "dissum"
    cfg.OOD.out_labels = (1,)
    cfg.OOD.exclude_back = True
    result = eval_ood.main(cfg, jnp.float32, max_images=2)
    assert result["class_iou"].shape == (19,)
    assert result["auroc"] is not None  # synthetic labels include id 1


def test_make_odgt_laf_empty_label_filter(tmp_path):
    """LAF walker: leftImg8bit->gtCoarse_labelIds name mapping, missing
    annotations skipped, single-valued (empty) label images filtered
    (create_dataset.py:202-273)."""
    from PIL import Image

    from open_world_semantic_segmentation_tpu.cli import make_odgt

    root = str(tmp_path / "laf")
    img_dir = os.path.join(root, "leftImg8bit", "test", "city01")
    ann_dir = os.path.join(root, "gtCoarse", "test", "city01")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.default_rng(0)

    def put(name, label):
        Image.fromarray(
            rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)).save(
            os.path.join(img_dir, name + "_leftImg8bit.png"))
        if label is not None:
            Image.fromarray(label).save(
                os.path.join(ann_dir, name + "_gtCoarse_labelIds.png"))

    varied = rng.integers(0, 3, (16, 24), dtype=np.uint8)
    put("01_seq_000001_000010", varied)          # kept
    put("01_seq_000002_000020", np.zeros((16, 24), np.uint8))  # empty label
    put("01_seq_000003_000030", None)            # no annotation
    make_odgt.main(["laf", "--root", root,
                    "--img-dir", "leftImg8bit/test",
                    "--ann-dir", "gtCoarse/test", "--out", "laf.odgt"])
    with open(os.path.join(root, "laf.odgt")) as f:
        records = json.load(f)
    assert len(records) == 1
    assert records[0]["fpath_img"].endswith(
        "01_seq_000001_000010_leftImg8bit.png")
    assert records[0]["fpath_segm"].endswith(
        "01_seq_000001_000010_gtCoarse_labelIds.png")


def test_make_odgt_roadanomaly(tmp_path):
    """RoadAnomaly walker: frames/<x>.jpg with
    <x>.labels/labels_semantic.png (create_dataset.py:163-195)."""
    from PIL import Image

    from open_world_semantic_segmentation_tpu.cli import make_odgt

    root = str(tmp_path / "ra")
    frames = os.path.join(root, "frames")
    os.makedirs(os.path.join(frames, "scene01.labels"))
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)).save(
        os.path.join(frames, "scene01.jpg"))
    Image.fromarray(rng.integers(0, 3, (16, 24), dtype=np.uint8)).save(
        os.path.join(frames, "scene01.labels", "labels_semantic.png"))
    # jpg without labels dir -> skipped
    Image.fromarray(rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)).save(
        os.path.join(frames, "scene02.jpg"))
    make_odgt.main(["roadanomaly", "--root", root, "--img-dir", "frames",
                    "--out", "ra.odgt"])
    with open(os.path.join(root, "ra.odgt")) as f:
        records = json.load(f)
    assert len(records) == 1
    assert records[0]["fpath_img"] == os.path.join("frames", "scene01.jpg")
    assert records[0]["fpath_segm"] == os.path.join(
        "frames", "scene01.labels", "labels_semantic.png")


def test_make_odgt_convert_bdd_remap(tmp_path):
    """BDD in-place remap (create_dataset.py:131-154): 255->-1, the
    16<->18 swap via the 19 temp, then +1 — i.e. 255->0, 16->19, 18->17,
    everything else shifted up by one."""
    from PIL import Image

    from open_world_semantic_segmentation_tpu.cli import make_odgt

    root = str(tmp_path / "bdd")
    ann = os.path.join(root, "labels")
    os.makedirs(ann)
    src = np.array([[0, 1, 15, 16], [17, 18, 255, 5]], dtype=np.uint8)
    Image.fromarray(src).save(os.path.join(ann, "a.png"))
    make_odgt.main(["convert-bdd", "--root", root, "--ann-dir", "labels"])
    got = np.array(Image.open(os.path.join(ann, "a.png")))
    want = np.array([[1, 2, 16, 19], [18, 17, 0, 6]], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)
