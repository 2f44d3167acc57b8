"""Tests for secondary surface: VOC, pick_images, demo_video, distillation,
reconstruction OOD, observability, fishyscapes estimator."""

import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from make_synthetic_data import make_streethazards, make_cityscapes  # noqa

from open_world_semantic_segmentation_tpu.core.config import Config

pytestmark = pytest.mark.e2e


def _make_voc(root, n=3, h=40, w=56):
    rng = np.random.default_rng(0)
    voc = os.path.join(root, "VOCdevkit", "VOC2012")
    os.makedirs(os.path.join(voc, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(voc, "SegmentationClass"), exist_ok=True)
    os.makedirs(os.path.join(voc, "ImageSets", "Segmentation"), exist_ok=True)
    names = [f"2007_{i:06d}" for i in range(n)]
    for name in names:
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lab = rng.integers(0, 21, (h, w), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(voc, "JPEGImages",
                                               name + ".jpg"))
        Image.fromarray(lab, "L").save(
            os.path.join(voc, "SegmentationClass", name + ".png"))
    with open(os.path.join(voc, "ImageSets", "Segmentation", "train.txt"),
              "w") as f:
        f.write("\n".join(names))
    return root


def test_voc_dataset(tmp_path):
    from open_world_semantic_segmentation_tpu.data import VOCSegmentation
    from open_world_semantic_segmentation_tpu.data import transforms as et

    root = _make_voc(str(tmp_path))
    tf = et.ExtCompose([et.ExtRandomScale((0.5, 2.0)),
                        et.ExtRandomCrop(size=(33, 33), pad_if_needed=True),
                        et.ExtRandomHorizontalFlip(),
                        et.ExtToTensor(), et.ExtNormalize()])
    ds = VOCSegmentation(root, image_set="train", transform=tf)
    assert len(ds) == 3
    img, target, _ = ds[0]
    assert img.shape == (33, 33, 3)
    assert target.shape == (33, 33)
    # cmap shape
    assert VOCSegmentation.decode_target(target).shape == (33, 33, 3)


def test_pick_images_creates_split(tmp_path):
    from open_world_semantic_segmentation_tpu.cli import pick_images

    root = make_cityscapes(str(tmp_path / "cs"), n=3)
    pick_images.main(["--root", root, "--src", "train", "--dst", "car_2",
                      "--n", "2", "--copy"])
    new_imgs = []
    for city in os.listdir(os.path.join(root, "leftImg8bit", "car_2")):
        new_imgs += os.listdir(os.path.join(root, "leftImg8bit", "car_2",
                                            city))
    assert len(new_imgs) == 2


def test_demo_video_overlay_and_live(tmp_path):
    from open_world_semantic_segmentation_tpu.cli import demo_video

    root = make_cityscapes(str(tmp_path / "cs"), splits=("demo_video",),
                           n=2, h=48, w=64)
    cfg = Config()
    cfg.DATASET.root_dataset = root
    cfg.DEEPLAB.model = "deeplabv3plus_mobilenet"
    cfg.DEEPLAB.num_classes = 19

    # overlay mode from saved preds
    preds_dir = str(tmp_path / "preds")
    os.makedirs(preds_dir, exist_ok=True)
    ds_imgs = os.path.join(root, "leftImg8bit", "demo_video", "synthcity")
    for f in os.listdir(ds_imgs):
        pred = np.random.default_rng(0).integers(0, 19, (48, 64),
                                                 dtype=np.uint8)
        Image.fromarray(pred, "L").save(os.path.join(preds_dir, f))
    out = str(tmp_path / "demo.avi")
    demo_video.overlay_mode(cfg, preds_dir, out, max_frames=2)
    assert os.path.exists(out) or os.path.isdir(out + ".frames")

    # live mode with a random-init model
    seq = demo_video.live_mode(cfg, str(tmp_path / "live.avi"), jnp.float32,
                               max_frames=1)
    assert len(os.listdir(seq)) == 1


def test_main_distillation_runs(tmp_path):
    from open_world_semantic_segmentation_tpu.cli import main_distillation

    root = make_cityscapes(str(tmp_path / "cs"), n=3, h=64, w=96)
    cfg = Config()
    cfg.DIR = str(tmp_path / "ckpt")
    cfg.DATASET.root_dataset = root
    # the lighter embedding composition halves this test's compile time;
    # the reference default (resnet101) stays the driver default
    cfg.DEEPLAB.model = "deeplabv3plus_embedding_resnet50"
    cfg.DEEPLAB.num_classes = 16
    cfg.DEEPLAB.crop_size = 32
    cfg.DEEPLAB.batch_size = 2
    cfg.DEEPLAB.total_itrs = 2
    cfg.FEWSHOT.shots = 0
    state = main_distillation.main(cfg, jnp.float32, max_steps=2)
    assert int(state.step) == 2
    assert os.path.exists(os.path.join(cfg.DIR, "distillation_student.pkl"))


def test_eval_ood_rec_runs(tmp_path, capsys):
    from open_world_semantic_segmentation_tpu.cli import eval_ood_rec

    root = make_streethazards(str(tmp_path / "sh"), n_val=2, h=48, w=64)
    # reconstructed images: reuse the same folder structure
    cfg = Config()
    cfg.DATASET.root_dataset = root
    cfg.DATASET.rec_dataset = os.path.join(root, "images", "test")
    cfg.DATASET.list_val = os.path.join(root, "val.odgt")
    cfg.DATASET.num_class = 13
    cfg.DATASET.imgSizes = (24, 32)
    cfg.DATASET.imgMaxSize = 80
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup"
    cfg.MODEL.fc_dim = 512
    result = eval_ood_rec.main(cfg, jnp.float32, max_images=2)
    assert result["auroc"] is not None


def test_metrics_writer(tmp_path):
    from open_world_semantic_segmentation_tpu.utils import MetricsWriter

    p = str(tmp_path / "m" / "metrics.jsonl")
    with MetricsWriter(p) as w:
        w.write(1, loss=0.5, acc=np.float32(0.25))
        w.write(2, loss=0.4)
    lines = [json.loads(x) for x in open(p)]
    assert lines[0]["loss"] == 0.5 and lines[0]["acc"] == 0.25
    assert lines[1]["step"] == 2


def test_fishyscapes_estimator(tmp_path):
    import jax
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset import make_estimator

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)))
    est = make_estimator(model, variables, method="entropy")
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3),
                                            dtype=np.uint8)
    score = est(img)
    # scores at feature resolution (no seg_size given -> stride 8)
    assert score.shape == (4, 4)
    assert np.isfinite(score).all()


def test_fishyscapes_run_native_perfect_separation(tmp_path):
    """run_native computes the POOLED-pixel Fishyscapes metrics: with an
    estimator whose scores perfectly rank anomaly pixels above the rest,
    AP = AUROC = 1 and FPR95 = 0; void pixels (raw label 0 -> -1) are
    excluded from the pool."""
    import json

    from PIL import Image

    from open_world_semantic_segmentation_tpu.openset.fishyscapes import (
        run_native)

    root = str(tmp_path / "laf")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    records = []
    masks = {}
    for i in range(2):
        # raw labelIds: 0 void, 1 in-distribution, 2 anomaly
        lab = np.ones((16, 24), np.uint8)
        lab[:, :4] = 0
        lab[5 + i:9 + i, 10:14] = 2
        Image.fromarray(rng.integers(0, 255, (16, 24, 3),
                                     dtype=np.uint8)).save(
            os.path.join(root, f"img{i}.png"))
        Image.fromarray(lab).save(os.path.join(root, f"lab{i}.png"))
        records.append({"fpath_img": f"img{i}.png",
                        "fpath_segm": f"lab{i}.png",
                        "height": 16, "width": 24})
        masks[f"img{i}.png"] = lab == 2

    odgt = os.path.join(root, "laf.odgt")
    with open(odgt, "w") as f:
        json.dump(records, f)

    calls = {"n": 0}

    def estimator(img):
        # higher score exactly on the anomaly pixels of this image
        key = records[calls["n"]]["fpath_img"]
        calls["n"] += 1
        return masks[key].astype(np.float32) + \
            0.1 * rng.random(masks[key].shape)

    result = run_native(estimator, root, odgt)
    assert result["n_images"] == 2
    assert result["AP"] == 1.0 and result["AUROC"] == 1.0
    assert result["FPR95"] == 0.0

    # inverted scores -> AUROC collapses
    calls["n"] = 0
    inv = run_native(lambda im: -estimator(im), root, odgt)
    assert inv["AUROC"] < 0.5


def test_eval_fishyscapes_cli(tmp_path):
    """The bdlb-free driver end to end: random-weight DeepLab estimator
    over a tiny LAF tree -> pooled AP/AUROC/FPR95 JSON."""
    import json

    from PIL import Image

    from open_world_semantic_segmentation_tpu.cli import eval_fishyscapes

    root = str(tmp_path / "laf")
    os.makedirs(root)
    rng = np.random.default_rng(1)
    records = []
    for i in range(2):
        lab = np.ones((32, 48), np.uint8)
        lab[10:20, 20:30] = 2
        Image.fromarray(rng.integers(0, 255, (32, 48, 3),
                                     dtype=np.uint8)).save(
            os.path.join(root, f"i{i}.png"))
        Image.fromarray(lab).save(os.path.join(root, f"l{i}.png"))
        records.append({"fpath_img": f"i{i}.png", "fpath_segm": f"l{i}.png",
                        "height": 32, "width": 48})
    odgt = os.path.join(root, "laf.odgt")
    with open(odgt, "w") as f:
        json.dump(records, f)

    cfg = Config()
    cfg.DATASET.root_dataset = root
    cfg.DATASET.list_val = odgt
    cfg.DEEPLAB.model = "deeplabv3plus_mobilenet"
    cfg.DEEPLAB.num_classes = 19
    result = eval_fishyscapes.main(cfg, jnp.float32, method="entropy")
    assert set(result) == {"AP", "AUROC", "FPR95", "n_images"}
    assert 0.0 <= result["AP"] <= 1.0
    assert result["n_images"] == 2


def test_main_deeplab_voc(tmp_path):
    """VOC dataset wired through the DeepLab trainer."""
    from open_world_semantic_segmentation_tpu.cli import main_deeplab

    root = _make_voc(str(tmp_path), n=3, h=40, w=56)
    # train_aug list: reuse train ids with SegmentationClassAug dir
    import shutil
    voc = os.path.join(root, "VOCdevkit", "VOC2012")
    shutil.copytree(os.path.join(voc, "SegmentationClass"),
                    os.path.join(voc, "SegmentationClassAug"))
    for dst in ("train_aug.txt", "val.txt"):
        shutil.copy(
            os.path.join(voc, "ImageSets", "Segmentation", "train.txt"),
            os.path.join(voc, "ImageSets", "Segmentation", dst))

    cfg = Config()
    cfg.DIR = str(tmp_path / "voc_ckpt")
    cfg.DATASET.root_dataset = root
    cfg.DEEPLAB.model = "deeplabv3plus_mobilenet"
    cfg.DEEPLAB.dataset = "voc"
    cfg.DEEPLAB.num_classes = 21
    cfg.DEEPLAB.crop_size = 33
    cfg.DEEPLAB.batch_size = 2
    cfg.DEEPLAB.total_itrs = 2
    cfg.DEEPLAB.val_interval = 2
    state = main_deeplab.main(cfg, jnp.float32, max_steps=2)
    assert int(state.step) == 2


@pytest.mark.parametrize("exclude_back", [False, True])
def test_rec_combine_matches_reference_formula(exclude_back):
    """Oracle: torch transliteration of the reference rec branch
    (anomaly/eval_ood_rec.py:95-150) vs cli.eval_ood_rec.rec_combine —
    per-scale ft resize-to-segSize/4 averaging, normalize+cosine at
    feature res, cosine upsample to segSize, bare-max MSP (no second
    softmax), full-resolution select at t=0.999."""
    import torch
    import torch.nn.functional as F

    from open_world_semantic_segmentation_tpu.cli.eval_ood_rec import (
        rec_combine,
    )

    rng = np.random.default_rng(42)
    seg_size = (32, 48)
    K, C = 5, 16
    ft_shapes = [(8, 12), (6, 9), (4, 6)]
    n = len(ft_shapes)

    # per-scale softmaxed score maps at segSize (use_softmax=True decoder)
    raw = [rng.standard_normal((1, K, *seg_size)).astype(np.float32) * 4
           for _ in range(n)]
    scores_nchw = [torch.softmax(torch.from_numpy(r), dim=1) for r in raw]
    ft_o_nchw = [torch.from_numpy(
        rng.standard_normal((1, C, h, w)).astype(np.float32))
        for h, w in ft_shapes]
    ft_r_nchw = [torch.from_numpy(
        rng.standard_normal((1, C, h, w)).astype(np.float32))
        for h, w in ft_shapes]

    # ---- reference transliteration (eval_ood_rec.py:95-150) ----
    scores = torch.zeros(1, K, *seg_size)
    ft1 = torch.zeros(1, C, int(seg_size[0] / 4), int(seg_size[1] / 4))
    ft2 = torch.zeros_like(ft1)
    for s in scores_nchw:
        scores = scores + s / n
    for f in ft_o_nchw:
        ft1 = ft1 + F.interpolate(f, size=ft1.shape[2:], mode="bilinear",
                                  align_corners=False) / n
    for f in ft_r_nchw:
        ft2 = ft2 + F.interpolate(f, size=ft2.shape[2:], mode="bilinear",
                                  align_corners=False) / n
    tmp_scores = scores[:, 1:] if exclude_back else scores
    msp, _ = torch.max(tmp_scores, dim=1)
    msp = msp.squeeze(0)
    ft1 = F.normalize(ft1, dim=1)
    ft2 = F.normalize(ft2, dim=1)
    ft_dist = F.cosine_similarity(ft1, ft2, dim=1).unsqueeze(1)
    ft_dist = F.interpolate(ft_dist, size=seg_size, mode="bilinear",
                            align_corners=False)[0, 0]
    t = 0.999
    conf_ref = msp * (msp > t).float() + ft_dist * (msp <= t).float()
    _, pred_ref = torch.max(scores, dim=1)

    # ---- repo path (NHWC) ----
    to_nhwc = lambda x: jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    conf, pred = rec_combine([to_nhwc(s) for s in scores_nchw],
                             [to_nhwc(f) for f in ft_o_nchw],
                             [to_nhwc(f) for f in ft_r_nchw],
                             seg_size, exclude_back)

    np.testing.assert_allclose(np.asarray(conf), conf_ref.numpy(),
                               atol=2e-6, rtol=1e-5)
    assert (np.asarray(pred) == pred_ref.squeeze(0).numpy()).all()


# ---------------------------------------------------------------------------
# t-SNE prototype plot tool (the reference's commented block,
# test_embedding.py:291-324, as an explicit tool)
# ---------------------------------------------------------------------------

def test_plot_prototypes_tool(tmp_path):
    import json

    import plot_prototypes as pp

    # center rows: one-hot * 3 with the 13-15 -> 16-18 display-label shift
    centers, labels = pp.build_center_rows(16, 3.0)
    assert centers.shape == (16, 16) and centers.max() == 3.0
    assert list(labels[:13]) == list(range(13))
    assert list(labels[13:]) == [16, 17, 18]

    rng = np.random.default_rng(0)
    # flat (single-class) format
    flat = str(tmp_path / "flat.json")
    with open(flat, "w") as f:
        json.dump(rng.normal(size=(4, 16)).tolist(), f)
    pts, pls = pp.load_prototype_points(flat, 16)
    assert pts.shape == (4, 16) and (pls == 16).all()

    # per-class list format (prototype_ood.json layout)
    nested = str(tmp_path / "nested.json")
    with open(nested, "w") as f:
        json.dump([rng.normal(size=(3, 16)).tolist(), [],
                   rng.normal(size=(2, 16)).tolist()], f)
    pts2, pls2 = pp.load_prototype_points(nested, 16)
    assert pts2.shape == (5, 16)
    assert (pls2 == np.array([0, 0, 0, 2, 2])).all()

    out = pp.main([flat, "--out", str(tmp_path / "imgs" / "tsne.jpg"),
                   "--perplexity", "5"])
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_inspect_results_tool(tmp_path):
    """tools/inspect_results.py: the Read_img.py equivalent (artifacts
    stats + contact sheet, per-class histograms from JSON and calib npz)."""
    import json

    from PIL import Image

    import inspect_results as ir

    d = tmp_path / "res"
    d.mkdir()
    Image.fromarray(
        (np.arange(32 * 96 * 3) % 255).astype(np.uint8).reshape(
            32, 96, 3)).save(d / "grid.png")
    np.save(d / "dis_sum.npy", np.linspace(0, 1, 64).reshape(8, 8))
    entries = ir.inspect_artifacts(str(d), out=str(tmp_path / "sheet.png"))
    assert {n for n, _, _ in entries} == {"grid.png", "dis_sum.npy"}
    assert (tmp_path / "sheet.png").stat().st_size > 0

    # logit_dict.json layout (list-of-lists, anomaly/Read_img.py:36-43)
    j = tmp_path / "logit_dict.json"
    j.write_text(json.dumps([[0.1, 0.2, 0.4], [1.0, 2.0]]))
    s = ir.inspect_hist(str(j), out=str(tmp_path / "h.png"))
    assert s[0].size == 3 and s[1].size == 2
    assert (tmp_path / "h.png").stat().st_size > 0

    # ScoreCalibration npz layout (samples_<cl> arrays)
    np.savez(tmp_path / "calib.npz",
             samples_0=np.sort(np.linspace(-1, 1, 5)),
             samples_1=np.asarray([0.5]),
             thresholds=np.zeros(2))
    s2 = ir.inspect_hist(str(tmp_path / "calib.npz"))
    assert set(s2) == {0, 1} and s2[0].size == 5
