"""Activation parity vs the reference implementation (used as a test oracle).

The reference repo at /root/reference is imported read-only to build the
torch models on CPU with random weights; those weights are converted with
train/convert.py and the Flax forward must reproduce the torch forward.
This validates backbone topology, dilation plan, PPM bin edges, bilinear
upsampling and the distance head end-to-end.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open_world_semantic_segmentation_tpu.models import (  # noqa: E402
    ModelBuilder,
    deeplabv3plus_resnet50,
)
from open_world_semantic_segmentation_tpu.train.convert import (  # noqa: E402
    convert_segmentation_model,
    convert_deeplab_checkpoint,
)


def _stub_torchvision():
    """torchvision is not installed; the reference imports it (for unused
    pretrained-download helpers). Provide a minimal stub."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvu = types.ModuleType("torchvision.models.utils")

    def _no_url(*a, **k):
        raise RuntimeError("no downloads in tests")

    tvu.load_state_dict_from_url = _no_url
    tv.models = tvm
    tvm.utils = tvu
    tvt = types.ModuleType("torchvision.transforms")
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.utils"] = tvu
    sys.modules["torchvision.transforms"] = tvt


@pytest.fixture(scope="module", autouse=True)
def _cpu_cuda_shim():
    """Reference code calls .cuda() unconditionally; run it on CPU."""
    orig_t = torch.Tensor.cuda
    orig_m = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig_t
    torch.nn.Module.cuda = orig_m


def _np_state_dict(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def anomaly_models():
    _stub_torchvision()
    sys.path.insert(0, os.path.join(REF, "anomaly"))
    try:
        from models import models as ref_models  # noqa
        from models import resnet as ref_resnet  # noqa
        torch.manual_seed(0)
        # bypass ModelBuilder.build_encoder: pretrained weights would require
        # a download (no egress); random init is fine for parity
        orig = ref_resnet.resnet50(pretrained=False)
        enc = ref_models.ResnetDilated(orig, dilate_scale=8)
        dec = ref_models.ModelBuilder.build_decoder(
            "ppm_deepsup_embedding", fc_dim=2048, num_class=13,
            use_softmax=True)
    except Exception as e:
        pytest.skip(f"cannot build reference model: {e}")
    enc.eval()
    dec.eval()
    return enc, dec


def test_streethazards_embedding_forward_parity(anomaly_models):
    enc_t, dec_t = anomaly_models
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    seg_size = (56, 56)

    with torch.no_grad():
        conv_out = enc_t(torch.from_numpy(x), return_feature_maps=True)
        scores_t, ft_t = dec_t(conv_out, segSize=seg_size, output_ft=True)
    scores_t = scores_t.numpy().transpose(0, 2, 3, 1)
    ft_t = ft_t.numpy().transpose(0, 2, 3, 1)

    variables = convert_segmentation_model(
        _np_state_dict(enc_t), _np_state_dict(dec_t))
    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13)
    out = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      seg_size=seg_size)

    got_scores = np.asarray(out["scores"])
    got_ft = np.asarray(out["ft"])
    # distance logits are O(1e2-1e3) at random init; compare relative
    scale = np.abs(scores_t).max()
    np.testing.assert_allclose(got_scores / scale, scores_t / scale,
                               atol=2e-5)
    scale_ft = np.abs(ft_t).max()
    np.testing.assert_allclose(got_ft / scale_ft, ft_t / scale_ft, atol=2e-5)
    # argmax (prediction) parity
    np.testing.assert_array_equal(got_scores.argmax(-1), scores_t.argmax(-1))


@pytest.fixture(scope="module")
def deeplab_network():
    _stub_torchvision()
    sys.path.insert(0, os.path.join(REF, "DeepLabV3Plus-Pytorch"))
    try:
        import network as torch_network  # noqa
    except Exception as e:
        pytest.skip(f"cannot import reference DeepLab network: {e}")
    return torch_network


def test_deeplabv3plus_resnet50_forward_parity(deeplab_network):
    torch.manual_seed(1)
    model_t = deeplab_network.deeplabv3plus_resnet50(
        num_classes=19, output_stride=16, pretrained_backbone=False)
    model_t.eval()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 65, 63)).astype(np.float32)
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    variables = convert_deeplab_checkpoint(_np_state_dict(model_t))
    model = deeplabv3plus_resnet50(num_classes=19, output_stride=16)
    got = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))

    scale = np.abs(out_t).max()
    np.testing.assert_allclose(got / scale, out_t / scale, atol=2e-5)
    np.testing.assert_array_equal(got.argmax(-1), out_t.argmax(-1))


def test_deeplabv3plus_mobilenet_forward_parity(deeplab_network):
    torch.manual_seed(2)
    model_t = deeplab_network.deeplabv3plus_mobilenet(
        num_classes=19, output_stride=16, pretrained_backbone=False)
    model_t.eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    from open_world_semantic_segmentation_tpu.models import (
        deeplabv3plus_mobilenet,
    )
    from open_world_semantic_segmentation_tpu.train.convert import (
        convert_mobilenet_deeplab_checkpoint,
    )

    variables = convert_mobilenet_deeplab_checkpoint(_np_state_dict(model_t))
    model = deeplabv3plus_mobilenet(num_classes=19, output_stride=16)
    got = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = np.abs(out_t).max()
    np.testing.assert_allclose(got / scale, out_t / scale, atol=2e-5)
    np.testing.assert_array_equal(got.argmax(-1), out_t.argmax(-1))


def test_deeplabv3plus_resnet50_os8_parity(deeplab_network):
    torch.manual_seed(3)
    model_t = deeplab_network.deeplabv3plus_resnet50(
        num_classes=19, output_stride=8, pretrained_backbone=False)
    model_t.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    from open_world_semantic_segmentation_tpu.models import (
        deeplabv3plus_resnet50,
    )

    variables = convert_deeplab_checkpoint(_np_state_dict(model_t))
    model = deeplabv3plus_resnet50(num_classes=19, output_stride=8)
    got = np.asarray(model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    scale = np.abs(out_t).max()
    np.testing.assert_allclose(got / scale, out_t / scale, atol=2e-5)
    np.testing.assert_array_equal(got.argmax(-1), out_t.argmax(-1))


def test_test_deeplab_loads_reference_pth(deeplab_network, tmp_path):
    """The eval-only driver ingests a reference-format .pth directly
    (test.py --ckpt surface): torch deeplabv3plus_mobilenet state_dict ->
    cli.test_deeplab -> StreamSegMetrics results."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from make_synthetic_data import make_cityscapes

    from open_world_semantic_segmentation_tpu.cli import test_deeplab
    from open_world_semantic_segmentation_tpu.core.config import Config

    torch.manual_seed(4)
    model_t = deeplab_network.deeplabv3plus_mobilenet(
        num_classes=16, output_stride=16, pretrained_backbone=False)
    pth = str(tmp_path / "best_deeplabv3plus_mobilenet_cityscapes.pth")
    torch.save({"model_state": model_t.state_dict()}, pth)

    cs_root = make_cityscapes(str(tmp_path / "cs"), n=2, h=64, w=96)
    cfg = Config()
    cfg.DIR = str(tmp_path / "out")
    cfg.DATASET.root_dataset = cs_root
    cfg.DEEPLAB.model = "deeplabv3plus_mobilenet"
    cfg.DEEPLAB.num_classes = 16
    cfg.DEEPLAB.crop_size = 32
    cfg.DEEPLAB.ckpt = pth
    cfg.DEEPLAB.unknown_scores = True
    score, _ = test_deeplab.main(cfg, jnp.float32, max_images=1)
    assert 0.0 <= score["Mean IoU"] <= 1.0


def test_convert_checkpoint_cli_roundtrip(anomaly_models, tmp_path):
    """The CLI converter ingests real torch .pth files and produces a
    checkpoint the eval driver can load."""
    enc_t, dec_t = anomaly_models
    enc_pth = str(tmp_path / "encoder_epoch_20.pth")
    dec_pth = str(tmp_path / "decoder_epoch_20.pth")
    torch.save(enc_t.state_dict(), enc_pth)
    torch.save(dec_t.state_dict(), dec_pth)

    from open_world_semantic_segmentation_tpu.cli import convert_checkpoint

    out = str(tmp_path / "model.pkl")
    convert_checkpoint.main(["anomaly", "--encoder", enc_pth,
                             "--decoder", dec_pth, "--out", out])
    assert os.path.exists(out)

    from open_world_semantic_segmentation_tpu.train import load_checkpoint

    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    target = model.init(jax.random.PRNGKey(0), x)
    variables, meta = load_checkpoint(out, target=target)
    assert meta["source"] == [enc_pth, dec_pth]
    out_scores = model.apply(variables, x, seg_size=(32, 32))["scores"]
    assert np.isfinite(np.asarray(out_scores)).all()
