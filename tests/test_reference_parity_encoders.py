"""Activation parity for the secondary encoders/decoders vs the reference.

Same oracle scheme as test_reference_parity.py: build the torch module from
/root/reference on CPU with random weights, convert, compare forwards.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_reference_parity import _stub_torchvision, _np_state_dict  # noqa

from open_world_semantic_segmentation_tpu.models import (  # noqa: E402
    ModelBuilder,
    hrnetv2,
    resnext101,
)
from open_world_semantic_segmentation_tpu.models.mobilenet import (  # noqa
    MobileNetV2Dilated,
)
from open_world_semantic_segmentation_tpu.train import convert as tc  # noqa


@pytest.fixture(scope="module", autouse=True)
def _cpu_cuda_shim():
    orig_t = torch.Tensor.cuda
    orig_m = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig_t
    torch.nn.Module.cuda = orig_m


@pytest.fixture(scope="module")
def ref_anomaly():
    _stub_torchvision()
    sys.path.insert(0, os.path.join(REF, "anomaly"))
    try:
        from models import models as ref_models  # noqa
        from models import resnet as ref_resnet  # noqa
        from models import resnext as ref_resnext  # noqa
        from models import mobilenet as ref_mobilenet  # noqa
        from models import hrnet as ref_hrnet  # noqa
    except Exception as e:
        pytest.skip(f"cannot import reference models: {e}")
    return {
        "models": ref_models, "resnet": ref_resnet, "resnext": ref_resnext,
        "mobilenet": ref_mobilenet, "hrnet": ref_hrnet,
    }


def _cmp(got, want, atol=3e-5):
    scale = max(np.abs(want).max(), 1e-6)
    np.testing.assert_allclose(got / scale, want / scale, atol=atol)


def test_resnext101_encoder_parity(ref_anomaly):
    torch.manual_seed(10)
    orig = ref_anomaly["resnext"].resnext101(pretrained=False)
    enc_t = ref_anomaly["models"].Resnet(orig)
    enc_t.eval()
    rng = np.random.default_rng(10)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = enc_t(torch.from_numpy(x), return_feature_maps=True)

    variables = tc.convert_csail_encoder(_np_state_dict(enc_t))
    enc = resnext101()
    outs = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for got, want in zip(outs, outs_t):
        _cmp(np.asarray(got), want.numpy().transpose(0, 2, 3, 1))


def test_csail_mobilenet_dilated_parity(ref_anomaly):
    torch.manual_seed(11)
    orig = ref_anomaly["mobilenet"].mobilenetv2(pretrained=False)
    enc_t = ref_anomaly["models"].MobileNetV2Dilated(orig, dilate_scale=8)
    enc_t.eval()
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = enc_t(torch.from_numpy(x), return_feature_maps=True)

    variables = tc.convert_csail_mobilenet_encoder(_np_state_dict(enc_t))
    enc = MobileNetV2Dilated(output_stride=8)
    outs = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs) == len(outs_t)
    for got, want in zip(outs, outs_t):
        _cmp(np.asarray(got), want.numpy().transpose(0, 2, 3, 1))


def test_hrnetv2_encoder_parity(ref_anomaly):
    torch.manual_seed(12)
    enc_t = ref_anomaly["hrnet"].hrnetv2(pretrained=False)
    enc_t.eval()
    rng = np.random.default_rng(12)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_t = enc_t(torch.from_numpy(x), return_feature_maps=True)

    variables = tc.convert_hrnet_encoder(_np_state_dict(enc_t))
    enc = hrnetv2()
    outs = enc.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(np.asarray(outs[-1]), outs_t[-1].numpy().transpose(0, 2, 3, 1))


@pytest.mark.parametrize("arch,softmaxed", [
    ("c1", True), ("c1_deepsup", True), ("ppm", True), ("ppm_deepsup", False),
])
def test_decoder_parity(ref_anomaly, arch, softmaxed):
    """Decoders fed identical random conv_out feature pyramids."""
    torch.manual_seed(13)
    dec_t = ref_anomaly["models"].ModelBuilder.build_decoder(
        arch, fc_dim=2048, num_class=13, use_softmax=True)
    dec_t.eval()
    rng = np.random.default_rng(13)
    conv_out_np = [
        rng.standard_normal((1, 256, 16, 16)).astype(np.float32),
        rng.standard_normal((1, 512, 8, 8)).astype(np.float32),
        rng.standard_normal((1, 1024, 8, 8)).astype(np.float32),
        rng.standard_normal((1, 2048, 8, 8)).astype(np.float32),
    ]
    seg_size = (32, 32)
    with torch.no_grad():
        out_t = dec_t([torch.from_numpy(a) for a in conv_out_np],
                      segSize=seg_size)
    if isinstance(out_t, tuple):
        out_t = out_t[0]
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    variables = tc.convert_decoder(_np_state_dict(dec_t))
    dec = ModelBuilder.build_decoder(arch, fc_dim=2048, num_class=13,
                                     use_softmax=True)
    out = dec.apply(variables,
                    [jnp.asarray(a.transpose(0, 2, 3, 1))
                     for a in conv_out_np], seg_size=seg_size)
    got = np.asarray(out["scores"])
    _cmp(got, out_t)
    np.testing.assert_array_equal(got.argmax(-1), out_t.argmax(-1))


@pytest.mark.parametrize("arch", ["upernet_lite", "upernet"])
def test_upernet_decoder_parity(ref_anomaly, arch):
    torch.manual_seed(14)
    dec_t = ref_anomaly["models"].ModelBuilder.build_decoder(
        arch, fc_dim=2048, num_class=13, use_softmax=True)
    dec_t.eval()
    rng = np.random.default_rng(14)
    conv_out_np = [
        rng.standard_normal((1, 256, 16, 16)).astype(np.float32),
        rng.standard_normal((1, 512, 8, 8)).astype(np.float32),
        rng.standard_normal((1, 1024, 8, 8)).astype(np.float32),
        rng.standard_normal((1, 2048, 8, 8)).astype(np.float32),
    ]
    seg_size = (32, 32)
    with torch.no_grad():
        out_t = dec_t([torch.from_numpy(a) for a in conv_out_np],
                      segSize=seg_size)
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    variables = tc.convert_decoder(_np_state_dict(dec_t))
    dec = ModelBuilder.build_decoder(arch, fc_dim=2048, num_class=13,
                                     use_softmax=True)
    out = dec.apply(variables,
                    [jnp.asarray(a.transpose(0, 2, 3, 1))
                     for a in conv_out_np], seg_size=seg_size)
    got = np.asarray(out["scores"])
    _cmp(got, out_t)
    np.testing.assert_array_equal(got.argmax(-1), out_t.argmax(-1))
