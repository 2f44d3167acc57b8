"""Shape and structure smoke tests for every backbone/decoder family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_world_semantic_segmentation_tpu.models import (
    ModelBuilder,
    SegmentationModel,
    deeplabv3plus_resnet101,
    deeplabv3plus_embedding_resnet101,
    deeplabv3plus_embedding_mobilenet,
    deeplabv3plus_embedding_self_distillation_resnet101,
    deeplabv3plus_mobilenet,
    hrnetv2,
    resnext101,
)
from open_world_semantic_segmentation_tpu.models.mobilenet import (
    MobileNetV2Dilated,
)

pytestmark = pytest.mark.e2e

RNG = jax.random.PRNGKey(0)


def _init_apply(model, x, **kw):
    variables = model.init(RNG, x, **kw)
    return model.apply(variables, x, **kw), variables


def test_resnet34dilated_feature_pyramid():
    # the reference registry lists resnet34/resnet34dilated but raises
    # NotImplementedError (anomaly/models/models.py:148-155); here they
    # fall out of the parameterized ResNet
    enc = ModelBuilder.build_encoder("resnet34dilated")
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = _init_apply(enc, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 8, 8, 256), (1, 8, 8, 512)]


def test_resnet50dilated_feature_pyramid():
    enc = ModelBuilder.build_encoder("resnet50dilated")
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = _init_apply(enc, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 8, 8, 1024), (1, 8, 8, 2048)]


def test_resnet18_os32():
    enc = ModelBuilder.build_encoder("resnet18")
    x = jnp.zeros((1, 64, 64, 3))
    outs, _ = _init_apply(enc, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_ppm_deepsup_embedding_train_and_eval():
    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13)
    x = jnp.zeros((1, 64, 64, 3))
    out, variables = _init_apply(model, x)
    assert out["scores"].shape == (1, 8, 8, 13)
    assert out["deepsup"].shape == (1, 8, 8, 13)
    assert out["ft"].shape == (1, 8, 8, 4096)     # PPM concat 2048+4*512
    assert out["embedding"].shape == (1, 8, 8, 13)
    # inference: scores + ft upsampled to seg_size
    ev = model.apply(variables, x, seg_size=(48, 64))
    assert ev["scores"].shape == (1, 48, 64, 13)
    assert ev["ft"].shape == (1, 48, 64, 13)      # pre-distance embedding
    # distance logits are <= 0 modulo fp error only when embedding==centers;
    # generally scores are negative squared distances -> bounded above by 0
    assert float(jnp.max(ev["scores"])) <= 1e-3


@pytest.mark.parametrize("arch", ["c1", "c1_deepsup", "ppm", "ppm_deepsup",
                                  "upernet_lite"])
def test_other_decoders(arch):
    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", arch, num_class=13, use_softmax=True)
    x = jnp.zeros((1, 64, 64, 3))
    out, variables = _init_apply(model, x)
    assert out["scores"].shape[-1] == 13
    ev = model.apply(variables, x, seg_size=(32, 32))
    assert ev["scores"].shape == (1, 32, 32, 13)
    if arch in ("c1", "c1_deepsup", "ppm", "upernet_lite"):
        # softmax applied at inference -> rows sum to 1
        s = np.asarray(ev["scores"]).sum(-1)
        np.testing.assert_allclose(s, 1.0, rtol=1e-5)


def test_deeplabv3plus_resnet101_shapes():
    model = deeplabv3plus_resnet101(num_classes=19, output_stride=16)
    x = jnp.zeros((1, 65, 63, 3))  # odd size: upsample back to input exactly
    out, _ = _init_apply(model, x)
    assert out.shape == (1, 65, 63, 19)


def test_deeplab_embedding_outputs():
    model = deeplabv3plus_embedding_resnet101(num_classes=16)
    x = jnp.zeros((1, 64, 64, 3))
    (logits, centers, features), _ = _init_apply(model, x)
    assert logits.shape == (1, 64, 64, 16)
    assert centers.shape == (16, 16)
    assert features.shape == (1, 64, 64, 16)
    assert float(jnp.max(logits)) <= 1e-3  # negative squared distances


def test_deeplab_embedding_mobilenet_outputs():
    model = deeplabv3plus_embedding_mobilenet(num_classes=16)
    x = jnp.zeros((1, 64, 64, 3))
    (logits, centers, features), _ = _init_apply(model, x)
    assert logits.shape == (1, 64, 64, 16)
    assert centers.shape == (16, 16)
    assert features.shape == (1, 64, 64, 16)
    assert float(jnp.max(logits)) <= 1e-3  # negative squared distances


def test_self_distillation_heads():
    model = deeplabv3plus_embedding_self_distillation_resnet101(
        num_classes=16, cls_novel=1)
    x = jnp.zeros((1, 64, 64, 3))
    (logits, centers, features), variables = _init_apply(model, x)
    assert len(logits) == 2
    assert logits[0].shape == (1, 64, 64, 16)
    assert logits[1].shape == (1, 64, 64, 17)
    assert centers[1].shape == (17, 17)
    # the two heads share one backbone
    params = variables["params"]
    assert "backbone" in params and "classifier" in params \
        and "classifier_1" in params


def test_mobilenet_deeplab_and_dilated():
    model = deeplabv3plus_mobilenet(num_classes=19, output_stride=16)
    x = jnp.zeros((1, 64, 64, 3))
    out, _ = _init_apply(model, x)
    assert out.shape == (1, 64, 64, 19)

    enc = MobileNetV2Dilated(output_stride=8)
    outs, _ = _init_apply(enc, jnp.zeros((1, 64, 64, 3)))
    assert outs[-1].shape[-1] == 320
    assert outs[-1].shape[1] == 8  # stride 8


def test_hrnetv2_output():
    enc = hrnetv2()
    outs, _ = _init_apply(enc, jnp.zeros((1, 64, 64, 3)))
    assert outs[-1].shape == (1, 16, 16, 720)  # 48+96+192+384 at stride 4


def test_resnext101_output():
    enc = resnext101()
    outs, _ = _init_apply(enc, jnp.zeros((1, 64, 64, 3)))
    assert outs[-1].shape == (1, 2, 2, 2048)
