"""AOT export artifacts (core/export.py + cli/export_model.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.core.export import (
    export_eval_fn,
    load_exported,
    save_exported,
)
from open_world_semantic_segmentation_tpu.models import ModelBuilder

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def tiny_model():
    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        fc_dim=512)
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


@pytest.fixture()
def fresh_compiles():
    """Bypass the persistent compilation cache for bitwise-equality tests.

    The suite-wide .jax_cache survives across rounds AND across host
    machines; XLA:CPU AOT results compiled on a host with different
    machine features (cpu_aot_loader warns 'Compile machine features ...
    vs host machine features') produce float results a couple of ulps
    apart from fresh compiles on this host. This test compares the
    artifact execution against a direct apply bit-for-bit, so both sides
    must be compiled by the SAME codegen — fresh, on this machine.
    """
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def test_export_roundtrip_matches_direct_apply(tiny_model, tmp_path,
                                               fresh_compiles):
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        dissum_conf)

    model, variables = tiny_model
    blob = export_eval_fn(model, variables, (32, 48), method="dissum")
    path = str(tmp_path / "m.owss")
    save_exported(path, blob, {"model": "tiny"})

    fn, meta = load_exported(path)
    assert meta["model"] == "tiny"

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    pred, conf = fn(img)
    assert pred.shape == (1, 32, 48) and pred.dtype == jnp.uint8
    assert conf.shape == (1, 32, 48) and conf.dtype == jnp.float16

    # The reference side must be the SAME whole program under jit — an
    # eager op-by-op apply compiles each op separately and its float
    # results can drift a couple of ulps from the fused whole-program
    # codegen (host-dependent; bitwise equality then breaks spuriously).
    @jax.jit
    def ref(img):
        scores = model.apply(variables, img, seg_size=(32, 48))["scores"]
        # the '/ 1' is LOAD-BEARING, not dead code: it mirrors
        # export_pyramid_eval_fn's 'astype(f32) / len(pyramid)'
        # (core/export.py:94) so both jitted programs are structurally
        # identical and the bitwise comparison below stays exact — removing
        # it reintroduces flaky ulp mismatches
        scores = scores.astype(jnp.float32) / 1
        return (jnp.argmax(scores, axis=-1).astype(jnp.uint8),
                jax.vmap(dissum_conf)(scores).astype(jnp.float16))

    want_pred, want_conf = ref(img)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(want_pred))
    np.testing.assert_array_equal(np.asarray(conf), np.asarray(want_conf))


def test_export_labels_only_and_magic_check(tiny_model, tmp_path):
    model, variables = tiny_model
    blob = export_eval_fn(model, variables, (32, 48), method="none")
    path = str(tmp_path / "labels.owss")
    save_exported(path, blob)
    fn, _ = load_exported(path)
    pred = fn(jnp.zeros((1, 32, 48, 3), jnp.float32))
    assert pred.shape == (1, 32, 48)

    bad = str(tmp_path / "junk.owss")
    with open(bad, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError):
        load_exported(bad)


def test_export_int8_artifact_smaller_and_runs(tmp_path):
    """--quant int8 artifacts carry int8 weight constants: ~4x smaller
    serialized payload, loadable and runnable like the fp artifact."""
    from open_world_semantic_segmentation_tpu.cli import export_model
    from open_world_semantic_segmentation_tpu.core.config import Config

    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    out_fp = str(tmp_path / "fp.owss")
    out_q = str(tmp_path / "q.owss")
    export_model.main(cfg, jnp.float32, height=32, width=48, out=out_fp)
    export_model.main(cfg, jnp.float32, height=32, width=48, out=out_q,
                      quant="int8")
    size_fp, size_q = os.path.getsize(out_fp), os.path.getsize(out_q)
    assert size_q < 0.5 * size_fp, f"int8={size_q} fp={size_fp}"

    fn, meta = load_exported(out_q)
    assert meta["quant"] == "int8"
    # random input: a constant image yields spatially-constant scores whose
    # min-max-normalized dissum conf is legitimately NaN (0/0)
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 48, 3)), jnp.float32)
    pred, conf = fn(img)
    assert pred.shape == (1, 32, 48)
    assert np.isfinite(np.asarray(conf, np.float32)).all()


def test_export_pyramid_roundtrip(tiny_model, tmp_path):
    """Full multi-scale pipeline as ONE artifact: per-scale inputs,
    averaged scores, conf+argmax — matches the direct jit computation."""
    from open_world_semantic_segmentation_tpu.core.export import (
        export_pyramid_eval_fn)
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        dissum_conf)

    model, variables = tiny_model
    shapes = [(24, 32), (32, 48), (40, 56)]
    full = (48, 64)
    blob = export_pyramid_eval_fn(model, variables, shapes, full,
                                  method="dissum")
    path = str(tmp_path / "pyr.owss")
    save_exported(path, blob, {"pyramid": True})
    fn, meta = load_exported(path)
    assert meta["pyramid"] is True

    rng = np.random.default_rng(0)
    pyr = [jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
           for h, w in shapes]
    pred, conf = fn(*pyr)
    assert pred.shape == (1, *full) and pred.dtype == jnp.uint8
    assert conf.shape == (1, *full) and conf.dtype == jnp.float16

    scores = None
    for img in pyr:
        s = model.apply(variables, img, seg_size=full)["scores"]
        scores = s if scores is None else scores + s
    scores = scores.astype(jnp.float32) / len(pyr)
    np.testing.assert_array_equal(
        np.asarray(pred), np.argmax(np.asarray(scores), axis=-1))
    # the exported program may reassociate the multi-scale accumulation
    # (different fusion order) -> last-ulp f16 differences in conf
    np.testing.assert_allclose(
        np.asarray(conf, np.float32),
        np.asarray(jax.vmap(dissum_conf)(scores), np.float32),
        atol=2e-3)


def test_export_pyramid_int8_cli(tmp_path):
    """--pyramid --quant int8 through the CLI: 5-scale int8 artifact is
    produced, meta records per-scale input specs, payload beats fp32."""
    from open_world_semantic_segmentation_tpu.cli import export_model
    from open_world_semantic_segmentation_tpu.core.config import Config

    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    cfg.DATASET.imgSizes = (24, 32)
    cfg.DATASET.imgMaxSize = 80
    out_fp = str(tmp_path / "pyr_fp.owss")
    out_q = str(tmp_path / "pyr_q.owss")
    export_model.main(cfg, jnp.float32, height=48, width=64, out=out_fp,
                      pyramid=True)
    export_model.main(cfg, jnp.float32, height=48, width=64, out=out_q,
                      pyramid=True, quant="int8")
    assert os.path.getsize(out_q) < 0.5 * os.path.getsize(out_fp)

    fn, meta = load_exported(out_q)
    assert meta["pyramid"] is True and meta["quant"] == "int8"
    assert len(meta["input"]) == 2  # one spec per imgSizes scale
    pyr = [jnp.zeros(tuple(s), jnp.float32) for s in meta["input"]]
    pred, conf = fn(*pyr)
    assert pred.shape == (1, 48, 64)


def test_export_npm_prototype_as_input(tmp_path):
    """--npm artifact: the few-shot NPM override pipeline with the
    PROTOTYPE as a runtime input — one artifact serves any prototype.
    Matches cli/eval_embedding.py's jitted fwd (test_embedding.py:428-445
    semantics) and carries the auto-stamped versioning metadata."""
    from open_world_semantic_segmentation_tpu import __version__
    from open_world_semantic_segmentation_tpu.cli import export_model
    from open_world_semantic_segmentation_tpu.cli.main_deeplab import (
        build_model)
    from open_world_semantic_segmentation_tpu.core.config import Config
    from open_world_semantic_segmentation_tpu.fewshot import npm_override

    cfg = Config()
    cfg.DEEPLAB.model = "deeplabv3plus_embedding_resnet50"
    cfg.DEEPLAB.num_classes = 16
    out = str(tmp_path / "npm.owss")
    export_model.main(cfg, jnp.float32, height=32, width=48, out=out,
                      npm=True)
    fn, meta = load_exported(out)
    assert meta["npm"] is True and meta["novel_id"] == 16
    assert meta["prototype_dim"] >= 1
    assert meta["format"] == 1 and meta["owss_version"] == __version__
    assert meta["jax_version"] == jax.__version__

    model, _ = build_model(cfg, train=False, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), jnp.float32)
    logits, _, features = model.apply(variables, img)
    feat_dim = features.shape[-1]

    proto = jnp.asarray(rng.standard_normal(feat_dim), jnp.float32)
    pred, dis = fn(img, proto)
    assert pred.shape == (1, 32, 48) and pred.dtype == jnp.uint8
    assert dis.shape == (1, 32, 48) and dis.dtype == jnp.float16

    want, want_dis = npm_override(
        jnp.argmax(logits, axis=-1)[0], features[0], logits[0], proto,
        novel_id=16, dis_threshold=cfg.FEWSHOT.npm_dis_threshold)
    np.testing.assert_array_equal(np.asarray(pred)[0], np.asarray(want))
    np.testing.assert_allclose(np.asarray(dis, np.float32)[0],
                               np.asarray(want_dis, np.float32), rtol=2e-3,
                               atol=2e-3)

    # swapping the prototype re-scores WITHOUT re-exporting: the same
    # artifact matches the oracle for a second prototype too (with random
    # init weights the override mask may stay empty — the distance map is
    # the observable that must track the runtime input)
    proto2 = jnp.asarray(10.0 + rng.standard_normal(feat_dim), jnp.float32)
    pred2, dis2 = fn(img, proto2)
    want2, want_dis2 = npm_override(
        jnp.argmax(logits, axis=-1)[0], features[0], logits[0], proto2,
        novel_id=16, dis_threshold=cfg.FEWSHOT.npm_dis_threshold)
    np.testing.assert_array_equal(np.asarray(pred2)[0], np.asarray(want2))
    np.testing.assert_allclose(np.asarray(dis2, np.float32)[0],
                               np.asarray(want_dis2, np.float32), rtol=2e-3,
                               atol=2e-2)
    assert not np.array_equal(np.asarray(dis), np.asarray(dis2))


def test_artifacts_zoo_list_and_check(tiny_model, tmp_path, capsys):
    """cli/artifacts: header-only manifest scan + full deserialize check
    (schema validation + --run execution on zero inputs)."""
    import json

    from open_world_semantic_segmentation_tpu.cli import artifacts

    model, variables = tiny_model
    blob = export_eval_fn(model, variables, (32, 48), method="msp")
    meta = {"model": "tiny", "input": [1, 32, 48, 3], "method": "msp"}
    save_exported(str(tmp_path / "zoo" / "a.owss"), blob, meta)
    # schema-violating artifact: missing input/method keys
    save_exported(str(tmp_path / "zoo" / "thin.owss"), blob,
                  {"model": "tiny"})
    (tmp_path / "zoo" / "not_artifact.owss").write_bytes(b"garbage")

    rc = artifacts.main(["list", str(tmp_path / "zoo")])
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert rc == 1  # the garbage file is reported loudly
    by_name = {os.path.basename(r["path"]): r for r in rows}
    assert by_name["a.owss"]["model"] == "tiny"
    assert by_name["a.owss"]["format"] == 1
    assert "error" in by_name["not_artifact.owss"]

    # single valid artifact, with zero-input execution
    rc = artifacts.main(["check", str(tmp_path / "zoo" / "a.owss"),
                         "--run"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0 and report["runs_here"] is True
    assert report["valid"] and report["ran_on_zeros"] is True
    assert any("32,48,3" in a.replace(" ", "") for a in report["in_avals"])

    # schema violation is flagged loudly and fails the whole-dir check
    rc = artifacts.main(["check", str(tmp_path / "zoo" / "thin.owss")])
    report = json.loads(capsys.readouterr().out)
    assert rc == 1 and not report["valid"]
    assert any("input" in p for p in report["problems"])


def test_export_cli(tmp_path):
    from open_world_semantic_segmentation_tpu.cli import export_model
    from open_world_semantic_segmentation_tpu.core.config import Config

    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    out = str(tmp_path / "cli.owss")
    export_model.main(cfg, jnp.float32, height=32, width=48, out=out)
    assert os.path.exists(out)
    fn, meta = load_exported(out)
    assert meta["input"] == [1, 32, 48, 3]
    pred, conf = fn(jnp.zeros((1, 32, 48, 3), jnp.float32))
    assert pred.shape == (1, 32, 48)
