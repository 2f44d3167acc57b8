"""Few-shot layer tests: prototypes, NPM override, pseudo-labels, merging."""

import json
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from open_world_semantic_segmentation_tpu.fewshot import (
    extract_prototype,
    average_prototypes,
    load_prototypes,
    save_prototypes,
    npm_override,
    npm_label_remap,
    pseudo_label,
    merge_head_predictions,
)

pytestmark = pytest.mark.e2e


def test_extract_prototype_masked_mean():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    labels = np.zeros((1, 8, 8), np.int32)
    labels[0, :4, :4] = 15  # 25% area of novel class
    proto, valid = extract_prototype(jnp.asarray(f), jnp.asarray(labels), 15)
    want = f[0, :4, :4].reshape(-1, 4).mean(0)
    np.testing.assert_allclose(np.asarray(proto), want, rtol=1e-5)
    assert bool(valid)

    labels2 = np.zeros((1, 8, 8), np.int32)
    labels2[0, 0, 0] = 15  # ~1.6% < 5% threshold
    _, valid2 = extract_prototype(jnp.asarray(f), jnp.asarray(labels2), 15)
    assert not bool(valid2)


def test_extract_prototype_psum_over_mesh():
    """8 fake devices: per-shard masked sums psum to the global mean."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    rng = np.random.default_rng(1)
    f = rng.standard_normal((8, 4, 4, 3)).astype(np.float32)
    labels = (rng.random((8, 4, 4)) < 0.3).astype(np.int32) * 15

    def per_shard(f, l):
        proto, valid = extract_prototype(f, l, 15, axis_name="data")
        return proto, valid

    proto, valid = jax.jit(shard_map(
        per_shard, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P())))(f, labels)
    want = f[labels == 15].mean(0)
    np.testing.assert_allclose(np.asarray(proto), want, rtol=1e-5)


def test_prototype_json_roundtrip(tmp_path):
    protos = [np.arange(16, dtype=np.float32) + i for i in range(5)]
    p = str(tmp_path / "prototype_car_5_shot.json")
    save_prototypes(p, protos)
    avg = load_prototypes(p)
    np.testing.assert_allclose(avg, np.arange(16) + 2.0, rtol=1e-6)
    # file format matches the reference's json list-of-lists
    with open(p) as f:
        raw = json.load(f)
    assert isinstance(raw, list) and len(raw) == 5


def test_npm_override_rule():
    h, w, c = 4, 4, 16
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((h, w, c)).astype(np.float32)
    proto = feats[0, 0]  # pixel (0,0) has distance 0 > -1.5
    logits = np.full((h, w, 16), -50.0, np.float32)
    logits[1, 1] = -0.1  # pixel (1,1): maxlogit -0.1 beats its proto dis
    preds = np.zeros((h, w), np.int64)
    new_preds, dis = npm_override(jnp.asarray(preds), jnp.asarray(feats),
                                  jnp.asarray(logits), jnp.asarray(proto),
                                  novel_id=16)
    new_preds = np.asarray(new_preds)
    assert new_preds[0, 0] == 16  # dis=0 > -1.5 and > -50
    dis_np = np.asarray(dis)
    for i in range(h):
        for j in range(w):
            expect = 16 if (dis_np[i, j] > -1.5
                            and dis_np[i, j] > logits[i, j].max()) else 0
            assert new_preds[i, j] == expect


def test_npm_label_remap():
    labels = np.array([[12, 13, 14, 15, 255]])
    got = np.asarray(npm_label_remap(jnp.asarray(labels)))
    # reference op order (test_embedding.py:448-451): 13 -> -1; >=14 -= 1
    # (so 255 -> 254); -1 -> 16; 254 -> 255 (restores the ignore id)
    np.testing.assert_array_equal(got, [[12, 16, 13, 14, 255]])


def test_pseudo_label_rules():
    labels = np.array([[[0, 255, 3]]])
    base = np.zeros((1, 1, 3, 16), np.float32)
    base[0, 0, 1, 7] = 10.0  # base head predicts 7 at the 255 pixel
    novel = np.zeros((1, 1, 3, 17), np.float32)
    out = np.asarray(pseudo_label(jnp.asarray(labels),
                                  [jnp.asarray(base), jnp.asarray(novel)],
                                  novel_cls=1))
    np.testing.assert_array_equal(out, [[[16, 7, 3]]])


def test_merge_head_predictions_variants():
    base = np.zeros((1, 1, 2, 16), np.float32)
    base[..., 0, 5] = 1.0
    base[..., 1, 9] = 1.0
    novel = np.zeros((1, 1, 2, 17), np.float32)
    novel[..., 0, 16] = 1.0   # novel head claims pixel 0
    novel[..., 1, 2] = 1.0
    plm_all = np.asarray(merge_head_predictions(
        [jnp.asarray(base), jnp.asarray(novel)], variant="plm_all"))
    np.testing.assert_array_equal(plm_all, [[[16, 9]]])
    plm_latest = np.asarray(merge_head_predictions(
        [jnp.asarray(base), jnp.asarray(novel)], variant="plm_latest"))
    np.testing.assert_array_equal(plm_latest, [[[16, 2]]])
