"""SPMD semantics tests on the 8-fake-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.parallel import (
    make_mesh,
    make_mesh_for_batch,
    data_sharding,
    replicate,
    shard_batch,
    shard_index_space,
)

pytestmark = pytest.mark.e2e


def test_make_mesh_for_batch_divisibility():
    assert make_mesh_for_batch(16).devices.size == 8
    assert make_mesh_for_batch(6).devices.size == 6
    assert make_mesh_for_batch(5).devices.size == 5
    assert make_mesh_for_batch(1).devices.size == 1


def test_shard_index_space_partitions_everything():
    parts = [shard_index_space(103, 4, h, shuffle_seed=7) for h in range(4)]
    allidx = np.concatenate(parts)
    # every sample appears (padding duplicates a few)
    assert set(allidx.tolist()) == set(range(103))
    assert all(len(p) == 26 for p in parts)
    # deterministic across "hosts"
    again = shard_index_space(103, 4, 2, shuffle_seed=7)
    np.testing.assert_array_equal(parts[2], again)


def test_global_batch_bn_matches_single_device():
    """The SyncBN replacement claim: BN batch statistics under a batch
    sharded over 8 devices equal the single-device global-batch statistics
    (XLA reduces over the logical batch axis)."""
    from flax import linen as nn

    class TinyBN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=False, momentum=0.9,
                                name="bn")(x)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 4, 4, 3)).astype(np.float32)
    model = TinyBN()
    variables = model.init(jax.random.PRNGKey(0), x)

    # single device
    y_ref, mut_ref = model.apply(variables, jnp.asarray(x),
                                 mutable=["batch_stats"])

    # sharded over the 8-device mesh
    mesh = make_mesh(8)
    xs = jax.device_put(x, data_sharding(mesh))
    vs = replicate(variables, mesh)
    fn = jax.jit(lambda v, a: model.apply(v, a, mutable=["batch_stats"]))
    y_sh, mut_sh = fn(vs, xs)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut_sh["batch_stats"]["bn"]["mean"]),
        np.asarray(mut_ref["batch_stats"]["bn"]["mean"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut_sh["batch_stats"]["bn"]["var"]),
        np.asarray(mut_ref["batch_stats"]["bn"]["var"]), rtol=1e-5)


def test_sharded_eval_matches_per_image():
    """Streaming-inference sharding (BASELINE config #5): a batch of images
    split over the mesh produces identical predictions to per-image eval."""
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    mesh = make_mesh(8)
    xs = jax.device_put(x, data_sharding(mesh))
    vs = replicate(variables, mesh)

    @jax.jit
    def fwd(v, a):
        out = model.apply(v, a, seg_size=(32, 32))
        return jnp.argmax(out["scores"], axis=-1)

    preds_sharded = np.asarray(fwd(vs, xs))
    preds_single = np.asarray(fwd(variables, jnp.asarray(x)))
    np.testing.assert_array_equal(preds_sharded, preds_single)


def test_sharded_int8_eval_matches_single_device():
    """int8 PTQ composes with SPMD: a data-sharded int8 eval produces the
    same predictions as the unsharded int8 program (s8xs8->s32 convs under
    GSPMD)."""
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.ops.quant import (
        calibrate, prequantize)

    kw = dict(num_class=13, fc_dim=512)
    m_off = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", **kw)
    m_cal = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="calib", **kw)
    m_q = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", quant="int8", **kw)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
    variables = m_off.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    v_q = prequantize(calibrate(m_cal, dict(variables), [x[:1]],
                                seg_size=(32, 32)))

    mesh = make_mesh(8)
    xs = jax.device_put(x, data_sharding(mesh))
    vqs = replicate(v_q, mesh)

    @jax.jit
    def fwd(v, a):
        out = m_q.apply(v, a, seg_size=(32, 32))
        return jnp.argmax(out["scores"], axis=-1)

    preds_sharded = np.asarray(fwd(vqs, xs))
    preds_single = np.asarray(fwd(v_q, jnp.asarray(x)))
    np.testing.assert_array_equal(preds_sharded, preds_single)


def test_shard_batch_layout():
    mesh = make_mesh(8)
    batch = {"a": np.zeros((16, 3)), "b": np.ones((16,))}
    sb = shard_batch(batch, mesh)
    assert sb["a"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_flagship_sharded_hlo_communication_guard():
    """Regression guard on the 8-device flagship programs' communication
    pattern (VERDICT r3 #3). Round 3's multichip unblock (commit ea4a7c1)
    replaced the cumsum/concat adaptive-pooling lowering — whose GSPMD
    partitioning emitted all-to-alls — with the matmul formulation
    (ops/pool.py). ``dryrun_multichip`` only proves the program RUNS; this
    test inspects the optimized HLO of both the train and eval steps and
    fails if the regression ships again:

    - no ``all-to-all`` anywhere;
    - no host transfers inside the step (``is_host_transfer``/infeed/
      outfeed) — the program is device-only;
    - gradients/BN statistics reduce via ``all-reduce`` (present in train;
      eval of a replicated model on data-sharded input needs NO
      collectives at all).
    """
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        dissum_conf)
    from open_world_semantic_segmentation_tpu.train import (
        TrainState,
        make_anomaly_train_step,
        poly_schedule,
        two_group_optimizer,
    )

    mesh = make_mesh(8)
    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13,
        train=True)
    img = jnp.zeros((8, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    tx = two_group_optimizer(
        variables["params"],
        lr_encoder=poly_schedule(0.02, 100),
        lr_decoder=poly_schedule(0.02, 100),
        momentum=0.9, weight_decay=1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    state = replicate(state, mesh)
    batch = shard_batch(
        {"img_data": np.zeros((8, 64, 64, 3), np.float32),
         "seg_label": np.zeros((8, 8, 8), np.int32)}, mesh)

    step = make_anomaly_train_step(model)
    train_txt = step.lower(state, batch).compile().as_text()

    eval_model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13,
        train=False, use_softmax=True)
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}

    def eval_fn(v, a):
        out = eval_model.apply(v, a, seg_size=(64, 64))
        scores = out["scores"]
        return jax.vmap(dissum_conf)(scores), jnp.argmax(scores, axis=-1)

    eval_txt = jax.jit(eval_fn).lower(
        eval_vars, batch["img_data"]).compile().as_text()

    for name, txt in (("train", train_txt), ("eval", eval_txt)):
        assert "all-to-all" not in txt, (
            f"{name} step: GSPMD re-introduced an all-to-all — the "
            "adaptive-pooling lowering likely reverted to cumsum/concat "
            "(see ops/pool.py and commit ea4a7c1)")
        assert "is_host_transfer=true" not in txt, (
            f"{name} step contains a host transfer")
        assert "infeed" not in txt and "outfeed" not in txt, (
            f"{name} step contains infeed/outfeed")
    assert "all-reduce" in train_txt, (
        "train step lost its gradient/BN all-reduce — the batch is no "
        "longer reduced over the data axis")


def test_deeplab_sharded_hlo_communication_guard():
    """The DeepLab-side counterpart of the flagship guard: the round-4
    default dataflows (shift+matmul dilated ASPP convs, projection-sum
    ASPP — ops/dilated.py, models/deeplab.py) must stay GSPMD-clean on
    the 8-device data mesh. The nine shifted dot_generals and the
    interpolation-matmul resize are exactly the kind of op whose naive
    lowering (gather / concat over a sharded axis) would emit
    all-to-alls; this fails if a dataflow change regresses that."""
    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet50)
    from open_world_semantic_segmentation_tpu.train import (
        TrainState, make_deeplab_train_step)
    from open_world_semantic_segmentation_tpu.train.optim import torch_sgd

    mesh = make_mesh(8)
    model = deeplabv3plus_embedding_resnet50(num_classes=16, train=True)
    img = jnp.zeros((8, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    tx = torch_sgd(lambda s: 0.01, 0.9, 1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    state = replicate(state, mesh)
    batch = shard_batch(
        {"image": np.zeros((8, 64, 64, 3), np.float32),
         "label": np.zeros((8, 64, 64), np.int32)}, mesh)

    step = make_deeplab_train_step(model)
    train_txt = step.lower(state, batch).compile().as_text()

    eval_model = deeplabv3plus_embedding_resnet50(num_classes=16)
    eval_vars = {"params": state.params, "batch_stats": state.batch_stats}

    def eval_fn(v, a):
        logits = eval_model.apply(v, a)[0]
        return jnp.argmax(logits, axis=-1)

    eval_txt = jax.jit(eval_fn).lower(
        eval_vars, batch["image"]).compile().as_text()

    for name, txt in (("train", train_txt), ("eval", eval_txt)):
        assert "all-to-all" not in txt, (
            f"deeplab {name} step: GSPMD emitted an all-to-all — a "
            "default dataflow (shift dilated / ASPP projection / resize "
            "matmul) stopped partitioning cleanly")
        assert "is_host_transfer=true" not in txt, (
            f"deeplab {name} step contains a host transfer")
        assert "infeed" not in txt and "outfeed" not in txt, (
            f"deeplab {name} step contains infeed/outfeed")
    assert "all-reduce" in train_txt, (
        "deeplab train step lost its gradient/BN all-reduce")


def test_spatially_sharded_eval_matches_single_device():
    """Width-sharded full-res eval (2-D mesh): XLA's GSPMD inserts conv
    halo exchanges; predictions must be identical to unsharded."""
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.parallel.mesh import (
        make_spatial_mesh, spatial_sharding)

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 32, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    mesh = make_spatial_mesh(n_spatial=4, n_data=2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    vs = replicate(variables, mesh)

    @jax.jit
    def fwd(v, a):
        out = model.apply(v, a, seg_size=(32, 64))
        return jnp.argmax(out["scores"], axis=-1), out["scores"]

    preds_sh, scores_sh = fwd(vs, xs)
    preds_1, scores_1 = fwd(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(scores_sh), np.asarray(scores_1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(preds_sh), np.asarray(preds_1))
