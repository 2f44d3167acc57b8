"""Optimizer parity vs torch SGD + train-step integration tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

torch = pytest.importorskip("torch")

from open_world_semantic_segmentation_tpu.train import (
    torch_sgd,
    poly_schedule,
    decay_mask,
    two_group_optimizer,
    backbone_classifier_optimizer,
    TrainState,
    make_anomaly_train_step,
    save_checkpoint,
    load_checkpoint,
)

pytestmark = pytest.mark.e2e


def test_torch_sgd_matches_torch_exactly():
    """SGD(momentum=0.9, wd=1e-4) with poly LR, kernel-vs-bias decay mask."""
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    b0 = rng.standard_normal((3,)).astype(np.float32)

    # torch: two param groups like group_weight (decay for weight only)
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.SGD(
        [{"params": [wt], "weight_decay": 1e-4},
         {"params": [bt], "weight_decay": 0.0}],
        lr=0.02, momentum=0.9)

    sched = poly_schedule(0.02, max_iters=10, power=0.9)
    params = {"layer": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = torch_sgd(sched, momentum=0.9, weight_decay=1e-4)
    opt_state = tx.init(params)

    for step in range(5):
        gw = rng.standard_normal(w0.shape).astype(np.float32)
        gb = rng.standard_normal(b0.shape).astype(np.float32)
        # torch side with the poly lr of this step
        lr = 0.02 * (1 - step / 10) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr
        wt.grad = torch.from_numpy(gw.copy())
        bt.grad = torch.from_numpy(gb.copy())
        opt.step()
        # jax side
        grads = {"layer": {"kernel": jnp.asarray(gw), "bias": jnp.asarray(gb)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["layer"]["kernel"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["layer"]["bias"]),
                               bt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_decay_mask_marks_only_kernels():
    params = {"enc": {"conv": {"kernel": jnp.zeros((3, 3, 1, 2)),
                               "bias": jnp.zeros(2)},
                      "bn": {"scale": jnp.ones(2), "bias": jnp.zeros(2)}}}
    mask = decay_mask(params)
    assert mask["enc"]["conv"]["kernel"] is True
    assert mask["enc"]["conv"]["bias"] is False
    assert mask["enc"]["bn"]["scale"] is False
    assert mask["enc"]["bn"]["bias"] is False


def test_two_group_optimizer_lrs():
    params = {"encoder": {"kernel": jnp.ones((2, 2))},
              "decoder": {"kernel": jnp.ones((2, 2))}}
    tx = two_group_optimizer(params, lr_encoder=1.0, lr_decoder=0.1,
                             momentum=0.0, weight_decay=0.0)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    assert np.allclose(np.asarray(updates["encoder"]["kernel"]), -1.0)
    assert np.allclose(np.asarray(updates["decoder"]["kernel"]), -0.1)


def test_backbone_optimizer_scaling_and_freeze():
    params = {"backbone": {"kernel": jnp.ones((2,))},
              "classifier": {"kernel": jnp.ones((2,))},
              "classifier_1": {"kernel": jnp.ones((2,))}}
    tx = backbone_classifier_optimizer(
        params, lr=1.0, momentum=0.0, weight_decay=0.0,
        frozen_keys=("backbone", "classifier"))
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, st, params)
    assert np.allclose(np.asarray(updates["backbone"]["kernel"]), 0.0)
    assert np.allclose(np.asarray(updates["classifier"]["kernel"]), 0.0)
    assert np.allclose(np.asarray(updates["classifier_1"]["kernel"]), -1.0)


def test_anomaly_train_step_decreases_loss():
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13, train=True)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = torch_sgd(poly_schedule(0.02, 100), momentum=0.9, weight_decay=1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    step = make_anomaly_train_step(model)

    rng = np.random.default_rng(0)
    batch = {
        "img_data": jnp.asarray(
            rng.standard_normal((2, 32, 32, 3)).astype(np.float32)),
        "seg_label": jnp.asarray(rng.integers(-1, 13, (2, 4, 4))),
    }
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_anomaly_train_step_bf16_flagship_decoder():
    """Regression: bf16 training through the concat-free PPM fuse path
    crashed (jax 0.9 conv transpose rejects the f32 cotangent of a bf16
    preferred_element_type=f32 conv) until ops/ppm_fuse grew a custom
    VJP. One bf16 step on the flagship decoder must run and stay finite."""
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        train=True, dtype=jnp.bfloat16)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = torch_sgd(poly_schedule(0.02, 100), momentum=0.9, weight_decay=1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    step = make_anomaly_train_step(model)

    rng = np.random.default_rng(0)
    batch = {
        "img_data": jnp.asarray(
            rng.standard_normal((2, 32, 32, 3)).astype(np.float32)),
        "seg_label": jnp.asarray(rng.integers(-1, 13, (2, 4, 4))),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_checkpoint_roundtrip_and_partial(tmp_path):
    state = {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)},
             "b": {"bias": jnp.ones(4)}}
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, state, {"step": 7})
    restored, meta = load_checkpoint(p, target=state)
    assert meta["step"] == 7
    np.testing.assert_array_equal(np.asarray(restored["a"]["kernel"]),
                                  np.arange(6.0).reshape(2, 3))
    # partial: target has an extra head missing from the checkpoint
    target2 = {"a": {"kernel": jnp.zeros((2, 3))},
               "b": {"bias": jnp.zeros(4)},
               "new_head": {"kernel": jnp.full((2, 2), 5.0)}}
    restored2, _ = load_checkpoint(p, target=target2, partial=True)
    np.testing.assert_array_equal(np.asarray(restored2["new_head"]["kernel"]),
                                  np.full((2, 2), 5.0))
    np.testing.assert_array_equal(np.asarray(restored2["a"]["kernel"]),
                                  np.arange(6.0).reshape(2, 3))


def test_guarded_step_skips_nonfinite():
    """Poisoned batch (inf input) -> loss/grads non-finite -> update skipped."""
    from open_world_semantic_segmentation_tpu.models import ModelBuilder

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13, train=True)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    tx = torch_sgd(poly_schedule(0.02, 100), momentum=0.9)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)
    step = make_anomaly_train_step(model, guard=True)

    rng = np.random.default_rng(0)
    good = {"img_data": jnp.asarray(
                rng.standard_normal((1, 32, 32, 3)).astype(np.float32)),
            "seg_label": jnp.asarray(rng.integers(0, 13, (1, 4, 4)))}
    bad = {"img_data": jnp.full((1, 32, 32, 3), jnp.inf, jnp.float32),
           "seg_label": good["seg_label"]}

    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, m = step(state, bad)
    assert bool(m["skipped"])
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)
    assert int(state.step) == 1  # counter still advances

    state, m = step(state, good)
    assert not bool(m["skipped"])
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.array_equal(p1, p2)


def test_remat_backbone_matches_plain():
    from open_world_semantic_segmentation_tpu.models.resnet import resnet18

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 3)).astype(np.float32))
    plain = resnet18(stem="deep", output_stride=8)
    remat = resnet18(stem="deep", output_stride=8, remat=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    out_p = plain.apply(v, x)
    out_r = remat.apply(v, x)
    for a, b in zip(out_p, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_orbax_checkpoint_roundtrip_sharded(tmp_path):
    """Orbax save/restore of a mesh-sharded pytree (multi-host format)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from open_world_semantic_segmentation_tpu.parallel import make_mesh
    from open_world_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint_orbax, load_checkpoint_orbax)

    mesh = make_mesh(8)
    sharded = jax.device_put(np.arange(32.0).reshape(8, 4),
                             NamedSharding(mesh, P("data")))
    replicated = jax.device_put(np.ones(3, np.float32),
                                NamedSharding(mesh, P()))
    state = {"w": sharded, "b": replicated}
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, state)

    target = {"w": jax.device_put(jnp.zeros((8, 4)),
                                  NamedSharding(mesh, P("data"))),
              "b": jax.device_put(jnp.zeros(3), NamedSharding(mesh, P()))}
    restored = load_checkpoint_orbax(path, target)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(32.0).reshape(8, 4))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.ones(3))
    # restored with the requested sharding
    assert restored["w"].sharding.spec == P("data")


def test_orbax_resharded_restore(tmp_path):
    """Multi-host elastic-restore scenario: a checkpoint written under one
    mesh layout restores under a *different* one (orbax reshards on load).
    Covers both directions: 1-D data-sharded save -> 2-D (data, spatial)
    sharded restore, and sharded save -> fully replicated restore (the
    single-host eval case)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from open_world_semantic_segmentation_tpu.parallel import (
        make_mesh, make_spatial_mesh)
    from open_world_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint_orbax, load_checkpoint_orbax)

    mesh_a = make_mesh(8)
    w = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    state = {
        "w": jax.device_put(w, NamedSharding(mesh_a, P("data"))),
        "step": jax.device_put(np.int32(7), NamedSharding(mesh_a, P())),
    }
    path = str(tmp_path / "resharded_ckpt")
    save_checkpoint_orbax(path, state)

    # restore onto a 2-D mesh with a different partitioning of the same array
    mesh_b = make_spatial_mesh(n_spatial=2, n_data=4)
    target = {
        "w": jax.device_put(jnp.zeros((8, 16)),
                            NamedSharding(mesh_b, P("data", "spatial"))),
        "step": jax.device_put(jnp.int32(0), NamedSharding(mesh_b, P())),
    }
    restored = load_checkpoint_orbax(path, target)
    np.testing.assert_array_equal(np.asarray(restored["w"]), w)
    assert int(restored["step"]) == 7
    assert restored["w"].sharding.spec == P("data", "spatial")

    # and onto a fully replicated target (restore-for-eval)
    target_rep = {
        "w": jax.device_put(jnp.zeros((8, 16)), NamedSharding(mesh_a, P())),
        "step": jax.device_put(jnp.int32(0), NamedSharding(mesh_a, P())),
    }
    restored_rep = load_checkpoint_orbax(path, target_rep)
    np.testing.assert_array_equal(np.asarray(restored_rep["w"]), w)
    assert restored_rep["w"].sharding.spec == P()
