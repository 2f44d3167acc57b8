"""Worker process for tests/test_multiprocess.py.

Runs as one of N real OS processes federated with
``jax.distributed.initialize`` (CPU backend, 4 virtual devices per
process, gloo cross-process collectives) — the DCN-tier demonstration the
single-process 8-device dryrun cannot give. Exercises the REAL package
paths: per-host ``TrainPipeline`` input shards (the SPMD replacement for
the reference's dormant DistributedSampler,
anomaly/lib/utils/data/distributed.py:7), ``prefetch_to_device`` with the
multi-process global-batch assembly, the jitted sharded anomaly train
step, and an orbax multi-host save/restore roundtrip.

Invoked by the test as:
  python tests/_mp_worker.py <pid> <nprocs> <port> <data_root> <outdir>

Writes ``<outdir>/result_<pid>.json`` with per-step losses, a params
digest, and the orbax roundtrip verdict; the parent asserts digests and
losses are identical across processes.
"""

import hashlib
import json
import os
import sys

import jax

# sitecustomize presets jax_platforms=axon,cpu — override BEFORE first
# backend use (env vars are too late: jax is pre-imported by the hook)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_digest(tree) -> str:
    import numpy as np
    from flax import serialization

    flat = serialization.to_state_dict(tree)

    def walk(node, prefix, out):
        if isinstance(node, dict):
            for k in sorted(node):
                walk(node[k], f"{prefix}/{k}", out)
        else:
            out.append((prefix, np.asarray(node)))

    leaves = []
    walk(flat, "", leaves)
    h = hashlib.md5()
    for name, arr in leaves:
        h.update(name.encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def _mark(msg: str):
    # unbuffered progress breadcrumbs: the parent test reads the log tail
    # when a worker dies or stalls, so every long phase must leave a trace
    print(f"[worker] {msg}", flush=True)


def main(pid: int, nprocs: int, port: int, root: str, outdir: str):
    # persistent compile cache: the sharded train-step compile dominates
    # this test's wall time; warm reruns skip it
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()
    _mark(f"pid={pid} initializing jax.distributed on port {port}")
    jax.distributed.initialize(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import jax.numpy as jnp
    import numpy as np

    from open_world_semantic_segmentation_tpu.data import (
        TrainPipeline, prefetch_to_device)
    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.parallel import (
        data_sharding, make_mesh, replicate)
    from open_world_semantic_segmentation_tpu.train import (
        TrainState, make_anomaly_train_step, poly_schedule,
        two_group_optimizer)

    model = ModelBuilder.build_segmentation_model(
        "resnet18dilated", "ppm_deepsup_embedding", num_class=13,
        fc_dim=512, use_softmax=False, train=True, dtype=jnp.float32)
    bs_local = 4  # per process; global batch = nprocs * 4 = 8
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 40, 56, 3), jnp.float32))
    tx = two_group_optimizer(
        variables["params"],
        lr_encoder=poly_schedule(0.02, 100, 0.9),
        lr_decoder=poly_schedule(0.02, 100, 0.9),
        momentum=0.9, weight_decay=1e-4)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)

    mesh = make_mesh()  # all 8 GLOBAL devices, both processes
    state = replicate(state, mesh)
    sharding = data_sharding(mesh)

    pipeline = TrainPipeline(
        root, os.path.join(root, "train.odgt"),
        batch_per_gpu=bs_local, img_sizes=(40,), img_max_size=80,
        padding_constant=8, segm_downsampling_rate=8, random_flip=False,
        seed=7, num_hosts=nprocs, host_id=pid)
    batches = prefetch_to_device(pipeline, size=2, sharding=sharding)

    step_fn = make_anomaly_train_step(model, alpha=0.01,
                                      rng=jax.random.PRNGKey(0))

    # Compile EXPLICITLY, then rendezvous on the coordination service
    # (pure gRPC, generous timeout) before the first execution: the gloo
    # context that backs the cross-process collectives initializes at
    # first RUN with a fixed ~30s key-value timeout, which a compile-time
    # or import-time skew between workers on a loaded 1-CPU host can
    # exceed (observed flake). After the barrier both processes enter
    # execution within milliseconds of each other.
    batch = next(batches)
    assert batch["img_data"].shape[0] == bs_local * nprocs
    _mark("compiling sharded train step")
    compiled = step_fn.lower(state, batch).compile()
    _mark("compiled; waiting at barrier")
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("owss_mp_compiled", 600_000)
    _mark("barrier passed; running steps")

    losses = []
    for i in range(3):
        state, metrics = compiled(state, batch)
        losses.append(float(metrics["loss"]))  # replicated -> readable
        if i < 2:
            batch = next(batches)
            assert batch["img_data"].shape[0] == bs_local * nprocs

    final = {"params": state.params, "batch_stats": state.batch_stats}
    digest = tree_digest(final)

    # orbax multi-host save/restore across the real process boundary
    from open_world_semantic_segmentation_tpu.train import (
        load_checkpoint_orbax, save_checkpoint_orbax)

    ckpt_dir = os.path.join(outdir, "orbax_ckpt")
    save_checkpoint_orbax(ckpt_dir, final)
    restored = load_checkpoint_orbax(ckpt_dir, final)
    orbax_ok = all(
        bool(jnp.all(a == b)) for a, b in zip(
            jax.tree_util.tree_leaves(final),
            jax.tree_util.tree_leaves(restored)))

    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "losses": losses, "digest": digest,
                   "orbax_ok": orbax_ok,
                   "n_global_devices": len(jax.devices())}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4], sys.argv[5])
