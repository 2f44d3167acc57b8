"""DML embedding training on StreetHazards (anomaly/train_embedding.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.train_embedding \
      --cfg configs/train_embedding.yaml [TRAIN.num_epoch 20 ...]

Differences from the reference are architectural, not behavioral: the
epoch/iteration structure, poly LR on separate encoder/decoder SGD
optimizers, loss = CE/n + 0.01*VAR/n, per-epoch checkpoints, and the printed
progress line all match train_embedding.py:20-143; the step itself is one
donated jitted program and data parallelism is the SPMD mesh.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ._common import (
    build_anomaly_model,
    compute_dtype,
    config_parser,
    epoch_checkpoint_path,
    init_or_load_variables,
    parse_config,
)
from ..data import TrainPipeline, prefetch_to_device
from ..metrics import AverageMeter
from ..parallel import make_mesh_for_batch, data_sharding, replicate
from ..train import (
    TrainState,
    make_anomaly_train_step,
    poly_schedule,
    save_checkpoint,
    two_group_optimizer,
)


def main(cfg, precision_dtype=jnp.bfloat16, max_steps=None):
    model = build_anomaly_model(cfg, train=True, use_softmax=False,
                                dtype=precision_dtype)
    bs = cfg.TRAIN.batch_size_per_gpu
    example = jnp.zeros((bs, 64, 64, 3), jnp.float32)
    variables = init_or_load_variables(cfg, model, example,
                                       rng_seed=cfg.TRAIN.seed)

    max_iters = cfg.TRAIN.epoch_iters * cfg.TRAIN.num_epoch
    tx = two_group_optimizer(
        variables["params"],
        lr_encoder=poly_schedule(cfg.TRAIN.lr_encoder, max_iters,
                                 cfg.TRAIN.lr_pow),
        lr_decoder=poly_schedule(cfg.TRAIN.lr_decoder, max_iters,
                                 cfg.TRAIN.lr_pow),
        momentum=cfg.TRAIN.beta1,
        weight_decay=cfg.TRAIN.weight_decay)
    state = TrainState.create(params=variables["params"],
                              batch_stats=variables["batch_stats"], tx=tx)

    mesh = make_mesh_for_batch(bs)
    state = replicate(state, mesh)
    sharding = data_sharding(mesh)

    pipeline = TrainPipeline(
        cfg.DATASET.root_dataset, cfg.DATASET.list_train,
        batch_per_gpu=bs,
        img_sizes=cfg.DATASET.imgSizes,
        img_max_size=cfg.DATASET.imgMaxSize,
        padding_constant=cfg.DATASET.padding_constant,
        segm_downsampling_rate=cfg.DATASET.segm_downsampling_rate,
        random_flip=cfg.DATASET.random_flip,
        seed=cfg.TRAIN.seed,
        # multi-host SPMD: each host reads a disjoint covering shard of
        # the (seed-shared) record permutation
        num_hosts=jax.process_count(),
        host_id=jax.process_index())

    step_fn = make_anomaly_train_step(
        model, alpha=0.01, rng=jax.random.PRNGKey(cfg.TRAIN.seed),
        fix_bn=cfg.TRAIN.fix_bn, guard=True,
        log_softmax_scores=not cfg.MODEL.arch_decoder.endswith("embedding"))

    from ..utils.observability import MetricsWriter

    writer = MetricsWriter(os.path.join(cfg.DIR, "metrics.jsonl"))
    ave_loss = AverageMeter()
    ave_acc = AverageMeter()
    batches = prefetch_to_device(pipeline, size=2, sharding=sharding)
    total = 0
    for epoch in range(cfg.TRAIN.start_epoch, cfg.TRAIN.num_epoch):
        tic = time.perf_counter()
        for it in range(cfg.TRAIN.epoch_iters):
            batch = next(batches)
            state, metrics = step_fn(state, batch)
            total += 1
            if (it + 1) % cfg.TRAIN.disp_iter == 0:
                loss = float(metrics["loss"])  # sync point
                acc = float(metrics["acc"])
                ave_loss.update(loss)
                ave_acc.update(acc * 100)
                writer.write(total, loss=loss, acc=acc,
                             epoch=epoch + 1)
                dt = (time.perf_counter() - tic) / (it + 1)
                frac = 1.0 - total / max_iters
                lr_e = cfg.TRAIN.lr_encoder * max(frac, 0.0) ** cfg.TRAIN.lr_pow
                print("Epoch: [{}][{}/{}], Time: {:.2f}, "
                      "lr_encoder: {:.6f}, lr_decoder: {:.6f}, "
                      "Accuracy: {:4.2f}, Loss: {:.6f}".format(
                          epoch + 1, it + 1, cfg.TRAIN.epoch_iters, dt,
                          lr_e, lr_e, ave_acc.average(),
                          ave_loss.average()), flush=True)
            if max_steps is not None and total >= max_steps:
                break
        save_checkpoint(epoch_checkpoint_path(cfg, "model", epoch + 1),
                        {"params": state.params,
                         "batch_stats": state.batch_stats},
                        {"epoch": epoch + 1, "step": int(state.step)})
        if max_steps is not None and total >= max_steps:
            break
    print("Training Done!")
    return state


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

