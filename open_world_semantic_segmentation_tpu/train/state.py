"""Train state + jitted train steps.

One donated-state jitted step replaces the reference's per-iteration Python
of ``anomaly/train.py:20-75`` (host loop with .cuda() copies, two optimizer
.step()s and SyncBN thread traffic) and ``main.py:355-418``. Under a Mesh,
the same step runs SPMD: batches arrive sharded on the ``data`` axis, BN
statistics and gradients reduce over ICI automatically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .losses import dml_segmentation_loss, deeplab_cross_entropy, pixel_acc


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, tx=tx,
                   opt_state=tx.init(params))

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_anomaly_train_step(model, *, alpha: float = 0.01,
                            beta: float = 0.0,
                            deep_sup_scale: Optional[float] = None,
                            ignore_index: int = -1,
                            rng: Optional[jax.Array] = None,
                            guard: bool = False,
                            fix_bn: bool = False,
                            log_softmax_scores: bool = False) -> Callable:
    """Train step for the anomaly stack (SegmentationModule semantics).

    loss = CE/n + alpha*VAR/n (models.py:78); the deep-supervision term is
    disabled by default exactly as shipped (models.py:79-81 commented) —
    pass ``deep_sup_scale`` to enable the intended auxiliary loss.
    ``fix_bn`` freezes running BN statistics (cfg.TRAIN.fix_bn / the
    reference's frozen-BN finetuning modes, main_self_distillation.py:433).
    ``log_softmax_scores``: the non-embedding decoders feed LOG-SOFTMAX
    outputs into SegmentationModule (models.py:578, crit=NLLLoss), so their
    VAR term operates on log-probs; the embedding decoder feeds raw distance
    logits (models.py:681-682 commented out). Set True for C1/PPM training.
    """
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def loss_fn(params, batch_stats, batch, step):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["img_data"],
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(base_rng, step)},
        )
        logits = out["scores"]
        if log_softmax_scores:
            logits = jax.nn.log_softmax(logits, axis=-1)
        loss, (ce, var, inter, acc) = dml_segmentation_loss(
            logits, batch["seg_label"], alpha=alpha, beta=beta,
            ignore_index=ignore_index)
        if deep_sup_scale is not None and "deepsup" in out:
            ds_ce = dml_segmentation_loss(
                out["deepsup"], batch["seg_label"], alpha=0.0,
                ignore_index=ignore_index)[1][0]
            loss = loss + deep_sup_scale * ds_ce / logits.shape[0]
        return loss, (mutated["batch_stats"], acc)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=state.batch_stats if fix_bn else new_bs)
        metrics = {"loss": loss, "acc": acc}
        if guard:
            from .guard import all_finite, select_update

            finite = jnp.logical_and(all_finite(grads), jnp.isfinite(loss))
            new_state = select_update(finite, new_state, state)
            metrics["skipped"] = jnp.logical_not(finite)
        return new_state, metrics

    return train_step


def make_deeplab_train_step(model, *, loss_kind: str = "cross_entropy",
                            ignore_index: int = 255,
                            rng: Optional[jax.Array] = None,
                            guard: bool = False,
                            fix_bn: bool = False) -> Callable:
    """Train step for the DeepLab stack: model returns (logits, centers,
    features) (embedding wrappers) or bare logits; loss = CE/n
    (utils/loss.py:42 active path)."""
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def loss_fn(params, batch_stats, batch, step):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"],
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(base_rng, step)},
        )
        logits = out[0] if isinstance(out, tuple) else out
        if isinstance(logits, (list, tuple)):
            logits = logits[-1]  # self-distillation trains the last head
        if loss_kind == "focal_loss":
            from .losses import focal_loss

            loss = focal_loss(logits, batch["label"],
                              ignore_index=ignore_index)
        else:
            loss = deeplab_cross_entropy(logits, batch["label"],
                                         ignore_index=ignore_index)
        acc = pixel_acc(logits, jnp.where(batch["label"] == ignore_index,
                                          -1, batch["label"]))
        return loss, (mutated["batch_stats"], acc)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch):
        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=state.batch_stats if fix_bn else new_bs)
        metrics = {"loss": loss, "acc": acc}
        if guard:
            from .guard import all_finite, select_update

            finite = jnp.logical_and(all_finite(grads), jnp.isfinite(loss))
            new_state = select_update(finite, new_state, state)
            metrics["skipped"] = jnp.logical_not(finite)
        return new_state, metrics

    return train_step
