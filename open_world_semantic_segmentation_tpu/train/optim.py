"""Optimizers: torch-compatible SGD + poly schedules + parameter grouping.

Reference parity:
- SGD: torch semantics — weight decay added to the gradient, then momentum
  buffer ``b = mu*b + g``, update ``-lr * b`` (dampening 0, no Nesterov).
  optax order: add_decayed_weights -> trace -> scale_by_schedule(-lr).
- Poly LR: ``lr * (1 - it/max_iters)^power`` (anomaly/train.py:133-142,
  power 0.9) and the DeepLab PolyLR with min_lr 1e-6
  (utils/scheduler.py:3-12).
- Weight-decay grouping (anomaly/train.py:95-115 group_weight): conv/linear
  kernels decay; biases and BN scale/bias do not. In the Flax tree this is
  exactly "leaf name == 'kernel'".
- Two-group LRs: encoder/decoder separate SGD instances
  (anomaly/train.py:118-130) and backbone at 0.1x head LR
  (DeepLab main.py:296-299) — both expressed as ``optax.multi_transform``
  over path-prefix labels, which compiles to one fused update.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def poly_schedule(base_lr: float, max_iters: int, power: float = 0.9,
                  min_lr: float = 0.0) -> Callable:
    def schedule(step):
        frac = 1.0 - step / max_iters
        lr = base_lr * jax.numpy.maximum(frac, 0.0) ** power
        return jax.numpy.maximum(lr, min_lr)
    return schedule


def decay_mask(params):
    """True for leaves that receive weight decay (conv/linear kernels)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_kernel(path):
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", None))
        return key == "kernel"

    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_kernel(path), params)


def torch_sgd(learning_rate, momentum: float = 0.9,
              weight_decay: float = 0.0, mask=decay_mask):
    """SGD matching torch.optim.SGD step-for-step."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay, mask=mask))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_schedule(
        learning_rate if callable(learning_rate)
        else (lambda _: learning_rate)))
    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)


def _label_by_prefix(params, prefixes, default_label):
    """Label each top-level subtree by the first matching prefix name."""
    def label_tree(tree, label):
        return jax.tree_util.tree_map(lambda _: label, tree)

    labels = {}
    for top, sub in params.items():
        lab = default_label
        for name, prefix_set in prefixes.items():
            if top in prefix_set:
                lab = name
                break
        labels[top] = label_tree(sub, lab)
    return labels


def two_group_optimizer(params, *, lr_encoder, lr_decoder,
                        momentum: float = 0.9, weight_decay: float = 1e-4,
                        encoder_keys=("encoder",)):
    """anomaly-style: separate SGD for encoder and decoder params
    (shared poly schedules passed as callables)."""
    tx = optax.multi_transform(
        {
            "encoder": torch_sgd(lr_encoder, momentum, weight_decay),
            "decoder": torch_sgd(lr_decoder, momentum, weight_decay),
        },
        _label_by_prefix(params, {"encoder": set(encoder_keys)}, "decoder"),
    )
    return tx


def backbone_classifier_optimizer(params, *, lr, momentum: float = 0.9,
                                  weight_decay: float = 1e-4,
                                  backbone_scale: float = 0.1,
                                  backbone_keys=("backbone",),
                                  frozen_keys=()):
    """DeepLab-style: backbone at ``backbone_scale * lr``, heads at ``lr``;
    optional frozen subtrees (self-distillation trains only classifier_1,
    test_self_distillation.py:476-478)."""
    lr_fn = lr if callable(lr) else (lambda _: lr)

    def scaled(step):
        return backbone_scale * lr_fn(step)

    transforms = {
        "backbone": torch_sgd(scaled, momentum, weight_decay),
        "head": torch_sgd(lr_fn, momentum, weight_decay),
        "frozen": optax.set_to_zero(),
    }
    labels = _label_by_prefix(
        params,
        {"frozen": set(frozen_keys), "backbone": set(backbone_keys)},
        "head",
    )
    return optax.multi_transform(transforms, labels)
