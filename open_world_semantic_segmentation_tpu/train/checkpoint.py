"""Checkpoint save/load (orbax when available, msgpack fallback).

Reference parity surface:
- anomaly: per-epoch encoder/decoder state dicts + history
  (anomaly/train.py:77-92); resume by start_epoch rewriting weight paths
  (train.py:253-260).
- DeepLab: single dict {cur_itrs, model_state, optimizer_state,
  scheduler_state, best_score} (main.py:315-325) with --continue_training
  restoring optimizer/scheduler (main.py:338-343); partial-key loads for
  architecture transfer (test_self_distillation.py:511-518) are
  ``restore(..., partial=True)`` here.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Any, metadata: Optional[dict] = None):
    """Serialize a pytree (+ JSON-able metadata) to one file."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "tree": serialization.to_state_dict(_to_numpy(state)),
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None, partial: bool = False):
    """Restore a pytree. With ``target``, values are fitted onto the target
    structure; ``partial=True`` keeps target values for missing keys (the
    reference's strict=False / key-intersection load)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    tree = payload["tree"]
    if target is None:
        return tree, payload["metadata"]
    if partial:
        tree = _merge_partial(serialization.to_state_dict(target), tree)
    restored = serialization.from_state_dict(target, tree)
    return restored, payload["metadata"]


def load_checkpoint_lenient(path: str, target: Any):
    """Strict restore first; on structure mismatch fall back to a partial
    load LOUDLY.

    The shared policy for same-architecture eval/export drivers: a
    matching checkpoint loads strictly (typos and wrong-arch files fail
    fast), while legitimately-extra variable collections (e.g. int8
    'quant' scales filled later by calibration) trigger the partial path
    with a visible warning instead of silently shipping random weights.
    Head-transfer drivers (self_distillation, main_distillation) keep
    calling load_checkpoint(partial=True) directly — there the key
    mismatch is the feature (reference models.py:178-182 strict=False).
    """
    with open(path, "rb") as f:
        payload = pickle.load(f)
    tree = payload["tree"]
    metadata = payload["metadata"]
    try:
        return serialization.from_state_dict(target, tree), metadata
    except ValueError as e:
        # flax raises ValueError on structure mismatch only; a corrupt
        # payload (missing 'tree'/'metadata') already failed above with
        # its real KeyError instead of a misleading retry warning
        print(f"WARNING: strict checkpoint load failed ({e}); retrying "
              "partial load — leaves missing from the checkpoint keep "
              "their random init")
        merged = _merge_partial(serialization.to_state_dict(target), tree)
        return serialization.from_state_dict(target, merged), metadata


def _merge_partial(target: dict, source: dict):
    out = {}
    for k, tv in target.items():
        if k in source:
            sv = source[k]
            if isinstance(tv, dict) and isinstance(sv, dict):
                out[k] = _merge_partial(tv, sv)
            elif hasattr(tv, "shape") and hasattr(sv, "shape") \
                    and tuple(tv.shape) != tuple(np.shape(sv)):
                out[k] = tv  # shape mismatch -> keep target (strict=False)
            else:
                out[k] = sv
        else:
            out[k] = tv
    return out


# ---------------------------------------------------------------------------
# Orbax path: sharded/multi-host checkpoints


def save_checkpoint_orbax(path: str, state):
    """Save a (possibly sharded) pytree with orbax.

    Unlike the pickle path (which gathers to host), orbax writes each shard
    from its owning host — required for multi-host training state that does
    not fit one host's memory. ``path`` must be a directory.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, target):
    """Restore with the shardings/structure of ``target``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)
