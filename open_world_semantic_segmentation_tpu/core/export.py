"""AOT model export via ``jax.export`` (serialized StableHLO artifacts).

Production-deployment feature with no reference equivalent (the torch
reference has no export story): the full jitted eval computation —
normalize-free forward, score upsample, OOD confidence + argmax — is
lowered once and serialized WITH the weights baked in. The artifact:

- loads and runs without any model-building code (only jax), so serving
  containers don't ship flax/the framework;
- can be lowered for a platform other than the exporting host
  (``platforms=("tpu",)`` from a CPU machine) — XLA compiles the
  deserialized StableHLO natively on the target;
- is shape- and dtype-checked at call time by jax.export's calling
  convention.

Usage:
    blob = export_eval_fn(model, variables, (720, 1280))
    save_exported("model.owss", blob)
    fn = load_exported("model.owss")     # -> callable(img[B,H,W,3]) ->
    pred, conf = fn(img)                 #    (uint8 labels, f16 conf)
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

MAGIC = b"OWSS-EXPORT-v1\n"


def _conf_fn(method: str):
    """method name -> per-image confidence kernel (None = labels only)."""
    from ..openset import scoring

    return {
        "dissum": scoring.dissum_conf,
        "msp": scoring.msp_conf,
        "maxlogit": scoring.maxlogit_conf,
        "none": None,
    }[method]


def export_eval_fn(model, variables, input_size: Tuple[int, int],
                   batch: int = 1, method: str = "dissum",
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the full eval computation with weights as constants.

    The single-scale special case of :func:`export_pyramid_eval_fn`
    (one input at ``input_size``; same calling convention — the artifact
    takes one array).

    ``method``: OOD confidence baked into the artifact — "dissum", "msp",
    "maxlogit", or "none" (labels only).
    ``platforms``: lowering targets, e.g. ("tpu",) or ("cpu", "tpu");
    defaults to the current backend.
    """
    return export_pyramid_eval_fn(model, variables, [input_size],
                                  input_size, batch=batch, method=method,
                                  platforms=platforms)


def export_pyramid_eval_fn(model, variables,
                           pyramid_shapes: Sequence[Tuple[int, int]],
                           full_size: Tuple[int, int],
                           batch: int = 1, method: str = "dissum",
                           platforms: Optional[Sequence[str]] = None
                           ) -> bytes:
    """Serialize the FULL multi-scale eval pipeline as ONE artifact.

    The flagship path (anomaly/eval_ood_traditional.py:198-218 semantics,
    what bench.py measures): one forward per pyramid scale, scores
    averaged at ``full_size`` resolution, OOD confidence + argmax — all in
    a single exported computation. The artifact takes one array per scale
    (``(batch, h_i, w_i, 3)`` in ``pyramid_shapes`` order, the data
    pipeline's ``img_data`` pyramid) and returns ``(uint8 labels, f16
    conf)``. Works with prequantized int8 variables when ``model`` was
    built with the matching ``quant`` mode.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    conf_fn = _conf_fn(method)

    def fwd(*pyramid):
        scores = None
        for img in pyramid:
            out = model.apply(variables, img, seg_size=full_size)
            s = out["scores"]
            # accumulate in the model dtype (bench.py rationale: an f32
            # copy of each full-res score map is pure HBM tail traffic)
            scores = s if scores is None else scores + s
        scores = scores.astype(jnp.float32) / len(pyramid)
        pred = jnp.argmax(scores, axis=-1).astype(jnp.uint8)
        if conf_fn is None:
            return pred
        return pred, jax.vmap(conf_fn)(scores).astype(jnp.float16)

    specs = tuple(
        jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
        for h, w in pyramid_shapes)
    exported = jex.export(jax.jit(fwd),
                          platforms=tuple(platforms) if platforms else None)(
        *specs)
    return exported.serialize()


def export_npm_eval_fn(model, variables, input_size: Tuple[int, int],
                       batch: int = 1, novel_id: int = 16,
                       dis_threshold: float = -1.5,
                       platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize the NPM (novel-prototype matching) 16+1 inference as an
    artifact with the PROTOTYPE as a runtime input.

    The few-shot pipeline of cli/eval_embedding.py (reference:
    DeepLabV3Plus-Pytorch/test_embedding.py:428-445): embedding forward ->
    base-head argmax -> per-pixel squared distance to the prototype ->
    override with ``novel_id`` where the distance beats both the threshold
    and the max base logit. Because the prototype is an argument (not a
    baked constant), ONE artifact serves every few-shot class/shot-count —
    swap prototypes without re-exporting.

    Calling convention: ``fn(image (B,H,W,3) f32, prototype (C,) f32) ->
    (uint8 preds (B,H,W), f16 distance map (B,H,W))``.

    Returns ``(blob, feat_dim)`` so the caller can stamp the expected
    prototype dimension into the artifact metadata.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    from ..fewshot.prototypes import npm_override

    h, w = input_size
    img_spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    # infer the embedding dim from the model's feature output
    out_shapes = jax.eval_shape(
        lambda v, x: model.apply(v, x), variables, img_spec)
    feat_dim = out_shapes[2].shape[-1]
    proto_spec = jax.ShapeDtypeStruct((feat_dim,), jnp.float32)

    def fwd(image, prototype):
        logits, _, features = model.apply(variables, image)
        preds = jnp.argmax(logits, axis=-1)
        new_preds, dis = jax.vmap(
            lambda p, f, lg: npm_override(
                p, f, lg, prototype, novel_id=novel_id,
                dis_threshold=dis_threshold))(preds, features, logits)
        return new_preds.astype(jnp.uint8), dis.astype(jnp.float16)

    exported = jex.export(jax.jit(fwd),
                          platforms=tuple(platforms) if platforms else None)(
        img_spec, proto_spec)
    return exported.serialize(), feat_dim


def save_exported(path: str, blob: bytes, meta: Optional[dict] = None):
    """Write MAGIC + JSON metadata line + the serialized artifact.

    Versioning fields are stamped automatically (model-zoo story): the
    artifact ``format`` (bumped with MAGIC), the exporting framework and
    jax versions. Caller-provided keys win on collision.
    """
    import jax

    from .. import __version__

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    stamped = {"format": 1, "owss_version": __version__,
               "jax_version": jax.__version__}
    stamped.update(meta or {})
    header = json.dumps(stamped).encode() + b"\n"
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)


def read_meta(path: str) -> dict:
    """Read ONLY the metadata header (MAGIC + JSON line) — O(header)
    bytes, no StableHLO deserialization. For manifest/zoo tooling."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not an OWSS export artifact")
        return json.loads(f.readline())


def load_exported(path: str):
    """Load an artifact; returns ``(callable, meta)``. The callable runs
    the deserialized computation under jit on the current backend."""
    import jax
    from jax import export as jex

    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not an OWSS export artifact")
        meta = json.loads(f.readline())
        blob = f.read()
    exported = jex.deserialize(blob)
    return jax.jit(exported.call), meta
