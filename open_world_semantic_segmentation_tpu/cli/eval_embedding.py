"""NPM 16+1 evaluation on Cityscapes (test_embedding.py --test_only).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.eval_embedding \
      FEWSHOT.prototype_file prototype_car_5_shot.json \
      MODEL.weights_encoder ckpt/best.pkl

Pipeline (test_embedding.py:225-653): embedding model forward ->
base-head argmax -> per-pixel distance to the k-shot averaged prototype ->
override prediction with the novel id where the distance beats the
threshold AND the max base logit -> remap ground truth (car->16, shift) ->
streaming 19-class confusion matrix. The distance/override/remap all run
on-device in the same program as the forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from .main_deeplab import build_model, get_transforms
from ..data import Cityscapes
from ..data.loader import batch_iterator
from ..fewshot import load_prototypes, npm_label_remap, npm_override
from ..metrics import StreamSegMetrics
from ..metrics.anom import eval_ood_measure
from ..openset.calibration import ScoreCalibration, collect_dissum_samples
from ..train import load_checkpoint_lenient


def fit_calibration(model, variables, dataset, num_classes, cfg):
    """Collection + fit pass of the GMM/ECDF calibration
    (main_embedding.py:175-226 made live): run up to
    ``FEWSHOT.calib_images`` validation images through the base head,
    harvest per-class dis_sum samples, fit per-class GMM+ECDF."""

    @jax.jit
    def collect_fwd(variables, image):
        logits, _, _ = model.apply(variables, image)
        dissum = -jnp.sum(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(logits, axis=-1), dissum

    per_image = []
    count = 0
    for image, target, _ in batch_iterator(dataset, 1, shuffle=False,
                                           drop_last=False, epochs=1):
        preds, dissum = collect_fwd(variables, jnp.asarray(image))
        lab = target[0] if target.ndim == 3 else target
        per_image.append((np.asarray(dissum[0]), np.asarray(preds[0]),
                          np.asarray(lab)))
        count += 1
        if count >= cfg.FEWSHOT.calib_images:
            break

    def collect(require_agreement):
        rng = np.random.default_rng(0)
        data_list = [[] for _ in range(num_classes + 1)]
        for dis, prd, lab in per_image:
            collect_dissum_samples(
                dis, prd if require_agreement else lab, lab,
                num_classes, data_list, rng, rate=cfg.FEWSHOT.calib_rate)
        return data_list

    try:
        calib = ScoreCalibration.fit(collect(True),
                                     mode=cfg.FEWSHOT.calib_mode)
    except ValueError:
        # untrained/smoke-scale runs: no pixel where prediction and label
        # agree — fall back to ground-truth-conditioned collection, loudly
        # (deviation from main_embedding.py:188, which simply never fits)
        print("score calibration: no prediction/label agreement anywhere — "
              "falling back to ground-truth-conditioned collection")
        calib = ScoreCalibration.fit(collect(False),
                                     mode=cfg.FEWSHOT.calib_mode)
    if cfg.FEWSHOT.calib_save:
        calib.save(cfg.FEWSHOT.calib_save)
        print(f"calibration state saved to {cfg.FEWSHOT.calib_save}")
    return calib


def main(cfg, precision_dtype=jnp.float32, max_images=None, variables=None,
         split="val"):
    model, num_classes = build_model(cfg, train=False, dtype=precision_dtype)
    _, val_tf = get_transforms(cfg.DEEPLAB.crop_size)
    val_ds = Cityscapes(cfg.DATASET.root_dataset, split=split,
                        transform=val_tf,
                        unknown_target=tuple(cfg.DEEPLAB.unknown_target))

    if variables is None:
        example = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), example)
        w = cfg.MODEL.weights_encoder or cfg.MODEL.weights_decoder
        if w:
            variables, _ = load_checkpoint_lenient(w, target=variables)

    prototype = load_prototypes(cfg.FEWSHOT.prototype_file)
    novel_id = num_classes  # 16
    threshold = cfg.FEWSHOT.npm_dis_threshold

    calib = None
    if cfg.FEWSHOT.calibrate_scores:
        calib = fit_calibration(model, variables, val_ds, num_classes, cfg)

    # The calibrated-score path needs full-res f32 softmax + dissum maps
    # as extra jit outputs (~140 MB/image at 1024x2048x16 — XLA cannot DCE
    # returned outputs), so only the calibrating variant materializes them.
    want_scores = calib is not None

    @jax.jit
    def fwd(variables, image, labels):
        logits, centers, features = model.apply(variables, image)
        preds = jnp.argmax(logits, axis=-1)
        new_preds, _ = npm_override(
            preds[0], features[0], logits[0], jnp.asarray(prototype),
            novel_id=novel_id, dis_threshold=threshold)
        remapped = npm_label_remap(labels[0], novel_id=novel_id)
        if not want_scores:
            return new_preds, remapped, (), ()
        lg = logits[0].astype(jnp.float32)
        probs = jax.nn.softmax(lg, axis=-1)
        return new_preds, remapped, probs, -jnp.sum(lg, axis=-1)

    metrics = StreamSegMetrics(num_classes + 1)
    metrics.reset()
    calib_measures = []

    def resolve(entry):
        """Host-side consumption of one image's (async) device outputs."""
        (preds, labels, probs, dissum), target = entry
        metrics.update(np.asarray(labels)[None].astype(np.int64),
                       np.asarray(preds)[None])
        if calib is not None:
            # calibrated certainty vs the unknown region (label 255):
            # softmax-weighted per-class ECDF certainty of the dis_sum map
            # (main_embedding.py:249-253), scored like the other OOD methods
            cert, _ = calib.apply(np.asarray(probs), np.asarray(dissum))
            raw = target[0] if target.ndim == 3 else target
            res = eval_ood_measure(cert, raw, out_labels=(255,))
            if res is not None:
                calib_measures.append(res)

    # double-buffered dispatch (the anomaly evaluator's pattern,
    # openset/evaluator.py): dispatch image k asynchronously, THEN resolve
    # image k-1 — its compute overlapped this image's host decode/transfer,
    # and the confusion-matrix bincount overlaps image k's compute
    inflight = None
    count = 0
    for image, target, _ in batch_iterator(val_ds, 1, shuffle=False,
                                           drop_last=False, epochs=1):
        outs = fwd(variables, jnp.asarray(image),
                   jnp.asarray(target.astype(np.int32)))
        if inflight is not None:
            resolve(inflight)
        inflight = (outs, target)
        count += 1
        if max_images is not None and count >= max_images:
            break
    if inflight is not None:
        resolve(inflight)
    score = metrics.get_results()
    print(StreamSegMetrics.to_str(score))
    if calib is not None and calib_measures:
        m = np.mean(np.asarray(calib_measures, np.float64), axis=0)
        print(f"calibrated-score OOD  auroc {m[0]:.4f}  aupr {m[1]:.4f}  "
              f"fpr95 {m[2]:.4f}  ({len(calib_measures)} images)")
        score["calib_auroc"] = float(m[0])
        score["calib_aupr"] = float(m[1])
        score["calib_fpr95"] = float(m[2])
    return score


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

