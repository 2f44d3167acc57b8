"""DeepLab closed-set EVAL-ONLY driver (main.py --test_only / test.py).

Evaluate a trained DeepLab checkpoint standalone — no training loop — and
optionally dump per-image result PNGs. Parity surface:

- ``DeepLabV3Plus-Pytorch/main.py:156-240`` (``validate`` +
  ``--test_only`` + ``--save_val_results``): run the val split once, print
  ``StreamSegMetrics.to_str``, and with ``save_val_results`` write
  ``results/%d_image.png`` (denormalized input), ``%d_target.png`` /
  ``%d_pred.png`` (color-decoded), ``%d_scores.png`` (255·(1−MSP) anomaly
  map), ``%d_overlay.png`` (pred alpha-composited onto the image at 0.7 —
  the reference renders this via matplotlib ``imshow(alpha=.7)``; here it
  is the same convex blend in numpy).
- ``DeepLabV3Plus-Pytorch/test.py:156-290``: additionally score the
  unknown pixels as an open-set problem — per image, on pixels where
  ``target_true != 255``, anomaly positives are ``target == 255`` with
  score ``1 − max softmax``; prints mean AUROC / FPR95 / AUPR over images
  that contain unknowns (test.py:205-249, 287-289).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.test_deeplab \
      --cfg configs/cityscapes_closed.yaml DEEPLAB.ckpt ckpt/best.pkl \
      DEEPLAB.save_val_results True
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ._common import compute_dtype, config_parser, parse_config
from ..data.loader import batch_iterator
from ..metrics import StreamSegMetrics
from ..metrics.anom import get_measures
from ..utils.visualize import Denormalize


def save_val_result(image, target, pred, scores, decode_target, out_dir,
                    img_id: int):
    """Write the reference's five result PNGs for one image
    (main.py:209-234 / test.py:258-283)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    denorm = Denormalize()
    img_u8 = (np.clip(denorm(image), 0, 1) * 255).astype(np.uint8)
    target_rgb = np.asarray(decode_target(target)).astype(np.uint8)
    pred_rgb = np.asarray(decode_target(pred)).astype(np.uint8)
    scores_u8 = (255 * np.clip(scores, 0, 1)).astype(np.uint8)
    # matplotlib's imshow(pred, alpha=.7) over the image == convex blend
    overlay = (0.3 * img_u8 + 0.7 * pred_rgb).astype(np.uint8)

    Image.fromarray(img_u8).save(os.path.join(out_dir,
                                              f"{img_id}_image.png"))
    Image.fromarray(target_rgb).save(os.path.join(out_dir,
                                                  f"{img_id}_target.png"))
    Image.fromarray(pred_rgb).save(os.path.join(out_dir,
                                                f"{img_id}_pred.png"))
    Image.fromarray(scores_u8).save(os.path.join(out_dir,
                                                 f"{img_id}_scores.png"))
    Image.fromarray(overlay).save(os.path.join(out_dir,
                                               f"{img_id}_overlay.png"))


def validate(model, variables, val_ds, metrics: StreamSegMetrics, *,
             batch_size: int = 1, save_val_results: bool = False,
             results_dir: str = "results", unknown_scores: bool = False,
             max_images=None):
    """Standalone validation pass (main.py:156-240).

    With ``unknown_scores`` also computes the per-image open-set measures
    of test.py:205-249 on the MSP score map. Returns
    ``(score_dict, ood_means_or_None)``.
    """
    metrics.reset()

    @jax.jit
    def fwd(variables, image):
        out = model.apply(variables, image)
        logits = out[0] if isinstance(out, tuple) else out
        if isinstance(logits, (list, tuple)):
            logits = logits[0]
        preds = jnp.argmax(logits, axis=-1)
        # 1 - max softmax: the reference's anomaly score (test.py:183)
        msp = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
                      axis=-1)
        return preds, 1.0 - msp

    aucs, auprs, fprs = [], [], []
    img_id = 0
    n_done = 0

    def resolve(entry):
        nonlocal img_id
        (preds_dev, scores_dev), image, target, target_true = entry
        preds = np.asarray(preds_dev)
        scores = np.asarray(scores_dev)
        metrics.update(target.astype(np.int64), preds)

        if unknown_scores:
            # test.py:205-213: score only pixels with a 19-class gt label;
            # positives are the compacted-away unknown ids (== 255)
            for b in range(len(preds)):
                valid = target_true[b] != 255
                msk = (target[b][valid] == 255)
                sc = scores[b][valid]
                if msk.any() and (~msk).any():
                    auroc, aupr, fpr = get_measures(sc[msk], sc[~msk])
                    aucs.append(auroc)
                    auprs.append(aupr)
                    fprs.append(fpr)

        if save_val_results:
            for b in range(len(preds)):
                save_val_result(image[b], target[b], preds[b], scores[b],
                                val_ds.decode_target, results_dir, img_id)
                img_id += 1

    # double-buffered dispatch (openset/evaluator.py pattern): image k's
    # forward overlaps image k-1's host-side metric/PNG work and image
    # k+1's decode
    inflight = None
    for image, target, target_true in batch_iterator(
            val_ds, batch_size, shuffle=False, drop_last=False, epochs=1):
        outs = fwd(variables, jnp.asarray(image))
        if inflight is not None:
            resolve(inflight)
        inflight = (outs, image, target, target_true)
        n_done += len(image)
        if max_images is not None and n_done >= max_images:
            break
    if inflight is not None:
        resolve(inflight)

    score = metrics.get_results()
    ood = None
    if unknown_scores and aucs:
        ood = {"AUROC": float(np.mean(aucs)),
               "FPR95": float(np.mean(fprs)),
               "AUPR": float(np.mean(auprs))}
        # printed order of test.py:287-289
        print(ood["AUROC"])
        print(ood["FPR95"])
        print(ood["AUPR"])
    return score, ood


def main(cfg, precision_dtype=jnp.bfloat16, max_images=None):
    from .main_deeplab import (
        build_model,
        get_transforms,
        get_val_dataset,
        load_deeplab_variables,
    )

    d = cfg.DEEPLAB
    model, num_classes = build_model(cfg, train=False, dtype=precision_dtype)

    _, val_tf = get_transforms(d.crop_size, d.dataset)
    # val split only: eval-only must not require the train tree
    val_ds = get_val_dataset(cfg, val_tf)

    example = jnp.zeros((1, d.crop_size, d.crop_size, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(d.random_seed),
                                    example)

    ckpt = d.ckpt or os.path.join(cfg.DIR, "best.pkl")
    if not os.path.exists(ckpt):
        raise FileNotFoundError(
            f"checkpoint {ckpt!r} not found — set DEEPLAB.ckpt or train "
            "first (main.py asserts --ckpt exists for --test_only)")
    variables, meta = load_deeplab_variables(cfg, model, variables, ckpt)
    print(f"loaded checkpoint {ckpt} "
          f"(step {meta.get('cur_itrs', meta.get('step', '?'))})")

    metrics = StreamSegMetrics(num_classes)
    unknown = "embedding" in d.model or d.unknown_scores
    score, ood = validate(
        model, variables, val_ds, metrics,
        batch_size=d.val_batch_size,
        save_val_results=d.save_val_results,
        results_dir=os.path.join(cfg.DIR, "results"),
        unknown_scores=unknown,
        max_images=max_images)
    print(StreamSegMetrics.to_str(score))
    return score, ood


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


if __name__ == "__main__":
    _entry()
