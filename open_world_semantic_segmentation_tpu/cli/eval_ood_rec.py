"""Reconstruction-based OOD evaluation (anomaly/eval_ood_rec.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.eval_ood_rec \
      --cfg configs/test_ood_rec.yaml

Two aligned loaders: the original test images and externally-reconstructed
versions (DATASET.rec_dataset, matched by folder/name —
eval_ood_rec.py:220-245).

Reference numerics reproduced exactly (eval_ood_rec.py:96-150):
  - per-scale PPM-concat features are bilinearly resized to
    (segH/4, segW/4) and averaged there (:96-97, :112-113, :124-125);
  - the cosine map between the normalized orig/rec feature maps is
    computed at that feature resolution (:143-146) and upsampled to
    segSize (:147);
  - MSP stays at FULL resolution (from the segSize score average, with
    exclude_back applied, :127-129, :141) and the select
    ``conf = msp*(msp>0.999) + cos*(msp<=0.999)`` happens at full
    resolution (:149-150).
The ppm_deepsup decoder's ``ft`` output (the PPM concat) provides the
features. Per-class IoU / accuracy summaries match :192-199.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ._common import (
    build_anomaly_model,
    compute_dtype,
    config_parser,
    init_or_load_variables,
    parse_config,
)
from ..data import ValPipeline
from ..metrics import (
    AverageMeter,
    eval_ood_measure,
    intersection_and_union_jax,
)
from ..openset.scoring import rec_cosine_conf, rec_cosine_map
from ..ops.resize import bilinear_resize


def rec_combine(scores_list, ft_o_list, ft_r_list, seg_size,
                exclude_back: bool = False):
    """Everything after the per-scale forwards, transliterated to NHWC jax
    (reference eval_ood_rec.py:95-150).

    ``scores_list``: per-scale softmaxed scores at segSize, each (1,H,W,K);
    ``ft_*_list``: per-scale PPM-concat features at their native conv5
    resolutions, each (1,h,w,C). Returns (conf, pred) at segSize.
    """
    n = len(scores_list)
    ft_size = (seg_size[0] // 4, seg_size[1] // 4)
    scores = sum(s / n for s in scores_list)[0]
    ft_o = sum(bilinear_resize(f, ft_size) / n for f in ft_o_list)[0]
    ft_r = sum(bilinear_resize(f, ft_size) / n for f in ft_r_list)[0]
    # bare max over already-softmaxed scores (use_softmax=True decoder):
    # the reference applies NO second softmax in the rec branch (:141)
    tmp = scores[..., 1:] if exclude_back else scores
    msp = jnp.max(tmp, axis=-1)
    cos = rec_cosine_map(ft_o, ft_r)
    cos = bilinear_resize(cos[None, :, :, None], seg_size)[0, :, :, 0]
    conf = rec_cosine_conf(msp, cos)
    pred = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return conf, pred


def main(cfg, precision_dtype=jnp.float32, max_images=None):
    model = build_anomaly_model(cfg, train=False, use_softmax=True,
                                dtype=precision_dtype)
    variables = init_or_load_variables(
        cfg, model, jnp.zeros((1, 64, 64, 3), jnp.float32))

    common = dict(img_sizes=cfg.DATASET.imgSizes,
                  img_max_size=cfg.DATASET.imgMaxSize,
                  padding_constant=cfg.DATASET.padding_constant,
                  max_sample=max_images or -1)
    orig = ValPipeline(cfg.DATASET.root_dataset, cfg.DATASET.list_val,
                       **common)
    rec = ValPipeline(cfg.DATASET.root_dataset, cfg.DATASET.list_val,
                      rec_dataset=cfg.DATASET.rec_dataset, **common)

    compiled = {}
    exclude_back = bool(cfg.OOD.exclude_back)
    num_class = cfg.DATASET.num_class

    def eval_fn(shapes, seg_size):
        key = (shapes, seg_size)
        if key not in compiled:
            def fn(variables, pyr_o, pyr_r):
                outs_o = [model.apply(variables, img, seg_size=seg_size)
                          for img in pyr_o]
                outs_r = [model.apply(variables, img, seg_size=seg_size)
                          for img in pyr_r]
                return rec_combine([o["scores"] for o in outs_o],
                                   [o["ft"] for o in outs_o],
                                   [o["ft"] for o in outs_r],
                                   seg_size, exclude_back)
            compiled[key] = jax.jit(fn)
        return compiled[key]

    aurocs, auprs, fprs = [], [], []
    time_meter = AverageMeter()
    acc_meter = AverageMeter()
    intersection_meter = AverageMeter()
    union_meter = AverageMeter()
    import time
    for item_o, item_r in zip(orig, rec):
        pyr_o = [jnp.asarray(x) for x in item_o["img_data"]]
        pyr_r = [jnp.asarray(x) for x in item_r["img_data"]]
        seg = np.asarray(item_o["seg_label"][0])
        fn = eval_fn(tuple(p.shape for p in pyr_o), seg.shape)
        tic = time.perf_counter()
        conf, pred = fn(variables, pyr_o, pyr_r)
        conf = np.asarray(conf)
        pred = np.asarray(pred)
        time_meter.update(time.perf_counter() - tic)
        res = eval_ood_measure(conf, seg, out_labels=cfg.OOD.out_labels)
        if res is not None:
            aurocs.append(res[0]); auprs.append(res[1]); fprs.append(res[2])
        valid = seg >= 0
        acc = float(np.sum(valid & (pred == seg))) / (valid.sum() + 1e-10)
        acc_meter.update(acc, int(valid.sum()))
        inter, union = intersection_and_union_jax(pred, seg, num_class)
        intersection_meter.update(np.asarray(inter))
        union_meter.update(np.asarray(union))

    iou = intersection_meter.sum / (union_meter.sum + 1e-10)
    for i, v in enumerate(iou):
        print("class [{}], IoU: {:.4f}".format(i, v))
    print("[Eval Summary]:")
    print("Mean IoU: {:.4f}, Accuracy: {:.2f}%, Inference Time: {:.4f}s"
          .format(float(iou.mean()), acc_meter.average() * 100,
                  time_meter.average()))
    if aurocs:
        print("mean auroc = ", np.mean(aurocs), "mean aupr = ",
              np.mean(auprs), " mean fpr = ", np.mean(fprs))
    else:  # no image had both in- and out-pixels — nothing to average
        print("mean auroc =  n/a (no image with anomaly pixels)")
    return {"auroc": float(np.mean(aurocs)) if aurocs else None,
            "aupr": float(np.mean(auprs)) if auprs else None,
            "fpr": float(np.mean(fprs)) if fprs else None,
            "mean_iou": float(iou.mean()),
            "accuracy": float(acc_meter.average())}


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

