"""Reconstruction-based OOD evaluation (anomaly/eval_ood_rec.py).

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.eval_ood_rec \
      --cfg configs/test_ood_rec.yaml

Two aligned loaders: the original test images and externally-reconstructed
versions (DATASET.rec_dataset, matched by folder/name —
eval_ood_rec.py:220-245). conf = MSP where MSP > 0.999, else the cosine
similarity between the 4096-d PPM feature maps of original vs
reconstruction (eval_ood_rec.py:140-153). The ppm_deepsup decoder's ``ft``
output (the PPM concat) provides the features.
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
from ..metrics import AverageMeter, eval_ood_measure
from ..openset.scoring import msp_conf, rec_cosine_conf
from ..ops.resize import bilinear_resize


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

    def eval_fn(shapes, seg_size):
        key = (shapes, seg_size)
        if key not in compiled:
            def fn(variables, pyr_o, pyr_r):
                def fwd(pyr):
                    scores = None
                    ft = None
                    for img in pyr:
                        out = model.apply(variables, img, seg_size=seg_size)
                        s = out["scores"] / len(pyr)
                        scores = s if scores is None else scores + s
                        f = out["ft"]
                        # PPM concat stays at conv5 res; align scales
                        f = bilinear_resize(
                            f, (seg_size[0] // 4, seg_size[1] // 4))
                        f = f / len(pyr)
                        ft = f if ft is None else ft + f
                    return scores[0], ft[0]

                scores_o, ft_o = fwd(pyr_o)
                _, ft_r = fwd(pyr_r)
                msp = msp_conf(scores_o)
                cos = rec_cosine_conf(
                    bilinear_resize(msp[None, :, :, None],
                                    (seg_size[0] // 4, seg_size[1] // 4)
                                    )[0, :, :, 0],
                    ft_o, ft_r)
                conf = bilinear_resize(cos[None, :, :, None],
                                       seg_size)[0, :, :, 0]
                return conf
            compiled[key] = jax.jit(fn)
        return compiled[key]

    aurocs, auprs, fprs = [], [], []
    time_meter = AverageMeter()
    for item_o, item_r in zip(orig, rec):
        pyr_o = [jnp.asarray(x) for x in item_o["img_data"]]
        pyr_r = [jnp.asarray(x) for x in item_r["img_data"]]
        seg = np.asarray(item_o["seg_label"][0])
        fn = eval_fn(tuple(p.shape for p in pyr_o), seg.shape)
        conf = np.asarray(fn(variables, pyr_o, pyr_r))
        res = eval_ood_measure(conf, seg, out_labels=cfg.OOD.out_labels)
        if res is not None:
            aurocs.append(res[0]); auprs.append(res[1]); fprs.append(res[2])
    print("mean auroc = ", np.mean(aurocs), "mean aupr = ", np.mean(auprs),
          " mean fpr = ", np.mean(fprs))
    return {"auroc": float(np.mean(aurocs)) if aurocs else None,
            "aupr": float(np.mean(auprs)) if auprs else None,
            "fpr": float(np.mean(fprs)) if fprs else None}


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

