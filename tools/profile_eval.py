#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship eval pipeline.

Usage (from the repo root, on the TPU):
    python tools/profile_eval.py [--out /tmp/owss_trace] [--images 4]
    tensorboard --logdir /tmp/owss_trace   # or xprof

Seeds optimization rounds: the current pipeline is HBM-bandwidth-bound
(see README Performance), so look at the largest conv activations in the
trace when hunting further wins.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/owss_trace")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--pipeline", default="streethazards",
                    choices=["streethazards", "deeplab"],
                    help="streethazards = 5-scale PSPNet OOD eval; "
                         "deeplab = full-res 1024x2048 Cityscapes eval")
    args = ap.parse_args()
    if args.pipeline == "deeplab":
        return main_deeplab(args)

    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_world_semantic_segmentation_tpu.models import ModelBuilder
    from open_world_semantic_segmentation_tpu.openset.scoring import (
        dissum_conf)
    from open_world_semantic_segmentation_tpu.utils.observability import (
        profile_trace, annotate)

    model = ModelBuilder.build_segmentation_model(
        "resnet50dilated", "ppm_deepsup_embedding", num_class=13,
        dtype=jnp.bfloat16)
    pyramid_shapes = [(304, 536), (376, 672), (456, 800), (528, 936),
                      (568, 1000)]
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *pyramid_shapes[0], 3)))
    pyr = [jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
           for h, w in pyramid_shapes]

    @jax.jit
    def eval_image(variables, pyramid):
        scores = None
        for img in pyramid:
            out = model.apply(variables, img, seg_size=(720, 1280))
            s = out["scores"].astype(jnp.float32)
            scores = s if scores is None else scores + s
        scores = scores[0] / len(pyramid)
        return jnp.nansum(dissum_conf(scores))

    float(eval_image(variables, pyr))  # compile outside the trace
    with profile_trace(args.out):
        for i in range(args.images):
            with annotate(f"eval_image_{i}"):
                float(eval_image(variables, pyr))
    print("trace written to", args.out)


def main_deeplab(args):
    from open_world_semantic_segmentation_tpu.core.cache import enable
    enable()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_world_semantic_segmentation_tpu.models.deeplab import (
        deeplabv3plus_embedding_resnet101)
    from open_world_semantic_segmentation_tpu.utils.observability import (
        profile_trace, annotate)

    model = deeplabv3plus_embedding_resnet101(num_classes=16,
                                              dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 1024, 2048, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(variables, img):
        logits, _, _ = model.apply(variables, img)
        return jnp.sum(jnp.argmax(logits, axis=-1))

    int(fwd(variables, x))  # compile outside the trace
    with profile_trace(args.out):
        for i in range(args.images):
            with annotate(f"deeplab_eval_{i}"):
                int(fwd(variables, x))
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
