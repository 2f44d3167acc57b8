"""Streaming video segmentation demo (demo_video.py parity + live mode).

Two modes:
- ``overlay`` (reference parity, demo_video.py:48-74): blend saved per-frame
  prediction PNGs with the Cityscapes ``demo_video`` split frames and write
  a video (cv2 when available, else an image sequence directory);
- ``live``: run the model frame-by-frame through a jitted forward (one
  compile, static shape) and overlay on the fly — the streaming-inference
  path of BASELINE.json config #5.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from ._common import compute_dtype, config_parser, parse_config
from ..data.cityscapes import Cityscapes, decode_target


def _frames(cfg, split="demo_video"):
    ds = Cityscapes(cfg.DATASET.root_dataset, split=split, transform=None,
                    unknown_target=None)
    return ds


def overlay_mode(cfg, preds_dir, out_path, alpha=0.5, max_frames=None):
    ds = _frames(cfg)
    writer = None
    seq_dir = None
    try:
        import cv2
    except ImportError:
        cv2 = None
        seq_dir = out_path + ".frames"
        os.makedirs(seq_dir, exist_ok=True)

    n = len(ds.images) if max_frames is None else min(max_frames,
                                                      len(ds.images))
    for i in range(n):
        frame = np.array(Image.open(ds.images[i]).convert("RGB"))
        name = os.path.basename(ds.images[i])
        pred_path = os.path.join(preds_dir, name)
        if not os.path.exists(pred_path):
            continue
        pred = np.array(Image.open(pred_path))
        color = decode_target(pred.astype(np.int64)).astype(np.uint8)
        blend = (alpha * frame + (1 - alpha) * color).astype(np.uint8)
        if cv2 is not None:
            if writer is None:
                h, w = blend.shape[:2]
                writer = cv2.VideoWriter(
                    out_path, cv2.VideoWriter_fourcc(*"MJPG"), 17, (w, h))
            writer.write(blend[:, :, ::-1])
        else:
            Image.fromarray(blend).save(os.path.join(seq_dir, name))
    if writer is not None:
        writer.release()
    print("wrote", out_path if cv2 is not None else seq_dir)


def live_mode(cfg, out_path, precision_dtype, max_frames=None,
              variables=None):
    import jax
    import jax.numpy as jnp

    from .main_deeplab import build_model
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from ..train import load_checkpoint_lenient

    model, _ = build_model(cfg, train=False, dtype=precision_dtype)
    ds = _frames(cfg)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32))
        w = cfg.MODEL.weights_encoder or cfg.MODEL.weights_decoder
        if w:
            variables, _ = load_checkpoint_lenient(w, target=variables)

    @jax.jit
    def fwd(variables, image):
        out = model.apply(variables, image)
        logits = out[0] if isinstance(out, tuple) else out
        if isinstance(logits, (list, tuple)):
            logits = logits[0]
        return jnp.argmax(logits, axis=-1)[0]

    seq_dir = out_path + ".frames"
    os.makedirs(seq_dir, exist_ok=True)
    n = len(ds.images) if max_frames is None else min(max_frames,
                                                      len(ds.images))
    for i in range(n):
        frame = np.array(Image.open(ds.images[i]).convert("RGB"))
        x = (frame.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        pred = np.asarray(fwd(variables, jnp.asarray(x[None])))
        color = decode_target(pred.astype(np.int64)).astype(np.uint8)
        blend = (0.5 * frame + 0.5 * color).astype(np.uint8)
        Image.fromarray(blend).save(
            os.path.join(seq_dir, os.path.basename(ds.images[i])))
    print("wrote", seq_dir)
    return seq_dir


def main(argv=None):
    parser = config_parser(__doc__)
    parser.add_argument("--mode", choices=["overlay", "live"],
                        default="overlay")
    parser.add_argument("--preds-dir", default="./test_results/demo_video")
    parser.add_argument("--out", default="./video_demo.avi")
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args(argv)
    cfg = parse_config(args)
    if args.mode == "overlay":
        overlay_mode(cfg, args.preds_dir, args.out,
                     max_frames=args.max_frames)
    else:
        live_mode(cfg, args.out, compute_dtype(args),
                  max_frames=args.max_frames)


if __name__ == "__main__":
    main()
