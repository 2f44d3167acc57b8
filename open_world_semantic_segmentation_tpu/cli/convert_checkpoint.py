"""Convert reference .pth checkpoints to native framework checkpoints.

Usage:
  # anomaly pair (encoder_epoch_20.pth + decoder_epoch_20.pth)
  python -m open_world_semantic_segmentation_tpu.cli.convert_checkpoint \
      anomaly --encoder ckpt/encoder_epoch_20.pth \
      --decoder ckpt/decoder_epoch_20.pth --out ckpt/model.pkl

  # DeepLab single checkpoint (best_deeplabv3plus_embedding_...pth)
  python -m open_world_semantic_segmentation_tpu.cli.convert_checkpoint \
      deeplab --ckpt best.pth --out best.pkl \
      [--heads classifier classifier_1]
"""

from __future__ import annotations

import argparse

from ..train import convert as tc
from ..train.checkpoint import save_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["anomaly", "deeplab"])
    ap.add_argument("--encoder")
    ap.add_argument("--decoder")
    ap.add_argument("--ckpt")
    ap.add_argument("--out", required=True)
    ap.add_argument("--heads", nargs="*", default=["classifier"])
    ap.add_argument("--lenient", action="store_true",
                    help="skip untranslatable keys instead of failing")
    args = ap.parse_args(argv)

    if args.kind == "anomaly":
        variables = tc.convert_segmentation_model(
            tc.load_torch_checkpoint(args.encoder),
            tc.load_torch_checkpoint(args.decoder),
            strict=not args.lenient)
        meta = {"source": [args.encoder, args.decoder]}
    else:
        variables = tc.convert_deeplab_checkpoint(
            tc.load_torch_checkpoint(args.ckpt),
            head_names=tuple(args.heads), strict=not args.lenient)
        meta = {"source": [args.ckpt]}
    save_checkpoint(args.out, variables, meta)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
