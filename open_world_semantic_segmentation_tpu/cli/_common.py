"""Shared CLI plumbing for the driver scripts."""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cache import enable as _enable_cache
from ..core.config import Config, load_config

_enable_cache()


def config_parser(description: str) -> argparse.ArgumentParser:
    """yacs-style CLI: --cfg preset.yaml plus trailing KEY VALUE pairs
    (anomaly/train.py:213-241 surface)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cfg", metavar="FILE", default=None,
                   help="path to a YAML config preset")
    p.add_argument("--precision", choices=["fp32", "bf16"], default="bf16",
                   help="compute dtype (params stay fp32)")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None,
                   help="config overrides: SECTION.key value ...")
    return p


def parse_config(args) -> Config:
    return load_config(args.cfg, args.opts or ())


def compute_dtype(args):
    if args.precision == "bf16":
        return jnp.bfloat16
    # true fp32: TPU matmul/conv units otherwise truncate fp32 inputs to
    # bf16 — metric-parity runs need HIGHEST precision
    jax.config.update("jax_default_matmul_precision", "highest")
    return jnp.float32


def build_anomaly_model(cfg: Config, *, train: bool, use_softmax: bool,
                        dtype, quant: str = "off"):
    from ..models import ModelBuilder

    return ModelBuilder.build_segmentation_model(
        cfg.MODEL.arch_encoder, cfg.MODEL.arch_decoder,
        num_class=cfg.DATASET.num_class, fc_dim=cfg.MODEL.fc_dim,
        use_softmax=use_softmax, train=train, dtype=dtype, quant=quant)


def init_or_load_variables(cfg: Config, model, example_img, *,
                           rng_seed: int = 0):
    """Init params; if MODEL.weights_encoder/decoder point at .pth files,
    convert and load them (the published reference checkpoints)."""
    # jitted init: one dispatch instead of op-by-op over the tunnel, and
    # required for quant="w4a8" (eager init would materialize int4
    # intermediates as op arguments, which this PJRT stack cannot accept)
    variables = jax.jit(model.init)(jax.random.PRNGKey(rng_seed),
                                    example_img)
    enc_w, dec_w = cfg.MODEL.weights_encoder, cfg.MODEL.weights_decoder
    if enc_w or dec_w:
        from ..train import convert as tc

        if enc_w and dec_w and enc_w.endswith(".pth"):
            conv = tc.convert_segmentation_model(
                tc.load_torch_checkpoint(enc_w),
                tc.load_torch_checkpoint(dec_w))
            variables = {"params": conv["params"],
                         "batch_stats": conv["batch_stats"]}
        elif enc_w.endswith(".pkl") or dec_w.endswith(".pkl"):
            from ..train import load_checkpoint

            try:
                variables, _ = load_checkpoint(enc_w or dec_w,
                                               target=variables)
            except (ValueError, KeyError) as e:
                # partial fallback, LOUDLY: needed when the eval model
                # carries extra variable collections absent from the
                # checkpoint (int8 'quant' scales, filled by calibration)
                # — but a wrong-architecture checkpoint also lands here,
                # so surface what mismatched (reference analog: the
                # strict=False loads of models.py:178-182)
                print(f"WARNING: strict checkpoint load failed ({e}); "
                      "retrying partial load — leaves missing from the "
                      "checkpoint keep their random init")
                variables, _ = load_checkpoint(enc_w or dec_w,
                                               target=variables,
                                               partial=True)
    return variables


def calibrate_for_quant(cfg: Config, variables, size, *, dtype,
                        use_softmax: bool, calib_glob: str = None,
                        n_noise: int = 4, quant: str = "int8"):
    """Calibrate int8 activation scales and prequantize the weights.

    ``calib_glob``: shell glob of representative images (recommended);
    without it, ImageNet-normalized white noise at the target size is used
    — adequate because post-BN activation ranges are input-distribution
    robust, but real images are strictly better.
    """
    import glob as globmod

    from ..data.native import resize_normalize
    from ..ops.quant import calibrate_and_prequantize

    m_cal = build_anomaly_model(cfg, train=False, use_softmax=use_softmax,
                                dtype=dtype, quant="calib")
    imgs = []
    if calib_glob:
        from PIL import Image

        matched = sorted(globmod.glob(calib_glob))
        if not matched:
            raise FileNotFoundError(
                f"--calib-glob {calib_glob!r} matched no files — refusing "
                "to silently calibrate on white noise")
        for p in matched[:16]:
            arr = resize_normalize(
                np.asarray(Image.open(p).convert("RGB")), tuple(size))
            imgs.append(arr[None])
        print(f"int8 calibration: {len(imgs)} image(s) used "
              f"({len(matched)} matched {calib_glob!r}, cap 16)")
    if not imgs:
        rng = np.random.default_rng(0)
        imgs = [rng.standard_normal((1, *size, 3)).astype(np.float32)
                for _ in range(n_noise)]
    return calibrate_and_prequantize(m_cal, variables, imgs,
                                     seg_size=tuple(size), mode=quant)


def epoch_checkpoint_path(cfg: Config, kind: str, epoch: int) -> str:
    os.makedirs(cfg.DIR, exist_ok=True)
    return os.path.join(cfg.DIR, f"{kind}_epoch_{epoch}.pkl")
