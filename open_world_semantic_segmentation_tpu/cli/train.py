"""Closed-set scene-parsing training (anomaly/train.py).

Same loop as ``train_embedding`` but with the plain decoder family
(ppm_deepsup / c1_deepsup / upernet ...) and the CE(+VAR) loss of
SegmentationModule (models.py:34-84; crit = NLLLoss(ignore=-1) on
log-softmax outputs == CE on logits).
"""

from __future__ import annotations

import jax.numpy as jnp

from ._common import compute_dtype, config_parser, parse_config
from . import train_embedding


def main(cfg, precision_dtype=jnp.bfloat16, max_steps=None):
    return train_embedding.main(cfg, precision_dtype, max_steps=max_steps)


if __name__ == "__main__":
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))


def _entry():
    args = config_parser(__doc__).parse_args()
    cfg = parse_config(args)
    main(cfg, compute_dtype(args))

