"""Distance-to-prototype heads (the DML classification rule).

The reference computes per-pixel logits as negative squared L2 distance to K
class centers by materializing a ``B x HW x K x C`` broadcast tensor
(anomaly/models/models.py:645-651, network/utils.py:98-111) — for a 768x768
crop with K=C=17 that is a 170M-element temporary per image. Algebraically

    -||x - c_k||^2 = -(||x||^2 - 2 x.c_k + ||c_k||^2)

so the whole head is one ``HW x C @ C x K`` matmul plus two rank-1 terms:
MXU-shaped, nothing bigger than the logits ever exists. For the reference's
one-hot centers ``c_k = m * e_k`` it collapses further to

    logits_k = 2m * x_k - m^2 - ||x||^2,

a pure VPU elementwise+reduce with no matmul at all. Both forms are exact
(fp32-associativity differences vs the reference are ~1e-5 relative).

``prototype_distance`` is the NPM scoring rule (test_embedding.py:428-434):
negative squared distance of every pixel embedding to a single novel-class
prototype.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def distance_logits(x, centers, *, precision=lax.Precision.HIGHEST):
    """Logits ``-||x - c_k||^2`` for NHWC embeddings vs ``(K, C)`` centers.

    x: (..., C); centers: (K, C) -> (..., K)

    ``precision`` defaults to HIGHEST so fp32 inputs stay fp32 on the MXU
    (TPU matmuls otherwise default to bf16 inputs); pass
    ``lax.Precision.DEFAULT`` on the throughput path where bf16 is intended.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)          # (..., 1)
    c2 = jnp.sum(centers * centers, axis=-1)             # (K,)
    xc = jnp.einsum("...c,kc->...k", x, centers, precision=precision)
    return 2.0 * xc - x2 - c2


def one_hot_center_logits(x, magnitude: float = 3.0):
    """Distance logits for the fixed one-hot centers ``m * e_k`` with K == C.

    Reference builds these centers at models.py:614-618 / network/utils.py:103-107
    (magnitude 3). logits_k = 2m*x_k - m^2 - ||x||^2.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return 2.0 * magnitude * x - magnitude * magnitude - x2


def prototype_distance(features, prototype):
    """NPM score ``-||f_p - proto||^2`` per pixel.

    features: (..., C); prototype: (C,) or (P, C) for P prototypes ->
    (...,) or (..., P).
    """
    prototype = jnp.asarray(prototype)
    if prototype.ndim == 1:
        d = features - prototype
        return -jnp.sum(d * d, axis=-1)
    return distance_logits(features, prototype)
