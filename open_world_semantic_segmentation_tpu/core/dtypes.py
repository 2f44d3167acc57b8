"""Compute-dtype policy.

TPU-first default: bf16 activations/weights-on-the-fly with fp32 parameters
and fp32 batch-norm statistics (the Flax modules take ``dtype`` for compute
and pin ``param_dtype=float32``). ``Policy.parity()`` pins everything to
fp32 AND raises matmul/conv precision to HIGHEST — required for
bit-comparisons against the reference, since TPU matmul units otherwise
truncate fp32 inputs to bf16.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    compute_dtype: object = jnp.bfloat16
    param_dtype: object = jnp.float32

    @staticmethod
    def fast() -> "Policy":
        return Policy(jnp.bfloat16, jnp.float32)

    @staticmethod
    def parity() -> "Policy":
        jax.config.update("jax_default_matmul_precision", "highest")
        return Policy(jnp.float32, jnp.float32)
