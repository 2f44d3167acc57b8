"""Pallas kernel tests (interpreter mode on CPU; real-TPU runs in bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from open_world_semantic_segmentation_tpu.ops.pallas_knn import (
    knn_cosine_pallas,
)
from open_world_semantic_segmentation_tpu.openset.scoring import (
    knn_cosine_conf,
)


@pytest.mark.parametrize("shape", [(45, 80, 13), (64, 128, 19), (9, 17, 4)])
def test_knn_pallas_matches_jnp_reference(shape):
    rng = np.random.default_rng(0)
    ft = rng.standard_normal(shape).astype(np.float32)
    ref = np.asarray(knn_cosine_conf(jnp.asarray(ft)))
    got = np.asarray(knn_cosine_pallas(jnp.asarray(ft), interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_knn_pallas_small_neighborhood():
    rng = np.random.default_rng(1)
    ft = rng.standard_normal((20, 30, 8)).astype(np.float32)
    ref = np.asarray(knn_cosine_conf(jnp.asarray(ft), neighbor_size=3))
    got = np.asarray(knn_cosine_pallas(jnp.asarray(ft), neighbor_size=3,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_knn_pallas_zero_features_are_zero_cos():
    ft = np.zeros((16, 24, 5), np.float32)
    got = np.asarray(knn_cosine_pallas(jnp.asarray(ft), interpret=True))
    np.testing.assert_array_equal(got, 0.0)
