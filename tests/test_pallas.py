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

pytestmark = pytest.mark.e2e


# one full-window case at the realistic ragged shape; interpret-mode cost
# scales with the 9x9 window (~40s), so other shapes are covered by the
# cheap 3x3-window cases below and real-hardware runs via bench
@pytest.mark.parametrize("shape", [(45, 80, 13)])
def test_knn_pallas_matches_jnp_reference(shape):
    rng = np.random.default_rng(0)
    ft = rng.standard_normal(shape).astype(np.float32)
    ref = np.asarray(knn_cosine_conf(jnp.asarray(ft)))
    got = np.asarray(knn_cosine_pallas(jnp.asarray(ft), interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("shape", [(20, 30, 8), (9, 17, 4), (64, 128, 19)])
def test_knn_pallas_small_neighborhood(shape):
    """3x3-window variants: covers sub-tile ragged and aligned multi-tile
    grids at interpreter-affordable cost."""
    rng = np.random.default_rng(1)
    ft = rng.standard_normal(shape).astype(np.float32)
    ref = np.asarray(knn_cosine_conf(jnp.asarray(ft), neighbor_size=3))
    got = np.asarray(knn_cosine_pallas(jnp.asarray(ft), neighbor_size=3,
                                       interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_knn_pallas_zero_features_are_zero_cos():
    ft = np.zeros((16, 24, 5), np.float32)
    got = np.asarray(knn_cosine_pallas(jnp.asarray(ft), interpret=True))
    np.testing.assert_array_equal(got, 0.0)
