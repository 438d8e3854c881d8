"""Fused Pallas SGM aggregation vs the XLA lax.scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.config import SgmConfig
from aerial_mapper_tpu.stereo.matching import _sgm_scan_1d, sgm_disparity
from aerial_mapper_tpu.stereo.pallas_sgm import (
    sgm_aggregate_pallas,
    sgm_disparity_pallas,
)


def test_pallas_aggregation_matches_xla_scan():
    key = jax.random.PRNGKey(0)
    cost = jax.random.uniform(key, (37, 53, 16)) * 100.0  # [H, W, D], ragged
    for reverse in (False, True):
        ref = _sgm_scan_1d(cost, 8.0, 32.0, reverse=reverse)
        pal = sgm_aggregate_pallas(cost, 8.0, 32.0, reverse=reverse,
                                   tile_h=16, interpret=True)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                   rtol=1e-6, atol=1e-3)


def _disparity_case(num_directions):
    # small synthetic rectified pair: textured image shifted by 3 px
    key = jax.random.PRNGKey(1)
    base = jax.random.uniform(key, (48, 96)) * 255.0
    base = jnp.cumsum(base, axis=1) % 255.0  # smooth-ish texture
    right = base
    left = jnp.roll(base, 3, axis=1)
    mask = jnp.ones((48, 96), bool)
    cfg = SgmConfig(num_disparities=16, block_size=5,
                    num_directions=num_directions)
    d_ref = np.asarray(sgm_disparity(left, right, mask, cfg))
    d_pal = np.asarray(sgm_disparity_pallas(left, right, mask, cfg,
                                            tile_h=16, interpret=True))
    both = (d_ref > 1.0) & (d_pal > 1.0)
    assert both.mean() > 0.5
    np.testing.assert_allclose(d_pal[both], d_ref[both], atol=1e-3)
    # the disparity itself must be right where valid
    inner = both[:, 20:-20]
    assert np.median(np.abs(d_ref[:, 20:-20][inner] - 3.0)) < 0.5


def test_pallas_sgm_disparity_matches_xla():
    _disparity_case(4)


def test_pallas_sgm_disparity_matches_xla_8dir():
    _disparity_case(8)
