"""Fused Pallas IDW window kernel vs the XLA loop (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_mapper_tpu.dsm.idw import bin_points, binned_idw, idw_to_grid
from aerial_mapper_tpu.dsm.pallas_idw import binned_idw_pallas
from aerial_mapper_tpu.mapgrid import MapGeometry


def random_binned(seed=0, n=20000, h=50, w=70, res=0.5):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(k1, (n, 2)) * 60 - 30
    payload = 410 + 5 * jax.random.uniform(k2, (n,))
    valid = jax.random.uniform(k3, (n,)) > 0.3
    geom = MapGeometry(0.0, 0.0, res, h, w)
    return bin_points(pts, payload, valid, geom, 8), geom, pts, payload, valid


@pytest.mark.parametrize("adaptive", [True, False])
def test_pallas_idw_matches_xla(adaptive):
    binned, geom, *_ = random_binned()
    va, ha = binned_idw(binned, geom, radius_sq=2.0, adaptive=adaptive,
                        growth=1.1, max_radius_sq=7.0)
    vp, hp = binned_idw_pallas(binned, geom, radius_sq=2.0,
                               adaptive=adaptive, growth=1.1,
                               max_radius_sq=7.0, tile_h=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hp))
    m = np.asarray(ha)
    np.testing.assert_allclose(np.asarray(va)[m], np.asarray(vp)[m],
                               rtol=1e-6, atol=1e-4)


def test_pallas_idw_ragged_tile_and_exact_match():
    # h=50 not divisible by tile_h=16; plant a point exactly on a cell
    # center to exercise the d=0 shortcut
    binned, geom, pts, payload, valid = random_binned(seed=1)
    ce = geom.west + 10.5 * geom.resolution
    cn = geom.north - 7.5 * geom.resolution
    pts2 = jnp.concatenate([pts, jnp.asarray([[ce, cn]])])
    payload2 = jnp.concatenate([payload, jnp.asarray([999.0])])
    valid2 = jnp.concatenate([valid, jnp.asarray([True])])
    binned = bin_points(pts2, payload2, valid2, geom, 8)
    va, ha = binned_idw(binned, geom, radius_sq=2.0, adaptive=True,
                        growth=1.1, max_radius_sq=7.0)
    vp, hp = binned_idw_pallas(binned, geom, radius_sq=2.0, adaptive=True,
                               growth=1.1, max_radius_sq=7.0, tile_h=16,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hp))
    assert float(np.asarray(vp)[7, 10]) == 999.0  # exact-match shortcut
    m = np.asarray(ha)
    np.testing.assert_allclose(np.asarray(va)[m], np.asarray(vp)[m],
                               rtol=1e-6, atol=1e-4)


def test_idw_to_grid_pallas_kernel_option():
    _binned, geom, pts, payload, valid = random_binned(seed=2)
    args = (pts, payload, valid, geom, 8)
    kw = dict(radius_sq=2.0, adaptive=True, growth=1.1, max_radius_sq=7.0)
    va, ha = idw_to_grid(*args, **kw)
    vp, hp = idw_to_grid(*args, **kw, kernel="pallas")
    np.testing.assert_array_equal(np.asarray(ha), np.asarray(hp))
    m = np.asarray(ha)
    np.testing.assert_allclose(np.asarray(va)[m], np.asarray(vp)[m],
                               rtol=1e-6, atol=1e-4)
    with pytest.raises(ValueError, match="idw kernel"):
        idw_to_grid(*args, **kw, kernel="mosaic")
