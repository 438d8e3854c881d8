"""Parity tests: grid-binned IDW vs the NumPy-faithful reference loops."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.config import DsmConfig
from aerial_mapper_tpu.dsm import bin_points, binned_idw, update_elevation_layer
from aerial_mapper_tpu.mapgrid import MapGeometry, cell_centers, create_map_state
from aerial_mapper_tpu.testing.numpy_ref import idw_reference

GEOM = MapGeometry(
    center_easting=0.0, center_northing=0.0, resolution=1.0, height=24, width=20
)


def make_points(rng, n=300):
    e = rng.uniform(-11, 11, size=n)  # a bit beyond the map to test drop
    nn = rng.uniform(-13, 13, size=n)
    z = rng.uniform(400.0, 430.0, size=n)
    return np.stack([e, nn, z], axis=1)


def run_both(points, radius_sq, adaptive, growth=1.1, max_radius_sq=7.0,
             capacity=32):
    from aerial_mapper_tpu.dsm.idw import idw_to_grid

    vals, hit = idw_to_grid(
        jnp.asarray(points[:, :2], jnp.float32),
        jnp.asarray(points[:, 2], jnp.float32),
        jnp.ones(points.shape[0], bool),
        GEOM, capacity,
        radius_sq=radius_sq, adaptive=adaptive,
        growth=growth, max_radius_sq=max_radius_sq,
    )
    ce, cn = cell_centers(GEOM)
    centers = np.stack(
        [np.asarray(ce).ravel(), np.asarray(cn).ravel()], axis=1
    )
    # the reference kd-tree holds ALL points, including those outside the
    # map (dsm.cc:36-52) — the halo-extended binning must match that
    ref_vals, ref_hit = idw_reference(
        points[:, :2], points[:, 2], centers,
        radius_sq=radius_sq, adaptive=adaptive, growth=growth,
        max_radius_sq=max_radius_sq,
    )
    return (
        np.asarray(vals).ravel(),
        np.asarray(hit).ravel(),
        ref_vals,
        ref_hit,
    )


def test_idw_parity_fixed_radius(rng):
    points = make_points(rng)
    vals, hit, ref_vals, ref_hit = run_both(points, radius_sq=2.0, adaptive=False)
    np.testing.assert_array_equal(hit, ref_hit)
    np.testing.assert_allclose(vals[hit], ref_vals[ref_hit], rtol=2e-5, atol=2e-3)


def test_idw_parity_adaptive(rng):
    points = make_points(rng, n=60)  # sparse so adaptive growth kicks in
    vals, hit, ref_vals, ref_hit = run_both(points, radius_sq=1.0, adaptive=True)
    np.testing.assert_array_equal(hit, ref_hit)
    np.testing.assert_allclose(vals[hit], ref_vals[ref_hit], rtol=2e-5, atol=2e-3)


def test_idw_exact_match():
    # a point exactly at a cell center dominates
    pts = np.array([[0.5, 0.5, 100.0], [1.5, 0.5, 50.0]])
    binned = bin_points(
        jnp.asarray(pts[:, :2], jnp.float32),
        jnp.asarray(pts[:, 2], jnp.float32),
        jnp.ones(2, bool),
        GEOM,
        4,
    )
    vals, hit = binned_idw(binned, GEOM, radius_sq=2.0, adaptive=False)
    ce, cn = cell_centers(GEOM)
    mask = (np.asarray(ce) == 0.5) & (np.asarray(cn) == 0.5)
    assert hit[mask].all()
    np.testing.assert_allclose(np.asarray(vals)[mask], 100.0)


def test_bin_capacity_overflow_drops_deterministically(rng):
    # 100 points in one cell with capacity 4: must not crash, count is exact
    pts = np.concatenate(
        [
            np.full((100, 1), 0.3) + rng.uniform(-0.05, 0.05, (100, 1)),
            np.full((100, 1), 0.3) + rng.uniform(-0.05, 0.05, (100, 1)),
            rng.uniform(0, 1, (100, 1)),
        ],
        axis=1,
    )
    binned = bin_points(
        jnp.asarray(pts[:, :2], jnp.float32),
        jnp.asarray(pts[:, 2], jnp.float32),
        jnp.ones(100, bool),
        GEOM,
        4,
    )
    row, col = 11, 10  # cell containing (0.3, 0.3)
    assert int(binned.count[row, col]) == 100
    assert np.isfinite(np.asarray(binned.de[:, row, col])).all()


def test_update_elevation_layer_leaves_missing_cells_nan(rng):
    state = create_map_state(GEOM)
    pts = np.array([[0.5, 0.5, 410.0]])
    cfg = DsmConfig(interpolation_radius_sq=1.0, adaptive_interpolation=False)
    layers = update_elevation_layer(
        state.layers,
        jnp.asarray(pts, jnp.float32),
        jnp.ones(1, bool),
        GEOM,
        cfg,
    )
    elev = np.asarray(layers["elevation"])
    assert np.isfinite(elev).sum() >= 1
    assert np.isnan(elev[0, 0])  # far corner untouched


def test_bounds_of_sorted_matches_searchsorted(rng):
    """Two-level segment bounds must equal jnp.searchsorted exactly,
    including empty cells, the all-smaller tail, and the invalid-id
    sentinel segment."""
    from aerial_mapper_tpu.dsm.idw import _bounds_of_sorted

    for n, cells in ((10_000, 997), (4_097, 64), (64, 7), (1, 3)):
        ids = np.sort(rng.integers(0, cells + 1, n).astype(np.int32))
        ref = np.searchsorted(ids, np.arange(cells + 1), side="left")
        ours = np.asarray(
            _bounds_of_sorted(jnp.asarray(ids), cells)
        )
        np.testing.assert_array_equal(ours, ref, err_msg=f"{n=} {cells=}")
