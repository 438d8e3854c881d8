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


def test_bin_capacity_overflow_keeps_nearest_k(rng):
    # 100 points in one cell with capacity 4: must not crash, count is
    # exact, and the kept slots are the 4 NEAREST to the cell center
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
    de = np.asarray(binned.de[:, row, col])
    dn = np.asarray(binned.dn[:, row, col])
    assert np.isfinite(de).all()
    kept_d2 = np.sort(de**2 + dn**2)
    center = np.array([0.5, 0.5], np.float32)
    all_d2 = np.sort(
        np.sum((pts[:, :2].astype(np.float32) - center) ** 2, axis=1)
    )
    # nearest-K policy: the kept slots are the 4 globally smallest d^2
    # (distance quantization can only swap near-ties, which the sorted
    # comparison tolerates via allclose)
    np.testing.assert_allclose(kept_d2, all_d2[:4], rtol=1e-5, atol=1e-9)


def _overflow_workload(rng, pts_per_cell=70):
    """Bench-regime workload: ~70 points/cell at 0.5 m cells (the e2e bench
    runs 12.6M points onto ~400^2 cells), smooth field + noise."""
    geom = MapGeometry(
        center_easting=0.0, center_northing=0.0, resolution=0.5,
        height=24, width=20,
    )
    n = pts_per_cell * geom.height * geom.width
    e = rng.uniform(-5.5, 5.5, n)
    nn = rng.uniform(-6.5, 6.5, n)
    z = (410.0 + 3.0 * np.sin(0.8 * e) + 2.0 * np.cos(0.5 * nn)
         + rng.normal(0.0, 0.15, n))
    return geom, np.stack([e, nn], axis=1), z


def test_idw_overflow_parity_capacity_sweep(rng):
    """Overflow-regime parity vs the all-neighbors reference (dsm.cc:93-104)
    at bench-like density (~70 points/cell): the nearest-K capacity policy's
    residual error must shrink monotonically with capacity and stay within
    the stated tolerances (measured headroom ~2x: cap=8 max 0.20 m RMSE
    0.067 m; cap=32 max 0.067 m RMSE 0.026 m on this field — all far below
    the 0.5 m cell and the noise floor sigma=0.15 m)."""
    from aerial_mapper_tpu.dsm.idw import idw_to_grid

    geom, pts, z = _overflow_workload(rng)
    ce, cn = cell_centers(geom)
    centers = np.stack(
        [np.asarray(ce).ravel(), np.asarray(cn).ravel()], axis=1
    )
    ref_vals, ref_hit = idw_reference(
        pts, z, centers, radius_sq=2.0, adaptive=True, growth=1.1,
        max_radius_sq=7.0,
    )
    tol = {8: (0.40, 0.14), 16: (0.30, 0.10), 32: (0.15, 0.06)}
    last_rmse = np.inf
    for cap in (8, 16, 32):
        vals, hit = idw_to_grid(
            jnp.asarray(pts, jnp.float32), jnp.asarray(z, jnp.float32),
            jnp.ones(pts.shape[0], bool), geom, cap,
            radius_sq=2.0, adaptive=True, growth=1.1, max_radius_sq=7.0,
        )
        v, h = np.asarray(vals).ravel(), np.asarray(hit).ravel()
        np.testing.assert_array_equal(h, ref_hit)
        err = np.abs(v[h] - ref_vals[ref_hit])
        rmse = float(np.sqrt((err**2).mean()))
        max_tol, rmse_tol = tol[cap]
        assert err.max() < max_tol, f"cap={cap} max|err|={err.max():.4f}"
        assert rmse < rmse_tol, f"cap={cap} rmse={rmse:.4f}"
        assert rmse <= last_rmse * 1.05, "error must shrink with capacity"
        last_rmse = rmse


def test_idw_overflow_parity_vs_native(rng):
    """Same overflow regime vs the native C++ reference loop (the bench
    denominator, native/reference_baseline.cc dsm_idw_baseline)."""
    import pytest

    from aerial_mapper_tpu.dsm.idw import idw_to_grid
    from aerial_mapper_tpu.native import load_native

    if load_native() is None:
        pytest.skip("native baseline library unavailable")
    from aerial_mapper_tpu.native import dsm_idw_cpu

    geom, pts, z = _overflow_workload(rng)
    ce, cn = cell_centers(geom)
    ref_vals, ref_hit = dsm_idw_cpu(
        np.concatenate([pts, z[:, None]], axis=1),
        np.asarray(ce, np.float64).ravel(),
        np.asarray(cn, np.float64).ravel(),
        radius_sq=2.0, adaptive=True, growth=1.1, max_radius_sq=7.0,
    )
    vals, hit = idw_to_grid(
        jnp.asarray(pts, jnp.float32), jnp.asarray(z, jnp.float32),
        jnp.ones(pts.shape[0], bool), geom, 32,
        radius_sq=2.0, adaptive=True, growth=1.1, max_radius_sq=7.0,
    )
    v, h = np.asarray(vals).ravel(), np.asarray(hit).ravel()
    np.testing.assert_array_equal(h, ref_hit)
    err = np.abs(v[h] - ref_vals[ref_hit])
    assert err.max() < 0.15 and np.sqrt((err**2).mean()) < 0.06


def test_bin_points_empty_input():
    """Zero-length point stacks must bin to an all-empty structure instead
    of crashing the trace (ADVICE r1)."""
    binned = bin_points(
        jnp.zeros((0, 2), jnp.float32),
        jnp.zeros((0,), jnp.float32),
        jnp.zeros((0,), bool),
        GEOM,
        4,
    )
    assert int(np.asarray(binned.count).sum()) == 0
    vals, hit = binned_idw(binned, GEOM, radius_sq=2.0, adaptive=False)
    assert not np.asarray(hit).any()


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
