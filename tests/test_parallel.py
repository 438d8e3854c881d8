"""Multi-device tests on the virtual 8-device CPU mesh: sharded ops must be
numerically identical to their single-device counterparts; halo exchange
must reproduce neighbor rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.config import DsmConfig, OrthoBackwardGridConfig
from aerial_mapper_tpu.dsm import update_elevation_layer
from aerial_mapper_tpu.geo.se3 import matrix_to_quat
from aerial_mapper_tpu.mapgrid import MapGeometry, cell_centers, create_map_state
from aerial_mapper_tpu.ortho import backward_grid_update
from aerial_mapper_tpu.parallel import (
    halo_exchange_rows,
    make_mesh,
    sharded_backward_grid_update,
    sharded_dsm_update,
)
from aerial_mapper_tpu.synth import SyntheticScene, make_survey_poses, render_image

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

GEOM = MapGeometry(center_easting=40.0, center_northing=0.0, resolution=1.0,
                   height=64, width=48)
CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)


def test_halo_exchange_rows():
    mesh = make_mesh(("tiles",))
    x = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4)

    def body(local):
        return halo_exchange_rows(local, 2, "tiles")

    out = shard_map(body, mesh=mesh, in_specs=P("tiles", None),
                    out_specs=P("tiles", None))(x)
    out = np.asarray(out)  # [8 * (2 + 8 + 2), 4]
    band = 64 // 8
    for d in range(8):
        ext = out[d * (band + 4):(d + 1) * (band + 4)]
        # middle = own band
        np.testing.assert_array_equal(
            ext[2:2 + band], np.asarray(x[d * band:(d + 1) * band])
        )
        # upper halo = previous device's last rows (zeros at the edge)
        if d > 0:
            np.testing.assert_array_equal(
                ext[:2], np.asarray(x[d * band - 2: d * band])
            )
        else:
            np.testing.assert_array_equal(ext[:2], 0.0)
        if d < 7:
            np.testing.assert_array_equal(
                ext[2 + band:], np.asarray(x[(d + 1) * band:(d + 1) * band + 2])
            )
        else:
            np.testing.assert_array_equal(ext[2 + band:], 0.0)


def test_sharded_dsm_matches_single_device(rng):
    mesh = make_mesh(("tiles",))
    n = 4000
    pts = np.stack(
        [
            rng.uniform(GEOM.west - 3, GEOM.west + 51, n),
            rng.uniform(GEOM.north - 67, GEOM.north + 3, n),
            rng.uniform(400, 430, n),
        ],
        axis=1,
    ).astype(np.float32)
    valid = rng.random(n) > 0.1
    cfg = DsmConfig(interpolation_radius_sq=1.5, adaptive_interpolation=True,
                    bin_capacity=16)

    single = update_elevation_layer(
        dict(create_map_state(GEOM).layers), jnp.asarray(pts),
        jnp.asarray(valid), GEOM, cfg,
    )["elevation"]

    sharded = sharded_dsm_update(
        create_map_state(GEOM).layers["elevation"],
        jnp.asarray(pts), jnp.asarray(valid), GEOM, cfg, mesh,
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-4, equal_nan=True
    )


def test_sharded_backward_grid_matches_single_device():
    mesh = make_mesh(("tiles",))
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=4.0)
    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=15.0)
    images = jnp.stack(
        [
            render_image(scene, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ce, cn = cell_centers(GEOM)
    layers = dict(create_map_state(GEOM).layers)
    layers["elevation"] = scene.height(ce, cn)
    cfg = OrthoBackwardGridConfig(cell_chunk=256)

    single = backward_grid_update(
        layers, quats, jnp.asarray(ts, jnp.float32), images, GEOM, CAM, cfg
    )
    sharded = sharded_backward_grid_update(
        layers, quats, jnp.asarray(ts, jnp.float32), images, GEOM, CAM, cfg,
        mesh,
    )
    for key in ("ortho", "elevation_angle", "observation_index",
                "num_observations"):
        np.testing.assert_allclose(
            np.asarray(sharded[key]), np.asarray(single[key]), atol=1e-4,
            equal_nan=True, err_msg=key,
        )


def test_sharded_map_step_bit_identical_and_scaled_down():
    """Fused routed step on a (2, 4) mesh: stereo (ring frames) -> owner-
    routed DSM (halo strips) -> band-culled ortho must be BIT-identical to
    the single-device composition, while per-device operand bytes shrink.
    """
    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.dsm import update_elevation_layer
    from aerial_mapper_tpu.parallel.sharded import (
        band_image_operands,
        prepare_ring_pair_operands,
        sharded_map_step,
    )
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    mesh = make_mesh(("pairs", "tiles"), shape=(2, 4))
    # taller map than one camera footprint so the band cull has bite
    geom = MapGeometry(center_easting=40.0, center_northing=0.0,
                       resolution=1.0, height=128, width=48)
    cam = Camera(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160, height=120)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=3.0)
    Rs, ts = make_survey_poses(9, altitude=474.0, spacing=8.0)
    images = jnp.stack(
        [
            render_image(scene, cam, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
    ortho_cfg = OrthoBackwardGridConfig(cell_chunk=256)
    bm_cfg = BlockMatchingConfig(num_disparities=32)
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ts_j = jnp.asarray(ts, jnp.float32)

    ring = prepare_ring_pair_operands(cam.K, Rs, ts, list(images))
    assert ring.frames.shape[0] == 8  # divisible by the 8 devices
    banded = band_image_operands(
        geom, 4, np.asarray(quats), np.asarray(ts), np.asarray(images),
        cam, elev_min=395.0, elev_max=435.0,
    )
    layers = dict(create_map_state(geom).layers)
    out, diag = sharded_map_step(
        layers, ring, banded, geom, cam, dsm_cfg, ortho_cfg, mesh,
        bm_cfg=bm_cfg,
    )
    diag.check(395.0, 435.0)  # routing overflow + band-cull slab validity

    # single-device composition of the same step
    ops = prepare_pair_operands(cam.K, Rs, ts, list(images))
    pts, _intens, valid = process_pairs_batched(
        ops, cam, matcher="bm", bm_cfg=bm_cfg, batch_chunk=1)
    single = update_elevation_layer(
        dict(create_map_state(geom).layers), pts.reshape(-1, 3),
        valid.reshape(-1), geom, dsm_cfg)
    single = backward_grid_update(
        single, quats, ts_j, images, geom, cam, ortho_cfg)

    for key in ("elevation", "ortho", "elevation_angle",
                "observation_index", "num_observations"):
        a, b = np.asarray(out[key]), np.asarray(single[key])
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=key,
        )
    assert np.isfinite(np.asarray(out["elevation"])).mean() > 0.3

    # scale-down evidence: the routed/banded per-device operands are
    # strictly smaller than the replicated formulation's
    n_tiles, n_pairs = 4, 2
    hw = ring.frames.shape[1] * ring.frames.shape[2]
    n_total = ring.frames.shape[0] * hw
    cap = min(n_total // 8, int(-(-2.0 * (n_total // 8) // n_tiles)))
    routed_pts_per_dev = cap * n_tiles * n_pairs
    assert routed_pts_per_dev < n_total  # vs full-cloud all_gather
    # ring frames: one image per pair slot vs two
    assert ring.frames.nbytes + ring.tail.nbytes \
        < ops.image1.nbytes + ops.image2.nbytes
    # band cull: every band holds at most the full stack, and at this
    # geometry strictly fewer images than the stack for some band
    assert banded.images.shape[1] <= images.shape[0]
    assert (np.asarray(banded.ids) >= 0).sum() < 4 * images.shape[0]


def test_sharded_map_step_padded_bit_identical():
    """Awkward shapes through the built-in padding (VERDICT r2 weak #4):
    7 pairs padded to the 8 devices (pad_ring_pairs) and a 98-row map
    padded to 100 (pad_map_geometry) must still be BIT-identical to the
    single-device composition on the ORIGINAL shapes."""
    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.dsm import update_elevation_layer
    from aerial_mapper_tpu.parallel.sharded import (
        pad_map_geometry,
        pad_ring_pairs,
        prepare_ring_pair_operands,
        replicated_band_images,
        sharded_map_step,
    )
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    mesh = make_mesh(("pairs", "tiles"), shape=(2, 4))
    geom = MapGeometry(center_easting=40.0, center_northing=0.0,
                       resolution=1.0, height=98, width=48)
    cam = Camera(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160, height=120)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=3.0)
    Rs, ts = make_survey_poses(8, altitude=474.0, spacing=8.0)  # 7 pairs
    images = jnp.stack(
        [
            render_image(scene, cam, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
    ortho_cfg = OrthoBackwardGridConfig(cell_chunk=256)
    bm_cfg = BlockMatchingConfig(num_disparities=32)
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ts_j = jnp.asarray(ts, jnp.float32)

    geom_pad, pad_rows = pad_map_geometry(geom, 4)
    assert pad_rows == 2 and geom_pad.height == 100
    assert geom_pad.north == geom.north and geom_pad.west == geom.west
    ring = pad_ring_pairs(
        prepare_ring_pair_operands(cam.K, Rs, ts, list(images)), 8
    )
    assert ring.frames.shape[0] == 8
    assert not bool(ring.pair_valid[-1]) and bool(ring.pair_valid[0])
    banded = replicated_band_images(quats, ts_j, images)
    layers = dict(create_map_state(geom_pad).layers)
    out, diag = sharded_map_step(
        layers, ring, banded, geom_pad, cam, dsm_cfg, ortho_cfg, mesh,
        bm_cfg=bm_cfg,
    )
    diag.check()

    ops = prepare_pair_operands(cam.K, Rs, ts, list(images))
    pts, _intens, valid = process_pairs_batched(
        ops, cam, matcher="bm", bm_cfg=bm_cfg, batch_chunk=1)
    single = update_elevation_layer(
        dict(create_map_state(geom).layers), pts.reshape(-1, 3),
        valid.reshape(-1), geom, dsm_cfg)
    single = backward_grid_update(
        single, quats, ts_j, images, geom, cam, ortho_cfg)

    for key in ("elevation", "ortho", "elevation_angle",
                "observation_index", "num_observations"):
        a = np.asarray(out[key])[: geom.height]  # crop the pad rows
        b = np.asarray(single[key])
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=key,
        )
    assert np.isfinite(np.asarray(out["elevation"])[: geom.height]).mean() \
        > 0.3


def test_band_cull_distorted_camera():
    """VERDICT r2 #5: a radtan camera gets a per-band image subset
    STRICTLY smaller than the full stack (boundary-ray cull through the
    lens model instead of the old full-replication fallback), with
    bit-identical rasters vs the uncull (replicated every-band) run."""
    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.parallel.sharded import (
        band_image_operands,
        prepare_ring_pair_operands,
        replicated_band_images,
        sharded_map_step,
    )

    mesh = make_mesh(("pairs", "tiles"), shape=(2, 4))
    geom = MapGeometry(center_easting=40.0, center_northing=0.0,
                       resolution=1.0, height=192, width=48)
    cam = Camera(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                 height=120, dist_kind="radial-tangential",
                 dist_params=(-0.28, 0.07, 1e-4, -2e-4))
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=3.0)
    Rs, ts = make_survey_poses(9, altitude=474.0, spacing=8.0)
    images = jnp.stack(
        [
            render_image(scene, cam, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0, bin_capacity=8)
    ortho_cfg = OrthoBackwardGridConfig(cell_chunk=256)
    bm_cfg = BlockMatchingConfig(num_disparities=32)
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ts_j = jnp.asarray(ts, jnp.float32)
    ring = prepare_ring_pair_operands(cam.K, Rs, ts, list(images))

    banded = band_image_operands(
        geom, 4, np.asarray(quats), np.asarray(ts), np.asarray(images),
        cam, elev_min=395.0, elev_max=435.0,
    )
    # the cull has bite under distortion: band membership is strictly
    # below full replication, with whole bands skipping the stack
    ids = np.asarray(banded.ids)
    assert (ids >= 0).sum() < 4 * images.shape[0]
    assert min((ids[t] >= 0).sum() for t in range(4)) < images.shape[0]

    layers = dict(create_map_state(geom).layers)
    out_c, diag_c = sharded_map_step(
        layers, ring, banded, geom, cam, dsm_cfg, ortho_cfg, mesh,
        bm_cfg=bm_cfg,
    )
    diag_c.check(395.0, 435.0)
    out_r, diag_r = sharded_map_step(
        layers, ring, replicated_band_images(quats, ts_j, images), geom,
        cam, dsm_cfg, ortho_cfg, mesh, bm_cfg=bm_cfg,
    )
    diag_r.check()
    for key in ("elevation", "ortho", "elevation_angle",
                "observation_index", "num_observations"):
        a, b = np.asarray(out_c[key]), np.asarray(out_r[key])
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=key,
        )
    assert (np.asarray(out_c["ortho"]) != 255.0).mean() > 0.1


@pytest.mark.parametrize("dist_kind,params", [
    ("radial-tangential", (-0.28, 0.07, 1e-4, -2e-4)),
    ("equidistant", (0.08, -0.03, 0.015, -0.008)),
])
def test_band_cull_conservative_under_distortion(dist_kind, params):
    """The boundary-ray cull must be CONSERVATIVE for every lens model: if
    any cell of a band at any slab elevation projects visibly into an
    image (the exact predicate the ortho pass uses,
    ortho-backward-grid.cc:74-81 via camera.models.project), that image
    must be a member of the band."""
    from aerial_mapper_tpu.camera.models import project
    from aerial_mapper_tpu.geo.se3 import quat_conjugate, quat_to_matrix
    from aerial_mapper_tpu.parallel.sharded import band_image_operands

    geom = MapGeometry(center_easting=40.0, center_northing=0.0,
                       resolution=1.0, height=192, width=48)
    cam = Camera(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160,
                 height=120, dist_kind=dist_kind, dist_params=params)
    Rs, ts = make_survey_poses(9, altitude=474.0, spacing=8.0)
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    n_tiles, n = 4, len(Rs)
    banded = band_image_operands(
        geom, n_tiles, quats, ts, np.zeros((n, 4, 4), np.float32), cam,
        elev_min=395.0, elev_max=435.0,
    )
    ids = np.asarray(banded.ids)
    members = [set(ids[t][ids[t] >= 0].tolist()) for t in range(n_tiles)]
    # cull has bite
    assert sum(len(m) for m in members) < n_tiles * n

    # oracle: project every band cell (x slab ends) into every camera
    ce, cn = cell_centers(geom)
    band_h = geom.height // n_tiles
    R_cw = np.asarray(quat_to_matrix(quat_conjugate(
        jnp.asarray(quats, jnp.float32))))
    for t in range(n_tiles):
        rows = slice(t * band_h, (t + 1) * band_h)
        for z0 in (395.0, 435.0):
            cells = np.stack(
                [np.asarray(ce)[rows].ravel(), np.asarray(cn)[rows].ravel(),
                 np.full(band_h * geom.width, z0)], axis=1)
            for i in range(n):
                p_c = (cells - np.asarray(ts)[i]) @ np.asarray(R_cw[i]).T
                _uv, vis = project(cam, jnp.asarray(p_c, jnp.float32))
                if bool(np.asarray(vis).any()):
                    assert i in members[t], \
                        f"band {t} culled visible image {i} ({dist_kind})"


def test_sharded_process_pairs_matches_batched():
    """Pair-data-parallel batch stereo (ring frames over 8 devices, 6
    real pairs padded to 8) is bit-identical per pair to the sequential
    batched path."""
    from aerial_mapper_tpu.config import BlockMatchingConfig
    from aerial_mapper_tpu.parallel.sharded import (
        pad_ring_pairs,
        prepare_ring_pair_operands,
        sharded_process_pairs,
    )
    from aerial_mapper_tpu.stereo.batched import (
        prepare_pair_operands,
        process_pairs_batched,
    )

    mesh = make_mesh(("tiles",))
    cam = Camera(fx=160.0, fy=160.0, cx=80.0, cy=60.0, width=160, height=120)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=3.0)
    Rs, ts = make_survey_poses(7, altitude=474.0, spacing=8.0)  # 6 pairs
    images = [
        render_image(scene, cam, jnp.asarray(R, jnp.float32),
                     jnp.asarray(t, jnp.float32))
        for R, t in zip(Rs, ts)
    ]
    bm_cfg = BlockMatchingConfig(num_disparities=32)
    ring = pad_ring_pairs(
        prepare_ring_pair_operands(cam.K, Rs, ts, images), 8
    )
    pts_s, int_s, val_s = sharded_process_pairs(ring, cam, mesh,
                                                bm_cfg=bm_cfg)
    ops = prepare_pair_operands(cam.K, Rs, ts, images)
    pts_b, int_b, val_b = process_pairs_batched(ops, cam, matcher="bm",
                                                bm_cfg=bm_cfg,
                                                batch_chunk=1)
    np.testing.assert_array_equal(np.asarray(val_s[:6]), np.asarray(val_b))
    a, b = np.asarray(pts_s[:6]), np.asarray(pts_b)
    np.testing.assert_array_equal(
        np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b)
    )
    np.testing.assert_array_equal(np.asarray(int_s[:6]), np.asarray(int_b))
    assert not np.asarray(val_s[6:]).any()  # padding slots are dead


def test_step_diagnostics_check():
    """The fused step's validity signals: routing overflow and band-cull
    slab violations raise; in-slab ranges (and sentinel +/-inf on an
    all-NaN map, which violates any finite slab) behave as documented."""
    from aerial_mapper_tpu.parallel.sharded import StepDiagnostics

    ok = StepDiagnostics(jnp.int32(0), jnp.float32(410.0),
                         jnp.float32(420.0))
    ok.check()
    ok.check(405.0, 425.0)
    with pytest.raises(RuntimeError, match="dropped 3 routed points"):
        StepDiagnostics(jnp.int32(3), jnp.float32(410.0),
                        jnp.float32(420.0)).check()
    with pytest.raises(RuntimeError, match="escapes the band-cull slab"):
        ok.check(411.0, 425.0)
    with pytest.raises(RuntimeError, match="escapes the band-cull slab"):
        ok.check(405.0, 419.0)
    # all-NaN map yields +/-inf sentinels: passes the bare check, fails
    # any finite slab (a cull on an empty map has nothing to texture, but
    # the signal stays conservative)
    empty = StepDiagnostics(jnp.int32(0), jnp.float32(jnp.inf),
                            jnp.float32(-jnp.inf))
    empty.check()


def test_sharded_homography_mosaic_matches_single_device():
    """Image-sharded feather mosaic: the blend is a commutative weighted
    sum, so sharding images over 8 devices + two psums must match the
    sequential scan up to float summation order (7 images also exercises
    the masked padding slot)."""
    from aerial_mapper_tpu.config import OrthoHomographyConfig
    from aerial_mapper_tpu.ortho.homography import homography_mosaic_batch
    from aerial_mapper_tpu.parallel.sharded import (
        sharded_homography_mosaic_batch,
    )

    mesh = make_mesh(("tiles",))
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=3.0)
    Rs, ts = make_survey_poses(7, altitude=514.0, spacing=8.0)
    images = jnp.stack(
        [
            render_image(scene, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ts_j = jnp.asarray(ts, jnp.float32)
    cfg = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0, width_mosaic_pixels=96,
        height_mosaic_pixels=64, resolution=1.0,
        origin=(24.0, 0.0, 414.0), auto_window=False,
    )
    single = np.asarray(homography_mosaic_batch(
        images, quats, ts_j, CAM, cfg, needs_undistortion=False))
    sharded = np.asarray(sharded_homography_mosaic_batch(
        images, quats, ts_j, CAM, cfg, mesh, needs_undistortion=False))
    assert (single > 0).mean() > 0.3
    np.testing.assert_allclose(sharded, single, atol=5e-3)


def test_batch_driver_auto_shard_matches_single_device():
    """run_dsm/run_ortho_backward_grid auto-shard over the virtual mesh and
    must produce the same rasters as the forced single-device path."""
    import dataclasses
    import sys

    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_end_to_end import make_dataset, pipeline_config

    from aerial_mapper_tpu.pipeline.batch import run_ortho_backward_grid

    dataset = make_dataset(n=6)
    cfg = pipeline_config()
    layers_sh, _ = run_ortho_backward_grid(dataset, cfg)  # auto_shard=True
    layers_single, _ = run_ortho_backward_grid(
        dataset, dataclasses.replace(cfg, auto_shard=False)
    )
    for name in ("elevation", "ortho", "elevation_angle",
                 "observation_index"):
        a = np.asarray(layers_sh[name])
        b = np.asarray(layers_single[name])
        np.testing.assert_array_equal(
            np.where(np.isnan(a), -1.0, a), np.where(np.isnan(b), -1.0, b),
            err_msg=name,
        )
