"""Ortho backend tests: backward-grid parity vs reference loop, homography
mosaic ground-truth accuracy, ortho-from-points IDW."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.config import (
    OrthoBackwardGridConfig,
    OrthoFromPclConfig,
    OrthoHomographyConfig,
)
from aerial_mapper_tpu.geo.se3 import matrix_to_quat
from aerial_mapper_tpu.mapgrid import MapGeometry, cell_centers, create_map_state
from aerial_mapper_tpu.ortho import (
    backward_grid_update,
    homography_mosaic_batch,
    ortho_from_points,
)
from aerial_mapper_tpu.synth import SyntheticScene, make_survey_poses, render_image
from aerial_mapper_tpu.testing.numpy_ref import backward_grid_reference, idw_reference

CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
SCENE = SyntheticScene(base_elevation=414.0, relief_amplitude=4.0)
GEOM = MapGeometry(center_easting=40.0, center_northing=0.0, resolution=1.0,
                   height=48, width=64)


def synth_views(n=6, altitude=514.0, spacing=15.0):
    Rs, ts = make_survey_poses(n, altitude=altitude, spacing=spacing)
    images = jnp.stack(
        [
            render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    return Rs, ts, images


def test_backward_grid_parity_with_reference_loop():
    Rs, ts, images = synth_views()
    state = create_map_state(GEOM)
    # known elevation: analytic terrain
    ce, cn = cell_centers(GEOM)
    elev = SCENE.height(ce, cn)
    layers = dict(state.layers)
    layers["elevation"] = elev

    quats = jnp.asarray(
        matrix_to_quat(jnp.asarray(Rs, jnp.float32)), jnp.float32
    )
    out = backward_grid_update(
        layers, quats, jnp.asarray(ts, jnp.float32), images,
        GEOM, CAM, OrthoBackwardGridConfig(cell_chunk=512),
    )

    cells = np.stack(
        [np.asarray(ce).ravel(), np.asarray(cn).ravel(),
         np.asarray(elev).ravel()], axis=1
    )
    ref_ortho, ref_angle, ref_obs = backward_grid_reference(
        cells, Rs, ts, np.asarray(images), CAM.K
    )

    got_angle = np.asarray(out["elevation_angle"]).ravel()
    got_obs = np.asarray(out["observation_index"]).ravel()
    got_ortho = np.asarray(out["ortho"]).ravel()

    seen = ref_obs >= 0
    assert seen.mean() > 0.5
    np.testing.assert_allclose(got_angle[seen], ref_angle[seen], atol=1e-4)
    # angle ties at float precision can flip the chosen image; require match
    # on the overwhelming majority and identical texel values elsewhere
    same_idx = got_obs[seen] == ref_obs[seen]
    assert same_idx.mean() > 0.99
    np.testing.assert_allclose(
        got_ortho[seen][same_idx], ref_ortho[seen][same_idx], atol=1e-3
    )
    # unseen cells untouched (ortho init 255, angle 0, obs NaN)
    assert np.all(got_ortho[~seen] == 255.0)
    assert np.all(np.isnan(got_obs[~seen]))


def test_backward_grid_incremental_equals_batch():
    """Two sequential half-batches must equal one full batch (the
    best-angle layer makes updates idempotent/order-independent,
    ortho-backward-grid.cc:180-183)."""
    Rs, ts, images = synth_views()
    ce, cn = cell_centers(GEOM)
    elev = SCENE.height(ce, cn)
    layers = dict(create_map_state(GEOM).layers)
    layers["elevation"] = elev
    cfg = OrthoBackwardGridConfig(cell_chunk=512)
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ts_j = jnp.asarray(ts, jnp.float32)

    full = backward_grid_update(layers, quats, ts_j, images, GEOM, CAM, cfg)

    half1 = backward_grid_update(
        layers, quats[:3], ts_j[:3], images[:3], GEOM, CAM, cfg
    )
    half2 = backward_grid_update(
        half1, quats[3:], ts_j[3:], images[3:], GEOM, CAM, cfg
    )
    np.testing.assert_allclose(
        np.asarray(full["ortho"]), np.asarray(half2["ortho"]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(full["elevation_angle"]),
        np.asarray(half2["elevation_angle"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(full["num_observations"]),
        np.asarray(half2["num_observations"]),
    )


def test_backward_grid_flat_plane_mode():
    Rs, ts, images = synth_views()
    layers = dict(create_map_state(GEOM).layers)  # elevation all NaN
    cfg = OrthoBackwardGridConfig(
        use_digital_elevation_map=False, orthomosaic_elevation_m=414.0,
        cell_chunk=512,
    )
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    out = backward_grid_update(
        layers, quats, jnp.asarray(ts, jnp.float32), images, GEOM, CAM, cfg
    )
    ortho = np.asarray(out["ortho"])
    assert (ortho != 255.0).mean() > 0.5  # most cells textured


def test_homography_mosaic_matches_ground_truth_texture():
    """Flat scene -> the mosaic must reproduce the analytic ground texture."""
    flat = SyntheticScene(base_elevation=414.0, relief_amplitude=0.0)
    Rs, ts = make_survey_poses(8, altitude=514.0, spacing=12.0)
    images = jnp.stack(
        [
            render_image(flat, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    cfg = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0,
        width_mosaic_pixels=128,
        height_mosaic_pixels=96,
        resolution=1.0,
        origin=(45.0, 0.0, 0.0),
    )
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    mosaic = homography_mosaic_batch(
        images, quats, jnp.asarray(ts, jnp.float32), CAM, cfg,
        needs_undistortion=False,
    )
    mosaic = np.asarray(mosaic)

    # ground truth texture at mosaic pixel centers
    col = np.arange(128)[None, :].repeat(96, 0)
    row = np.arange(96)[:, None].repeat(128, 1)
    e = cfg.origin[0] + (col - 64 + 0.5) * 1.0
    n = cfg.origin[1] + (48 - row - 0.5) * 1.0
    tex = np.asarray(flat.texture(jnp.asarray(e), jnp.asarray(n)))

    observed = mosaic > 0
    assert observed.mean() > 0.4
    err = np.abs(mosaic[observed] - tex[observed])
    # nearest-neighbor sampling at 1 m/px of a smooth texture: small error
    assert np.median(err) < 12.0, f"median mosaic err {np.median(err)}"
    # unobserved pixels exactly 0 (reference masks them, cc:179-188)
    assert np.all(mosaic[~observed] == 0.0)


def test_homography_windowed_accumulate_matches_full():
    """The per-image bbox window skips only zero-weight pixels, so the
    windowed mosaic must equal the full-mosaic warp bit for bit."""
    import dataclasses

    flat = SyntheticScene(base_elevation=414.0, relief_amplitude=0.0)
    Rs, ts = make_survey_poses(8, altitude=514.0, spacing=12.0)
    images = jnp.stack(
        [
            render_image(flat, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    cfg_full = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0,
        width_mosaic_pixels=256,
        height_mosaic_pixels=256,
        resolution=1.0,
        origin=(45.0, 0.0, 0.0),
    )
    # the 320x240 camera 100 m above the plane at 1 m/px -> ~100x75 px
    # footprint; 128x128 covers it with margin
    cfg_win = dataclasses.replace(cfg_full, window_rows=128, window_cols=128)
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    full = np.asarray(homography_mosaic_batch(
        images, quats, jnp.asarray(ts, jnp.float32), CAM, cfg_full,
        needs_undistortion=False,
    ))
    win = np.asarray(homography_mosaic_batch(
        images, quats, jnp.asarray(ts, jnp.float32), CAM, cfg_win,
        needs_undistortion=False,
    ))
    assert (full > 0).mean() > 0.1
    np.testing.assert_array_equal(win, full)


def test_homography_auto_window_driver_sizing():
    """_homography_auto_window must cover every footprint (windowed run
    equals full run) and reject below-horizon poses."""
    import dataclasses

    from aerial_mapper_tpu.pipeline.batch import _homography_auto_window

    flat = SyntheticScene(base_elevation=414.0, relief_amplitude=0.0)
    Rs, ts = make_survey_poses(6, altitude=514.0, spacing=15.0)
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    cfg = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0, width_mosaic_pixels=256,
        height_mosaic_pixels=256, resolution=1.0, origin=(45.0, 0.0, 0.0),
    )
    win = _homography_auto_window(cfg, CAM, quats, np.asarray(ts))
    assert win is not None
    wr, wc = win
    assert 0 < wr <= 256 and 0 < wc <= 256

    images = jnp.stack(
        [
            render_image(flat, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    qj = jnp.asarray(quats, jnp.float32)
    tj = jnp.asarray(ts, jnp.float32)
    full = np.asarray(homography_mosaic_batch(
        images, qj, tj, CAM, cfg, needs_undistortion=False))
    win_cfg = dataclasses.replace(cfg, window_rows=wr, window_cols=wc)
    winm = np.asarray(homography_mosaic_batch(
        images, qj, tj, CAM, win_cfg, needs_undistortion=False))
    np.testing.assert_array_equal(winm, full)

    # a camera looking at the horizon has an unbounded footprint
    R_horiz = np.array([[1.0, 0.0, 0.0],
                        [0.0, 0.0, -1.0],
                        [0.0, 1.0, 0.0]])  # optical axis along +north
    q_h = np.asarray(matrix_to_quat(jnp.asarray(R_horiz[None], jnp.float32)))
    assert _homography_auto_window(
        cfg, CAM, q_h, np.array([[0.0, 0.0, 514.0]])
    ) is None

    # footprint + margin larger than the mosaic on an axis: must return
    # None (full path) — capping the window would make the runtime
    # fit-check silently drop the whole image (found by code review)
    tiny = dataclasses.replace(cfg, width_mosaic_pixels=64,
                               height_mosaic_pixels=64)
    assert _homography_auto_window(tiny, CAM, quats, np.asarray(ts)) is None


def test_homography_windowed_exact_on_fine_mosaic():
    """Fine-resolution repro from code review: INTER_NEAREST accepts
    source coords half a pixel beyond the corner rectangle, so the bbox
    must come from the expanded [-0.5, W-0.5] corners — on a mosaic finer
    than ~2 px per image pixel the unexpanded bbox dropped real fringe
    texels."""
    import dataclasses

    from aerial_mapper_tpu.camera import Camera
    from aerial_mapper_tpu.pipeline.batch import _homography_auto_window

    small_cam = Camera(fx=64.0, fy=64.0, cx=32.0, cy=24.0,
                       width=64, height=48)
    flat = SyntheticScene(base_elevation=414.0, relief_amplitude=0.0)
    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=15.0)
    images = jnp.stack(
        [
            render_image(flat, small_cam, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    # GSD ~1.56 m/px at 100 m; mosaic at 0.25 m/px = 6 mosaic px per
    # image px — far past the fringe threshold
    cfg = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0, width_mosaic_pixels=1024,
        height_mosaic_pixels=1024, resolution=0.25, origin=(22.0, 0.0, 0.0),
    )
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    win = _homography_auto_window(cfg, small_cam, quats, np.asarray(ts))
    assert win is not None
    qj = jnp.asarray(quats, jnp.float32)
    tj = jnp.asarray(ts, jnp.float32)
    full = np.asarray(homography_mosaic_batch(
        images, qj, tj, small_cam, cfg, needs_undistortion=False))
    winm = np.asarray(homography_mosaic_batch(
        images, qj, tj, small_cam,
        dataclasses.replace(cfg, window_rows=win[0], window_cols=win[1]),
        needs_undistortion=False))
    assert (full > 0).mean() > 0.05
    np.testing.assert_array_equal(winm, full)


def test_ortho_from_points_parity(rng):
    n = 400
    pts = np.stack(
        [
            rng.uniform(GEOM.west, GEOM.west + 64, n),
            rng.uniform(GEOM.north - 48, GEOM.north, n),
            rng.uniform(400, 430, n),
        ],
        axis=1,
    )
    intens = rng.uniform(0, 255, n)
    layers = dict(create_map_state(GEOM).layers)
    cfg = OrthoFromPclConfig(
        interpolation_radius_sq=2.0, use_adaptive_interpolation=False,
        bin_capacity=32,
    )
    out = ortho_from_points(
        layers,
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(intens, jnp.float32),
        jnp.ones(n, bool),
        GEOM,
        cfg,
    )
    ce, cn = cell_centers(GEOM)
    centers = np.stack([np.asarray(ce).ravel(), np.asarray(cn).ravel()], 1)
    ref_vals, ref_hit = idw_reference(
        pts[:, :2], intens, centers, radius_sq=2.0, adaptive=False,
        growth=10.0, max_radius_sq=1e4,
    )
    got = np.asarray(out["ortho"]).ravel()
    np.testing.assert_array_equal(
        (got != 255.0) | ref_hit, ref_hit | (got != 255.0)
    )
    np.testing.assert_allclose(got[ref_hit], ref_vals[ref_hit], rtol=2e-4,
                               atol=5e-2)


def test_ortho_from_points_unbounded_growth_parity(rng):
    """VERDICT r2 #6: ``max_radius_sq=None`` reproduces the reference's
    UNBOUNDED adaptive growth (ortho-from-pcl.cc:63-71) — on a sparse
    cloud the capped run leaves cells empty that the unbounded run fills,
    and the unbounded values match the numpy loop oracle exactly."""
    import dataclasses

    n = 12  # sparse: most of the 64x48 map is far from every point
    pts = np.stack(
        [
            rng.uniform(GEOM.west, GEOM.west + 12, n),
            rng.uniform(GEOM.north - 10, GEOM.north, n),
            np.full(n, 414.0),
        ],
        axis=1,
    )
    intens = rng.uniform(0, 255, n)
    layers = dict(create_map_state(GEOM).layers)
    cfg = OrthoFromPclConfig(
        interpolation_radius_sq=2.0, use_adaptive_interpolation=True,
        adaptive_growth_factor=10.0, max_radius_sq=None, bin_capacity=32,
    )
    out = ortho_from_points(
        layers, jnp.asarray(pts, jnp.float32), jnp.asarray(intens, jnp.float32),
        jnp.ones(n, bool), GEOM, cfg,
    )
    got = np.asarray(out["ortho"]).ravel()

    capped = ortho_from_points(
        layers, jnp.asarray(pts, jnp.float32), jnp.asarray(intens, jnp.float32),
        jnp.ones(n, bool), GEOM,
        dataclasses.replace(cfg, max_radius_sq=25.0),
    )
    got_capped = np.asarray(capped["ortho"]).ravel()

    ce, cn = cell_centers(GEOM)
    centers = np.stack([np.asarray(ce).ravel(), np.asarray(cn).ravel()], 1)
    ref_vals, ref_hit = idw_reference(
        pts[:, :2], intens, centers, radius_sq=2.0, adaptive=True,
        growth=10.0, max_radius_sq=None,
    )
    # the reference's unbounded loop fills EVERY cell of a non-empty cloud
    assert ref_hit.all()
    assert (got != 255.0).all()
    # and the capped run demonstrably differs (cells left at the 255 init)
    assert (got_capped == 255.0).sum() > 100
    np.testing.assert_allclose(got, ref_vals, rtol=2e-4, atol=5e-2)


def test_backward_grid_colored_ortho():
    from aerial_mapper_tpu.image.color import unpack_float_to_rgb

    Rs, ts, images_gray = synth_views(4)
    # synthesize RGB by tinting the gray renders
    images_rgb = jnp.stack(
        [jnp.stack([g, 0.5 * g, 0.25 * g], axis=-1) for g in images_gray]
    )
    ce, cn = cell_centers(GEOM)
    layers = dict(create_map_state(GEOM).layers)
    layers["elevation"] = SCENE.height(ce, cn)
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    out = backward_grid_update(
        layers, quats, jnp.asarray(ts, jnp.float32), images_rgb,
        GEOM, CAM, OrthoBackwardGridConfig(colored_ortho=True),
    )
    packed = out["colored_ortho"]
    textured = np.isfinite(np.asarray(packed))
    assert textured.mean() > 0.5
    rgb = np.asarray(unpack_float_to_rgb(packed))
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    m = textured & (r > 0.05)
    # the tint ratios survive the pack/unpack roundtrip
    np.testing.assert_allclose(g[m] / r[m], 0.5, atol=0.04)
    np.testing.assert_allclose(b[m] / r[m], 0.25, atol=0.04)
    # gray ortho layer untouched in colored mode
    assert (np.asarray(out["ortho"]) == 255.0).all()


def test_homography_incremental_updates_match_batch():
    from aerial_mapper_tpu.ortho.homography import (
        create_mosaic_state,
        homography_mosaic_update,
    )

    flat = SyntheticScene(base_elevation=414.0, relief_amplitude=0.0)
    Rs, ts = make_survey_poses(4, altitude=514.0, spacing=12.0)
    images = jnp.stack(
        [
            render_image(flat, CAM, jnp.asarray(R, jnp.float32),
                         jnp.asarray(t, jnp.float32))
            for R, t in zip(Rs, ts)
        ]
    )
    cfg = OrthoHomographyConfig(
        ground_plane_elevation_m=414.0, width_mosaic_pixels=96,
        height_mosaic_pixels=64, resolution=1.0, origin=(20.0, 0.0, 0.0),
    )
    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    ts_j = jnp.asarray(ts, jnp.float32)

    batch = homography_mosaic_batch(images, quats, ts_j, CAM, cfg,
                                    needs_undistortion=False)
    state = create_mosaic_state(cfg)
    for i in range(4):
        state = homography_mosaic_update(
            state, images[i], quats[i], ts_j[i], CAM, cfg,
            needs_undistortion=False,
        )
    np.testing.assert_allclose(
        np.asarray(state.mosaic), np.asarray(batch), atol=1e-3
    )

    # incremental with a per-image window: identical to the full-path
    # batch (shared _warp_feather body). Needs a mosaic larger than the
    # ~100x75 px footprint so the window genuinely sub-sets it.
    import dataclasses

    big = dataclasses.replace(cfg, width_mosaic_pixels=256,
                              height_mosaic_pixels=256)
    wcfg = dataclasses.replace(big, window_rows=128, window_cols=128)
    batch_big = homography_mosaic_batch(images, quats, ts_j, CAM, big,
                                        needs_undistortion=False)
    state_w = create_mosaic_state(wcfg)
    for i in range(4):
        state_w = homography_mosaic_update(
            state_w, images[i], quats[i], ts_j[i], CAM, wcfg,
            needs_undistortion=False,
        )
    assert (np.asarray(batch_big) > 0).mean() > 0.1
    np.testing.assert_array_equal(
        np.asarray(state_w.mosaic), np.asarray(batch_big)
    )


def test_backward_grid_uint8_images_identical_to_float():
    """uint8 image stacks (the native loader's output format) must texture
    identically to the same values as float32 — the texel gather fetches
    native-dtype bytes and upcasts only the per-cell winners."""
    Rs, ts, images = synth_views()
    img_u8 = jnp.clip(jnp.round(images), 0.0, 255.0).astype(jnp.uint8)
    img_f32 = img_u8.astype(jnp.float32)

    ce, cn = cell_centers(GEOM)
    layers = dict(create_map_state(GEOM).layers)
    layers["elevation"] = SCENE.height(ce, cn)
    quats = jnp.asarray(
        matrix_to_quat(jnp.asarray(Rs, jnp.float32)), jnp.float32
    )
    cfg = OrthoBackwardGridConfig()
    out_u8 = backward_grid_update(
        dict(layers), quats, jnp.asarray(ts, jnp.float32), img_u8,
        GEOM, CAM, cfg,
    )
    out_f32 = backward_grid_update(
        dict(layers), quats, jnp.asarray(ts, jnp.float32), img_f32,
        GEOM, CAM, cfg,
    )
    for name in ("ortho", "elevation_angle", "observation_index",
                 "num_observations"):
        np.testing.assert_array_equal(
            np.asarray(out_u8[name]), np.asarray(out_f32[name]),
            err_msg=name,
        )
