"""Plane-sweep multi-view densifier (stereo/plane_sweep.py) — capability
extension beyond the reference's consecutive-pair stereo: N-view
elevation-plane sweep with sub-plane parabolic refinement."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.config import (
    DsmConfig,
    GridMapConfig,
    PipelineConfig,
    PlaneSweepConfig,
    StereoConfig,
)
from aerial_mapper_tpu.stereo.plane_sweep import (
    plane_sweep_elevation,
    process_sequence_plane_sweep,
)
from aerial_mapper_tpu.synth import (
    SyntheticScene,
    make_survey_poses,
    render_image,
)

CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
SCENE = SyntheticScene(base_elevation=414.0, relief_amplitude=5.0)


def _survey(n=5, cam=CAM, **render_kw):
    Rs, ts = make_survey_poses(n, altitude=514.0, spacing=8.0)
    images = [
        render_image(SCENE, cam, jnp.asarray(R, jnp.float32),
                     jnp.asarray(t, jnp.float32), **render_kw)
        for R, t in zip(Rs, ts)
    ]
    return Rs, ts, images


def test_plane_sweep_subplane_accuracy():
    """The winning elevation refines BETWEEN the 1 m-spaced planes:
    median error well under the plane spacing vs the analytic terrain."""
    Rs, ts, images = _survey()
    cfg = PlaneSweepConfig(z_min=399.0, z_max=429.0, num_planes=31,
                           num_neighbors=2, max_cost=8.0)
    R_cw = np.transpose(Rs, (0, 2, 1))
    res = plane_sweep_elevation(
        images[2], jnp.asarray(Rs[2], jnp.float32),
        jnp.asarray(ts[2], jnp.float32),
        jnp.stack([images[1], images[3]]),
        jnp.asarray(R_cw[[1, 3]], jnp.float32),
        jnp.asarray(ts[[1, 3]], jnp.float32), CAM, cfg)
    elev = np.asarray(res.elevation)
    valid = np.isfinite(elev)
    assert valid.mean() > 0.8
    pts = np.asarray(res.points).reshape(240, 320, 3)
    true_h = np.asarray(SCENE.height(jnp.asarray(pts[..., 0]),
                                     jnp.asarray(pts[..., 1])))
    err = np.abs(elev - true_h)[valid]
    assert np.median(err) < 0.1, np.median(err)
    assert np.percentile(err, 90) < 0.4
    # points carry the reference intensities and consistent validity
    assert np.asarray(res.valid).reshape(240, 320).sum() == valid.sum()


def test_plane_sweep_distorted_camera():
    """The sweep projects through the full lens model (no homography
    shortcut), so a radtan camera works end-to-end."""
    cam = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                 height=240, dist_kind="radial-tangential",
                 dist_params=(-0.2, 0.05, 1e-4, -1e-4))
    Rs, ts, images = _survey(cam=cam, apply_distortion=True)
    cfg = PlaneSweepConfig(z_min=399.0, z_max=429.0, num_planes=31,
                           num_neighbors=2, max_cost=8.0)
    R_cw = np.transpose(Rs, (0, 2, 1))
    res = plane_sweep_elevation(
        images[2], jnp.asarray(Rs[2], jnp.float32),
        jnp.asarray(ts[2], jnp.float32),
        jnp.stack([images[1], images[3]]),
        jnp.asarray(R_cw[[1, 3]], jnp.float32),
        jnp.asarray(ts[[1, 3]], jnp.float32), cam, cfg)
    elev = np.asarray(res.elevation)
    valid = np.isfinite(elev)
    assert valid.mean() > 0.6
    pts = np.asarray(res.points).reshape(240, 320, 3)
    true_h = np.asarray(SCENE.height(jnp.asarray(pts[..., 0]),
                                     jnp.asarray(pts[..., 1])))
    err = np.abs(elev - true_h)[valid]
    assert np.median(err) < 0.15, np.median(err)


def test_plane_sweep_dsm_through_pipeline():
    """densifier='plane_sweep' drives the normal DSM pipeline: the binned
    IDW raster lands within 1 cell of the analytic terrain (the
    BASELINE.json acceptance bar), with multi-view coverage."""
    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.mapgrid.grid import cell_centers
    from aerial_mapper_tpu.pipeline.batch import run_dsm
    from aerial_mapper_tpu.pipeline.dataset import Dataset
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat

    Rs, ts, images = _survey()
    rig = CameraRig(cameras=(CAM,),
                    T_C_B_quats=np.array([[1.0, 0, 0, 0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                       np.float64)
    ds = Dataset(rig=rig, quats_G_B=quats, trans_G_B=np.asarray(ts),
                 images=[np.asarray(im) for im in images])
    cfg = PipelineConfig(
        auto_shard=False,
        grid=GridMapConfig(center_easting=16.0, center_northing=0.0,
                           delta_easting=60.0, delta_northing=50.0,
                           resolution=1.0),
        stereo=StereoConfig(use_every_nth_image=1, densifier="plane_sweep"),
        plane_sweep=PlaneSweepConfig(z_min=399.0, z_max=429.0,
                                     num_planes=31, num_neighbors=2,
                                     max_cost=8.0),
        dsm=DsmConfig(interpolation_radius_sq=2.0),
    )
    layers, geom = run_dsm(ds, cfg)
    elev = np.asarray(layers["elevation"])
    fin = np.isfinite(elev)
    assert fin.mean() > 0.9
    ce, cn = cell_centers(geom)
    true_h = np.asarray(SCENE.height(ce, cn))
    rmse = float(np.sqrt(np.mean((elev[fin] - true_h[fin]) ** 2)))
    assert rmse < 1.0, rmse
    assert abs(float(np.median(elev[fin] - true_h[fin]))) < 0.2


def test_plane_sweep_sequence_neighbors():
    """process_sequence_plane_sweep picks the nearest frames as neighbor
    views for each reference and concatenates the clouds."""
    Rs, ts, images = _survey(n=4)
    cfg = PlaneSweepConfig(z_min=404.0, z_max=424.0, num_planes=21,
                           num_neighbors=2)
    pts, intens, valid = process_sequence_plane_sweep(
        images, Rs, ts, CAM, cfg=cfg, use_every_nth=2)
    assert pts.shape == (2 * 240 * 320, 3)
    v = np.asarray(valid)
    assert v.mean() > 0.7
    z = np.asarray(pts)[:, 2][v]
    assert 404.0 <= np.median(z) <= 424.0


def test_sharded_plane_sweep_matches_sequential():
    """Reference views data-parallel over the 8-device mesh produce the
    same cloud as the sequential loop (padding slots masked invalid), and
    the same DSM raster."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from aerial_mapper_tpu.mapgrid.grid import MapGeometry, create_map_state
    from aerial_mapper_tpu.dsm import update_elevation_layer
    from aerial_mapper_tpu.parallel import make_mesh
    from aerial_mapper_tpu.parallel.sharded import sharded_plane_sweep
    from aerial_mapper_tpu.stereo.plane_sweep import (
        prepare_plane_sweep_operands,
    )

    Rs, ts, images = _survey(n=5)
    cfg = PlaneSweepConfig(z_min=399.0, z_max=429.0, num_planes=21,
                           num_neighbors=2, max_cost=8.0)
    seq_pts, seq_int, seq_valid = process_sequence_plane_sweep(
        images, Rs, ts, CAM, cfg=cfg, use_every_nth=1)

    ops = prepare_plane_sweep_operands(images, Rs, ts, cfg=cfg,
                                       use_every_nth=1, pad_to_multiple=8)
    mesh = make_mesh(("tiles",))
    sh_pts, sh_int, sh_valid = sharded_plane_sweep(ops, CAM, cfg, mesh)
    b_real = 5

    # invariant (CLAUDE.md): sharded == the SAME single-device program,
    # bit-identically — compare against plane_sweep_batched unsharded
    from aerial_mapper_tpu.stereo.plane_sweep import plane_sweep_batched

    one_pts, one_int, one_valid = plane_sweep_batched(ops, CAM, cfg)
    np.testing.assert_array_equal(np.asarray(sh_valid),
                                  np.asarray(one_valid))
    np.testing.assert_array_equal(np.asarray(sh_pts), np.asarray(one_pts))
    np.testing.assert_array_equal(np.asarray(sh_int), np.asarray(one_int))

    # the differently-traced per-view sequential path agrees to float
    # tolerance (vmap reassociates, so bit-equality is not expected here)
    np.testing.assert_array_equal(
        np.asarray(sh_valid[:b_real]).reshape(-1), np.asarray(seq_valid))
    v = np.asarray(seq_valid)
    np.testing.assert_allclose(
        np.asarray(sh_pts[:b_real]).reshape(-1, 3)[v],
        np.asarray(seq_pts)[v], atol=1e-4)
    # padding slots are fully masked
    assert not np.asarray(sh_valid[b_real:]).any()

    dsm_cfg = DsmConfig(interpolation_radius_sq=2.0)
    geom = MapGeometry(center_easting=16.0, center_northing=0.0,
                       resolution=1.0, height=48, width=64)
    base = dict(create_map_state(geom).layers)
    a = update_elevation_layer(
        dict(base), sh_pts.reshape(-1, 3), sh_valid.reshape(-1), geom,
        dsm_cfg)["elevation"]
    b = update_elevation_layer(
        dict(base), seq_pts, seq_valid, geom, dsm_cfg)["elevation"]
    a, b = np.asarray(a), np.asarray(b)
    both = np.isfinite(a) & np.isfinite(b)
    assert (np.isfinite(a) == np.isfinite(b)).mean() > 0.999
    np.testing.assert_allclose(a[both], b[both], atol=1e-3)


def test_plane_sweep_with_pipeline_undistortion():
    """--images_need_undistortion + plane_sweep: the pipeline undistorts
    the images FIRST, so the sweep must run with the pinhole model (a
    distorted camera here would undistort rays twice and sample neighbors
    at distorted positions — regression for the round-4 review)."""
    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.mapgrid.grid import cell_centers
    from aerial_mapper_tpu.pipeline.batch import run_dsm
    from aerial_mapper_tpu.pipeline.dataset import Dataset
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat

    cam = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                 height=240, dist_kind="radial-tangential",
                 dist_params=(-0.2, 0.05, 1e-4, -1e-4))
    Rs, ts, images = _survey(cam=cam, apply_distortion=True)
    rig = CameraRig(cameras=(cam,),
                    T_C_B_quats=np.array([[1.0, 0, 0, 0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                       np.float64)
    ds = Dataset(rig=rig, quats_G_B=quats, trans_G_B=np.asarray(ts),
                 images=[np.asarray(im) for im in images])
    cfg = PipelineConfig(
        auto_shard=False,
        grid=GridMapConfig(center_easting=16.0, center_northing=0.0,
                           delta_easting=50.0, delta_northing=40.0,
                           resolution=1.0),
        stereo=StereoConfig(use_every_nth_image=1,
                            densifier="plane_sweep",
                            images_need_undistortion=True),
        plane_sweep=PlaneSweepConfig(z_min=399.0, z_max=429.0,
                                     num_planes=31, num_neighbors=2,
                                     max_cost=8.0),
        dsm=DsmConfig(interpolation_radius_sq=2.0),
    )
    layers, geom = run_dsm(ds, cfg)
    elev = np.asarray(layers["elevation"])
    fin = np.isfinite(elev)
    assert fin.mean() > 0.8
    ce, cn = cell_centers(geom)
    true_h = np.asarray(SCENE.height(ce, cn))
    rmse = float(np.sqrt(np.mean((elev[fin] - true_h[fin]) ** 2)))
    assert rmse < 1.0, rmse


def test_incremental_driver_rejects_plane_sweep():
    """The incremental driver streams pair stereo (the reference's
    contract); asking it for the plane-sweep densifier raises a clear
    error instead of silently matching pairs."""
    import pytest

    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.pipeline.dataset import Dataset
    from aerial_mapper_tpu.pipeline.incremental import run_incremental

    rig = CameraRig(cameras=(CAM,),
                    T_C_B_quats=np.array([[1.0, 0, 0, 0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    ds = Dataset(rig=rig, quats_G_B=np.array([[1.0, 0, 0, 0]]),
                 trans_G_B=np.zeros((1, 3)),
                 images=[np.zeros((8, 8), np.float32)])
    cfg = PipelineConfig(stereo=StereoConfig(densifier="plane_sweep"))
    with pytest.raises(ValueError, match="batch drivers"):
        run_incremental(ds, cfg)


def test_neighbor_spacing_selection():
    """neighbor_spacing picks views at +-k*spacing frames, nearest first,
    clipped to the sequence; spacing=1 is plain nearest-in-sequence."""
    from aerial_mapper_tpu.stereo.plane_sweep import _neighbor_sets

    assert _neighbor_sets(9, [4], 2, spacing=1) == [[3, 5]]
    assert _neighbor_sets(9, [4], 4, spacing=1) == [[3, 5, 2, 6]]
    assert _neighbor_sets(9, [4], 2, spacing=3) == [[1, 7]]
    # clipped at the edges: falls back to farther multiples on one side
    assert _neighbor_sets(9, [0], 2, spacing=3) == [[3, 6]]
    assert _neighbor_sets(9, [8], 2, spacing=3) == [[5, 2]]
    # spacing larger than the sequence yields what exists
    assert _neighbor_sets(3, [0], 2, spacing=5) == [[]]


def test_auto_z_range_brackets_terrain():
    """VERDICT r4 #4: with z_min/z_max unset, the BM-prepass auto range
    brackets the synthetic terrain (base 414 +- 5 m relief) with margin,
    stays robust to the prepass's disparity-outlier tail, and the DSM
    pipeline runs end-to-end with NO hand-set z flags at the same
    accuracy bar."""
    import dataclasses

    from aerial_mapper_tpu.stereo.plane_sweep import (
        auto_z_range,
        resolve_z_range,
        warn_boundary_pileup,
    )

    Rs, ts, images = _survey()
    lo, hi = auto_z_range(images, Rs, ts, CAM)
    assert lo < 409.0 - 1.0 and hi > 419.0 + 1.0, (lo, hi)
    # margin is bounded: the range must not balloon to the outlier tail
    assert hi - lo < 80.0, (lo, hi)

    # resolve_z_range is a no-op when both bounds are set...
    cfg_set = PlaneSweepConfig(z_min=399.0, z_max=429.0)
    assert resolve_z_range(cfg_set, images, Rs, ts, CAM) is cfg_set
    # ...and fills only the missing bound otherwise
    cfg_half = resolve_z_range(
        PlaneSweepConfig(z_min=400.0), images, Rs, ts, CAM)
    assert cfg_half.z_min == 400.0 and cfg_half.z_max == hi

    # end-to-end: the default (auto) config through run_dsm
    from aerial_mapper_tpu.camera.rig import CameraRig
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat
    from aerial_mapper_tpu.mapgrid.grid import cell_centers
    from aerial_mapper_tpu.pipeline.batch import run_dsm
    from aerial_mapper_tpu.pipeline.dataset import Dataset

    rig = CameraRig(cameras=(CAM,),
                    T_C_B_quats=np.array([[1.0, 0, 0, 0]]),
                    T_C_B_trans=np.zeros((1, 3)))
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)),
                       np.float64)
    ds = Dataset(rig=rig, quats_G_B=quats, trans_G_B=np.asarray(ts),
                 images=[np.asarray(im) for im in images])
    cfg = PipelineConfig(
        auto_shard=False,
        grid=GridMapConfig(center_easting=16.0, center_northing=0.0,
                           delta_easting=60.0, delta_northing=50.0,
                           resolution=1.0),
        stereo=StereoConfig(use_every_nth_image=1, densifier="plane_sweep"),
        plane_sweep=PlaneSweepConfig(num_neighbors=2, max_cost=8.0),
        dsm=DsmConfig(interpolation_radius_sq=2.0),
    )
    layers, geom = run_dsm(ds, cfg)
    elev = np.asarray(layers["elevation"])
    fin = np.isfinite(elev)
    assert fin.mean() > 0.9
    ce, cn = cell_centers(geom)
    true_h = np.asarray(SCENE.height(ce, cn))
    rmse = float(np.sqrt(np.mean((elev[fin] - true_h[fin]) ** 2)))
    assert rmse < 1.0, rmse

    # pile-up warning: a range that clips the terrain from above triggers
    # it; the auto range does not
    pts = np.stack([ce.ravel(), cn.ravel(), true_h.ravel()], axis=1)
    v = np.ones(pts.shape[0], bool)
    clip_cfg = PlaneSweepConfig(z_min=380.0, z_max=412.0, num_planes=33)
    f_lo, f_hi = warn_boundary_pileup(pts, v, clip_cfg)
    assert f_hi > 0.5
    ok_cfg = dataclasses.replace(clip_cfg, z_min=lo, z_max=hi)
    f_lo2, f_hi2 = warn_boundary_pileup(pts, v, ok_cfg)
    assert f_lo2 < 0.05 and f_hi2 < 0.05
