"""Acceptance tests against BASELINE.json criteria on the synthetic survey:
full pipeline (stereo -> DSM -> ortho) with DSM RMSE within 1 cell, plus
pose-refinement composition ahead of rasterization."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.camera.rig import CameraRig
from aerial_mapper_tpu.config import (
    BlockMatchingConfig,
    DsmConfig,
    GridMapConfig,
    PipelineConfig,
    StereoConfig,
)
from aerial_mapper_tpu.geo.se3 import matrix_to_quat
from aerial_mapper_tpu.mapgrid import MapGeometry, cell_centers
from aerial_mapper_tpu.pipeline.batch import run_dsm, run_ortho_backward_grid
from aerial_mapper_tpu.pipeline.dataset import Dataset
from aerial_mapper_tpu.synth import SyntheticScene, make_survey_poses, render_image

CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
SCENE = SyntheticScene(base_elevation=414.0, relief_amplitude=5.0)


def make_dataset(n=10, altitude=514.0, spacing=6.0):
    Rs, ts = make_survey_poses(n, altitude=altitude, spacing=spacing)
    images = [
        np.asarray(render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                                jnp.asarray(t, jnp.float32)))
        for R, t in zip(Rs, ts)
    ]
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs)))
    rig = CameraRig(
        cameras=(CAM,),
        T_C_B_quats=np.array([[1.0, 0.0, 0.0, 0.0]]),
        T_C_B_trans=np.zeros((1, 3)),
    )
    return Dataset(rig=rig, quats_G_B=quats, trans_G_B=ts, images=images)


def pipeline_config():
    return PipelineConfig(
        grid=GridMapConfig(center_easting=30.0, center_northing=0.0,
                           delta_easting=60.0, delta_northing=50.0,
                           resolution=0.5),
        stereo=StereoConfig(use_every_nth_image=1, matcher="bm"),
        bm=BlockMatchingConfig(num_disparities=48),
        dsm=DsmConfig(interpolation_radius_sq=1.0,
                      adaptive_interpolation=True),
    )


def test_dsm_rmse_within_one_cell():
    """BASELINE.json: 'DSM accuracy: RMSE within 1 cell resolution'."""
    dataset = make_dataset()
    cfg = pipeline_config()
    layers, geom = run_dsm(dataset, cfg)
    elev = np.asarray(layers["elevation"])
    ce, cn = cell_centers(geom)
    truth = np.asarray(SCENE.height(ce, cn))
    covered = np.isfinite(elev)
    assert covered.mean() > 0.9
    rmse = float(np.sqrt(np.mean((elev[covered] - truth[covered]) ** 2)))
    assert rmse < geom.resolution, f"DSM RMSE {rmse:.3f} m >= 1 cell"


def test_full_pipeline_ortho_matches_ground_texture():
    dataset = make_dataset()
    cfg = pipeline_config()
    layers, geom = run_ortho_backward_grid(dataset, cfg)
    ortho = np.asarray(layers["ortho"])
    ce, cn = cell_centers(geom)
    tex = np.asarray(SCENE.texture(ce, cn))
    textured = ortho != 255.0
    assert textured.mean() > 0.9
    err = np.abs(ortho[textured] - tex[textured])
    assert np.median(err) < 6.0, f"ortho median err {np.median(err):.2f}"


def test_refined_poses_feed_rasterization(rng):
    """Config-4 composition: corrupt poses -> BA refinement -> DSM quality
    recovers to near the clean-pose result."""
    from aerial_mapper_tpu.config import BundleAdjustmentConfig
    from aerial_mapper_tpu.features import refine_poses

    dataset = make_dataset()
    cfg = pipeline_config()

    noisy = dataset.trans_G_B.copy()
    noisy[1:] += rng.normal(scale=0.5, size=(len(dataset.images) - 1, 3))
    dataset_noisy = Dataset(rig=dataset.rig, quats_G_B=dataset.quats_G_B,
                            trans_G_B=noisy, images=dataset.images)

    def dsm_rmse(ds):
        layers, geom = run_dsm(ds, cfg)
        elev = np.asarray(layers["elevation"])
        ce, cn = cell_centers(geom)
        truth = np.asarray(SCENE.height(ce, cn))
        covered = np.isfinite(elev)
        return float(np.sqrt(np.mean((elev[covered] - truth[covered]) ** 2)))

    rmse_noisy = dsm_rmse(dataset_noisy)

    q_ref, t_ref, stats = refine_poses(
        [jnp.asarray(im, jnp.float32) for im in dataset.images],
        dataset.quats_G_B, noisy, CAM,
        ba_cfg=BundleAdjustmentConfig(max_iterations=10,
                                      position_prior_sigma_m=5.0),
    )
    dataset_ref = Dataset(rig=dataset.rig, quats_G_B=q_ref,
                          trans_G_B=t_ref, images=dataset.images)
    rmse_ref = dsm_rmse(dataset_ref)
    assert stats["tracks"] > 50
    assert rmse_ref < rmse_noisy * 0.7, \
        f"refinement: DSM RMSE {rmse_noisy:.2f} -> {rmse_ref:.2f}"
    assert rmse_ref < 2.0
