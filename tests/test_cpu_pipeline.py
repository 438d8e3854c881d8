"""CPU reference pipeline (cv2.StereoBM + native loops) vs analytic truth
and vs the JAX pipeline — validates the end-to-end speedup denominator."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aerial_mapper_tpu.mapgrid import MapGeometry, cell_centers  # noqa: E402
from aerial_mapper_tpu.native import load_native  # noqa: E402
from aerial_mapper_tpu.io.poses import _rot_matrix_np  # noqa: E402
from aerial_mapper_tpu.testing.cpu_pipeline import (  # noqa: E402
    run_reference_pipeline_cpu,
)

from test_end_to_end import CAM, SCENE, make_dataset, pipeline_config  # noqa: E402


@pytest.mark.skipif(load_native() is None,
                    reason="native baseline library not built")
def test_cpu_pipeline_matches_ground_truth():
    ds = make_dataset()
    quats, trans = ds.camera_poses()
    Rs = np.stack([_rot_matrix_np(q) for q in quats])
    images = np.stack(ds.images)
    geom = MapGeometry(center_easting=30.0, center_northing=0.0,
                       resolution=0.5, height=100, width=120)
    elev, ortho, timings = run_reference_pipeline_cpu(
        CAM.K, Rs, trans, images, geom, use_every_nth=1, num_disparities=48,
    )
    cov = np.isfinite(elev)
    assert cov.mean() > 0.9
    ce, cn = cell_centers(geom)
    truth = np.asarray(SCENE.height(ce, cn))
    rmse = float(np.sqrt(np.mean((elev[cov] - truth[cov]) ** 2)))
    assert rmse < geom.resolution  # same 1-cell criterion as the JAX path
    tex = np.asarray(SCENE.texture(ce, cn))
    textured = ortho != 255.0
    assert textured.mean() > 0.9
    assert np.median(np.abs(ortho[textured] - tex[textured])) < 6.0
    assert timings["total"] >= timings["stereo"] + timings["dsm"]


@pytest.mark.skipif(load_native() is None,
                    reason="native baseline library not built")
def test_cpu_pipeline_agrees_with_jax_pipeline():
    from aerial_mapper_tpu.pipeline.batch import run_ortho_backward_grid

    ds = make_dataset()
    cfg = pipeline_config()
    layers, geom = run_ortho_backward_grid(ds, cfg)
    ortho_jax = np.asarray(layers["ortho"])

    quats, trans = ds.camera_poses()
    Rs = np.stack([_rot_matrix_np(q) for q in quats])
    _elev, ortho_cpu, _t = run_reference_pipeline_cpu(
        CAM.K, Rs, trans, np.stack(ds.images), geom,
        use_every_nth=1, num_disparities=48,
        radius_sq=cfg.dsm.interpolation_radius_sq,
    )
    both = (ortho_jax != 255.0) & (ortho_cpu != 255.0)
    assert both.mean() > 0.8
    # independent matchers (cv2.StereoBM vs our cost volume) -> small DSM
    # differences; the textured mosaics must still agree closely
    agree = np.abs(ortho_jax[both] - ortho_cpu[both]) < 4.0
    assert agree.mean() > 0.9


@pytest.mark.skipif(load_native() is None,
                    reason="native baseline library not built")
def test_cpu_pipeline_sgbm_matches_ground_truth():
    """Same end-to-end CPU drive through cv2.StereoSGBM with the reference
    defaults (common.h:85-96) — the reference's code-default matcher."""
    ds = make_dataset()
    quats, trans = ds.camera_poses()
    Rs = np.stack([_rot_matrix_np(q) for q in quats])
    images = np.stack(ds.images)
    geom = MapGeometry(center_easting=30.0, center_northing=0.0,
                       resolution=0.5, height=100, width=120)
    elev, ortho, _timings = run_reference_pipeline_cpu(
        CAM.K, Rs, trans, images, geom, use_every_nth=1, num_disparities=48,
        matcher_kind="sgbm",
    )
    cov = np.isfinite(elev)
    assert cov.mean() > 0.9
    ce, cn = cell_centers(geom)
    truth = np.asarray(SCENE.height(ce, cn))
    rmse = float(np.sqrt(np.mean((elev[cov] - truth[cov]) ** 2)))
    assert rmse < geom.resolution


def test_triangulate_np_rotation_convention():
    """Locks the rect-to-world rotation convention of the vectorized CPU
    triangulation against the loop oracle using NON-ideal cameras (yawed/
    pitched, tilted baseline): a transposed rotation here is meters off,
    but an ideal nadir east-flying pair (the bench geometry) produces a
    symmetric R_rect that hides the mistake."""
    from aerial_mapper_tpu.testing.cpu_pipeline import _triangulate_np
    from aerial_mapper_tpu.testing.numpy_ref import (
        rectification_reference,
        triangulate_reference,
    )

    K = np.array([[320.0, 0, 160], [0, 320.0, 120], [0, 0, 1]])

    def rot(y, p, r):
        cy, sy, cp, sp, cr, sr = (np.cos(y), np.sin(y), np.cos(p),
                                  np.sin(p), np.cos(r), np.sin(r))
        Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
        Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
        Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
        return Rz @ Ry @ Rx

    nadir = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1.0]])
    R1 = nadir @ rot(0.05, 0.02, -0.01)
    R2 = nadir @ rot(-0.03, 0.01, 0.02)
    t1 = np.array([0.0, 0.0, 514.0])
    t2 = np.array([6.0, 0.3, 514.2])
    R_rect, _T1, _T2, baseline = rectification_reference(K, R1, R2, t1, t2)
    disp = np.full((8, 10), 5.0)
    gray = np.zeros((8, 10))
    pts_oracle, _ = triangulate_reference(disp, gray, K, baseline, R_rect,
                                          t1)
    pts, _g, valid = _triangulate_np(disp, gray, K, baseline, R_rect, t1)
    np.testing.assert_allclose(pts[valid], pts_oracle, atol=1e-9)
