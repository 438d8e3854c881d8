"""Feature pipeline tests: detection repeatability, matching accuracy on
rendered views, track triangulation, end-to-end pose refinement."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.config import BundleAdjustmentConfig
from aerial_mapper_tpu.features import (
    build_tracks,
    describe_patches,
    detect_corners,
    match_descriptors,
    refine_poses,
    triangulate_tracks,
)
from aerial_mapper_tpu.geo.se3 import matrix_to_quat
from aerial_mapper_tpu.synth import SyntheticScene, make_survey_poses, render_image

CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)
SCENE = SyntheticScene(base_elevation=414.0, relief_amplitude=4.0)


def render_views(n=4, spacing=6.0, jitter=0.0, seed=0):
    Rs, ts = make_survey_poses(n, altitude=514.0, spacing=spacing,
                               jitter=jitter, seed=seed)
    images = [
        render_image(SCENE, CAM, jnp.asarray(R, jnp.float32),
                     jnp.asarray(t, jnp.float32))
        for R, t in zip(Rs, ts)
    ]
    return Rs, ts, images


def test_detect_corners_basic():
    _, _, images = render_views(1)
    uv, score = detect_corners(images[0], num_corners=256)
    assert int((score > 0).sum()) > 100
    u, v = np.asarray(uv[:, 0]), np.asarray(uv[:, 1])
    good = np.asarray(score) > 0
    assert (u[good] >= 12).all() and (u[good] < 320 - 12).all()
    assert (v[good] >= 12).all() and (v[good] < 240 - 12).all()


def test_matches_follow_ground_truth_flow():
    """Matches between two nadir views must agree with the known baseline
    shift (flat-ish scene => flow ~ fx * baseline / depth)."""
    Rs, ts, images = render_views(2, spacing=6.0)
    uv1, s1 = detect_corners(images[0], num_corners=256)
    uv2, s2 = detect_corners(images[1], num_corners=256)
    d1 = describe_patches(images[0], uv1)
    d2 = describe_patches(images[1], uv2)
    idx2, matched = match_descriptors(d1, d2, s1 > 0, s2 > 0)
    m = np.asarray(matched)
    assert m.sum() > 40
    flow = np.asarray(uv1)[m] - np.asarray(uv2)[np.asarray(idx2)[m]]
    expected = CAM.fx * 6.0 / 100.0  # ~19.2 px, modulated by relief
    err = np.abs(flow[:, 0] - expected)
    assert np.median(err) < 3.0
    assert np.median(np.abs(flow[:, 1])) < 2.0  # nadir: vertical flow ~ 0


def test_tracks_and_triangulation():
    Rs, ts, images = render_views(3, spacing=5.0)
    kps, descs, valids = [], [], []
    for img in images:
        uv, s = detect_corners(img, num_corners=256)
        kps.append(np.asarray(uv))
        descs.append(describe_patches(img, uv))
        valids.append(s > 0)
    pair_matches = []
    for i, j in [(0, 1), (1, 2)]:
        idx2, matched = match_descriptors(descs[i], descs[j], valids[i],
                                          valids[j])
        ii = np.nonzero(np.asarray(matched))[0]
        pair_matches.append((i, j, ii, np.asarray(idx2)[ii]))

    problem, n_tracks = build_tracks(pair_matches, kps, min_track_length=2)
    assert n_tracks > 30

    quats = jnp.asarray(matrix_to_quat(jnp.asarray(Rs, jnp.float32)))
    lms = triangulate_tracks(
        problem, quats, jnp.asarray(ts, jnp.float32), n_tracks,
        CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    z_true = np.asarray(SCENE.height(lms[:, 0], lms[:, 1]))
    err = np.abs(np.asarray(lms[:, 2]) - z_true)
    assert np.median(err) < 1.5, f"median triangulation err {np.median(err)}"


def test_refine_poses_improves_noisy_trajectory(rng):
    Rs, ts, images = render_views(6, spacing=6.0)
    quats_true = np.asarray(matrix_to_quat(jnp.asarray(Rs)))

    # corrupt all but the first pose
    ts_noisy = ts.copy()
    ts_noisy[1:] += rng.normal(scale=0.4, size=(5, 3))

    q_ref, t_ref, stats = refine_poses(
        images, quats_true, ts_noisy, CAM,
        ba_cfg=BundleAdjustmentConfig(max_iterations=10,
                                      position_prior_sigma_m=5.0),
    )
    assert stats["tracks"] > 30

    def ate(a, b):
        return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))

    ate0 = ate(ts_noisy, ts)
    ate1 = ate(t_ref, ts)
    assert ate1 < ate0 / 2, f"ATE {ate0:.3f} -> {ate1:.3f}"
