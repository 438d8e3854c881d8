"""Pose-graph optimization tests + windowed BA."""

import numpy as np
import jax.numpy as jnp

from aerial_mapper_tpu.ba import (
    build_sequential_graph,
    optimize_pose_graph,
    relative_pose,
)
from aerial_mapper_tpu.geo.se3 import matrix_to_quat
from aerial_mapper_tpu.synth import make_survey_poses


def make_trajectory(n=10):
    Rs, ts = make_survey_poses(n, altitude=514.0, spacing=8.0)
    quats = np.asarray(matrix_to_quat(jnp.asarray(Rs))).astype(np.float32)
    return quats, ts.astype(np.float32)


def test_pose_graph_recovers_from_noise(rng):
    quats_true, trans_true = make_trajectory(10)
    # ground-truth-consistent odometry edges + a loop closure 0 -> 9
    graph = build_sequential_graph(
        quats_true, trans_true,
        odometry_sigma_rot=0.01, odometry_sigma_trans=0.05,
        extra_edges=[
            (
                0, 9,
                *relative_pose(jnp.asarray(quats_true),
                               jnp.asarray(trans_true), 0, 9),
                100.0, 20.0,
            )
        ],
    )

    trans_noisy = trans_true + rng.normal(scale=0.5, size=trans_true.shape
                                          ).astype(np.float32)
    trans_noisy[0] = trans_true[0]  # anchor

    q_out, t_out, costs = optimize_pose_graph(
        jnp.asarray(quats_true), jnp.asarray(trans_noisy), graph,
        num_iterations=8,
    )
    err0 = np.sqrt(np.mean((trans_noisy - trans_true) ** 2))
    err1 = np.sqrt(np.mean((np.asarray(t_out) - trans_true) ** 2))
    assert err1 < err0 / 3, f"RMSE {err0:.3f} -> {err1:.3f}"
    assert float(costs[-1]) < float(costs[0]) / 10


def test_pose_graph_anchors_first_pose(rng):
    quats_true, trans_true = make_trajectory(6)
    graph = build_sequential_graph(quats_true, trans_true)
    trans_noisy = trans_true + rng.normal(scale=0.3, size=trans_true.shape
                                          ).astype(np.float32)
    q_out, t_out, _ = optimize_pose_graph(
        jnp.asarray(quats_true), jnp.asarray(trans_noisy), graph,
        num_iterations=4,
    )
    np.testing.assert_allclose(np.asarray(t_out[0]), trans_noisy[0],
                               atol=1e-5)


def test_windowed_refinement_runs():
    import jax.numpy as jnp2

    from aerial_mapper_tpu.camera import Camera
    from aerial_mapper_tpu.config import BundleAdjustmentConfig
    from aerial_mapper_tpu.features import refine_poses_windowed
    from aerial_mapper_tpu.synth import SyntheticScene, render_image

    cam = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320,
                 height=240)
    scene = SyntheticScene(base_elevation=414.0, relief_amplitude=4.0)
    Rs, ts = make_survey_poses(9, altitude=514.0, spacing=6.0)
    images = [
        render_image(scene, cam, jnp2.asarray(R, jnp2.float32),
                     jnp2.asarray(t, jnp2.float32))
        for R, t in zip(Rs, ts)
    ]
    quats = np.asarray(matrix_to_quat(jnp2.asarray(Rs)))
    rng = np.random.default_rng(1)
    trans_noisy = ts.copy()
    trans_noisy[1:] += rng.normal(scale=0.3, size=(8, 3))

    q_out, t_out, stats = refine_poses_windowed(
        images, quats, trans_noisy, cam, window_size=5, overlap=2,
        ba_cfg=BundleAdjustmentConfig(max_iterations=8,
                                      position_prior_sigma_m=5.0),
    )
    assert stats["windows"] >= 2
    err0 = np.sqrt(np.mean((trans_noisy - ts) ** 2))
    err1 = np.sqrt(np.mean((t_out - ts) ** 2))
    assert err1 < err0
