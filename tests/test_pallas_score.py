"""Fused Pallas backward-grid score pass vs the XLA path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aerial_mapper_tpu.camera import Camera
from aerial_mapper_tpu.geo.se3 import quat_conjugate, quat_to_matrix
from aerial_mapper_tpu.ortho.backward_grid import _score_pass
from aerial_mapper_tpu.ortho.pallas_score import score_pass_pallas

CAM = Camera(fx=320.0, fy=320.0, cx=160.0, cy=120.0, width=320, height=240)


def survey_inputs(num_cells=1000, n_cams=13, seed=0):
    """Cells on a small relief patch; near-nadir cameras above it."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cells = jnp.concatenate(
        [jax.random.uniform(k1, (num_cells, 2)) * 80.0 - 40.0,
         410.0 + 5.0 * jax.random.uniform(k2, (num_cells, 1))], axis=1,
    )
    q = jnp.concatenate(
        [jnp.ones((n_cams, 1)), 0.05 * jax.random.normal(k3, (n_cams, 3))],
        axis=1,
    )
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    # nadir base: camera z axis points down
    base = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], jnp.float32)
    R_gc = jnp.einsum("nij,jk->nik", quat_to_matrix(q), base)
    R_cw = jnp.transpose(R_gc, (0, 2, 1))
    t = jnp.concatenate(
        [jax.random.uniform(k4, (n_cams, 2)) * 80.0 - 40.0,
         jnp.full((n_cams, 1), 514.0)], axis=1,
    )
    return cells, R_cw, t


def test_pallas_score_matches_xla_score():
    cells, R_cw, t = survey_inputs()
    b_ref, q_ref, u_ref, v_ref, n_ref = _score_pass(cells, R_cw, t, CAM)
    b_pal, q_pal, u_pal, v_pal, n_pal = score_pass_pallas(
        cells, R_cw, t, CAM, tile_t=256, interpret=True
    )
    b_ref, q_ref, u_ref, v_ref, n_ref = map(
        np.asarray, (b_ref, q_ref, u_ref, v_ref, n_ref)
    )
    b_pal, q_pal, u_pal, v_pal, n_pal = map(
        np.asarray, (b_pal, q_pal, u_pal, v_pal, n_pal)
    )
    # winner selection: require exact match outside f32 rounding collisions
    assert (b_pal == b_ref).mean() > 0.999
    same = b_pal == b_ref
    seen = np.isfinite(q_ref) & same
    assert seen.any()
    # ranking key and winner pixel coordinates: FMA ordering in the 3-term
    # rotation is the only divergence between the two paths
    np.testing.assert_allclose(q_pal[seen], q_ref[seen], atol=1e-5)
    np.testing.assert_allclose(u_pal[seen], u_ref[seen], atol=1e-2)
    np.testing.assert_allclose(v_pal[seen], v_ref[seen], atol=1e-2)
    assert (n_pal == n_ref).mean() > 0.999
    # no-visible-camera cells agree exactly (q == -inf both paths)
    np.testing.assert_array_equal(np.isfinite(q_pal), np.isfinite(q_ref))


def test_pallas_score_ragged_tile_and_camera_padding():
    # num_cells not a multiple of tile_t; n_cams far below the 128-lane pad
    cells, R_cw, t = survey_inputs(num_cells=777, n_cams=3, seed=1)
    b_ref, q_ref, u_ref, v_ref, n_ref = _score_pass(cells, R_cw, t, CAM)
    b_pal, q_pal, u_pal, v_pal, n_pal = score_pass_pallas(
        cells, R_cw, t, CAM, tile_t=512, interpret=True
    )
    assert (np.asarray(b_pal) == np.asarray(b_ref)).mean() > 0.999
    assert (np.asarray(n_pal) == np.asarray(n_ref)).all()


def test_pallas_score_rejects_distorted_camera():
    cells, R_cw, t = survey_inputs(num_cells=64, n_cams=2)
    cam_d = CAM._replace(dist_kind="radial-tangential",
                         dist_params=(0.1, 0.0, 0.0, 0.0))
    with pytest.raises(ValueError, match="pinhole"):
        score_pass_pallas(cells, R_cw, t, cam_d, interpret=True)


def test_backward_grid_update_with_pallas_kernel_matches_default():
    from aerial_mapper_tpu.config import OrthoBackwardGridConfig
    from aerial_mapper_tpu.mapgrid import MapGeometry, create_map_state
    from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
    from aerial_mapper_tpu.geo.se3 import matrix_to_quat

    cells, R_cw, t = survey_inputs(num_cells=32 * 32, n_cams=5, seed=2)
    geom = MapGeometry(center_easting=0.0, center_northing=0.0,
                       resolution=2.0, height=32, width=32)
    layers = dict(create_map_state(geom).layers)
    layers["elevation"] = cells[:, 2].reshape(32, 32)
    quats = matrix_to_quat(jnp.transpose(R_cw, (0, 2, 1)))
    images = jax.random.uniform(jax.random.PRNGKey(3), (5, 240, 320)) * 255

    out_ref = backward_grid_update(layers, quats, t, images, geom, CAM,
                                   OrthoBackwardGridConfig())
    out_pal = backward_grid_update(layers, quats, t, images, geom, CAM,
                                   OrthoBackwardGridConfig(
                                       score_kernel="pallas"))
    oi_ref = np.asarray(out_ref["observation_index"])
    oi_pal = np.asarray(out_pal["observation_index"])
    # never-observed cells keep the NaN init in both paths (NaN != NaN)
    same_winner = (oi_pal == oi_ref) | (np.isnan(oi_ref) & np.isnan(oi_pal))
    assert same_winner.all()
    o_ref, o_pal = np.asarray(out_ref["ortho"]), np.asarray(out_pal["ortho"])
    assert (o_ref[same_winner] == o_pal[same_winner]).all()
    np.testing.assert_array_equal(out_ref["num_observations"],
                                  out_pal["num_observations"])
