"""Unit tests for SE(3) ops and UTM conversions."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from aerial_mapper_tpu.geo import (
    Pose,
    matrix_to_quat,
    pose_compose,
    pose_inverse,
    pose_transform,
    quat_multiply,
    quat_rotate,
    quat_to_matrix,
)
from aerial_mapper_tpu.geo import utm


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_scipy(rng):
    q = random_quats(rng, 64)
    v = rng.normal(size=(64, 3))
    ours = np.asarray(quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    # scipy uses xyzw ordering
    theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quat_to_matrix_roundtrip(rng):
    q = random_quats(rng, 128)
    m = quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(matrix_to_quat(m))
    # quaternions are sign-ambiguous; matrix_to_quat canonicalizes w >= 0
    q_canon = q * np.where(q[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q2, q_canon, atol=1e-5)


def test_quat_multiply_consistent_with_matrix_product(rng):
    q1, q2 = random_quats(rng, 8), random_quats(rng, 8)
    m12 = np.asarray(quat_to_matrix(quat_multiply(jnp.asarray(q1), jnp.asarray(q2))))
    m1 = np.asarray(quat_to_matrix(jnp.asarray(q1)))
    m2 = np.asarray(quat_to_matrix(jnp.asarray(q2)))
    np.testing.assert_allclose(m12, np.einsum("nij,njk->nik", m1, m2), atol=1e-5)


def test_pose_compose_inverse(rng):
    q = random_quats(rng, 16)
    t = rng.normal(size=(16, 3))
    p = Pose(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))
    ident = pose_compose(p, pose_inverse(p))
    np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ident.q)[:, 0]), 1.0, atol=1e-5)

    x = rng.normal(size=(16, 3)).astype(np.float32)
    fwd = pose_transform(p, jnp.asarray(x))
    back = pose_transform(pose_inverse(p), fwd)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_utm_known_value():
    # Zurich area is UTM zone 32, band T
    e, n, zone, band = utm.ll_to_utm(47.3763, 8.5477)
    assert zone == 32
    assert band == "T"

    # analytic anchors: a point on the central meridian of its zone maps to
    # easting exactly 500000; equator maps to northing 0
    e0, n0, zone0, _ = utm.ll_to_utm(0.0, 9.0)  # zone 32 central meridian
    assert zone0 == 32
    assert abs(e0 - 500000.0) < 1e-6
    assert abs(n0) < 1e-6

    # 1 degree east of the central meridian at the equator:
    # arc length a * pi/180 * k0 ~= 111 281 m (TM higher-order terms < 20 m)
    e1, n1, _, _ = utm.ll_to_utm(0.0, 10.0)
    assert abs((e1 - 500000.0) - 111319.49 * 0.9996) < 20.0


def test_utm_roundtrip():
    lats = np.linspace(-60, 70, 27)
    lons = np.linspace(-170, 170, 27)
    for lat, lon in zip(lats, lons):
        e, n, zone, _ = utm.ll_to_utm(lat, lon)
        lat2, lon2 = utm.utm_to_ll(e, n, zone, northern_hemisphere=lat >= 0)
        assert abs(float(lat2) - lat) < 1e-5
        assert abs(float(lon2) - lon) < 1e-5


def test_utm_rafz_flagfile_origin():
    # The rafz demo origin (flags/1-real-rafz-ortho-from-homography.ff:8-10)
    # is UTM zone 32: 464980 E, 5272260 N -> should invert to a lat/lon near
    # Rafz, Switzerland (47.6 N, 8.5 E).
    lat, lon = utm.utm_to_ll(464980.0, 5272260.0, 32)
    assert 47.0 < float(lat) < 48.0
    assert 8.0 < float(lon) < 9.0
