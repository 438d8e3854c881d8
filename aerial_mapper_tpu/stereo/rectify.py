"""Planar rectification of virtual stereo pairs (Fusiello-Trucco-Verri 2000).

TPU-native rendition of the reference's ``stereo::Rectifier``
(``aerial_mapper_dense_pcl/src/rectifier.cpp:34-129``):

- the tiny 3x3 transform algebra runs in float64 (UTM-scale translations
  would shred float32 precision) — it's O(1) work;
- the per-pixel inverse-homography remap (rectifier.cpp:79-104, an O(H*W)
  scalar double loop in the reference) becomes a dense projective grid
  transform + bilinear gather on device;
- the valid-region mask (drawContours rasterization, rectifier.cpp:116-129)
  becomes an analytic point-in-quad test on the warped image corners.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.image.sample import point_in_quad, remap


class RectificationTransforms(NamedTuple):
    """Host-side (float64 numpy) rectification algebra outputs."""

    R_G_C_rect: np.ndarray  # [3, 3] rectified camera rotation (world frame)
    T1: np.ndarray  # [3, 3] image-1 rectifying transform
    T2: np.ndarray  # [3, 3]
    baseline: float


class RectifiedPair(NamedTuple):
    image_left: jax.Array  # [H, W] rectified left
    image_right: jax.Array  # [H, W]
    mask: jax.Array  # [H, W] bool valid region
    R_G_C_rect: jax.Array  # [3, 3] float32
    baseline: jax.Array  # scalar float32


def rectification_transforms(
    K: np.ndarray,
    R_G_C1: np.ndarray,
    R_G_C2: np.ndarray,
    t_G_C1: np.ndarray,
    t_G_C2: np.ndarray,
) -> RectificationTransforms:
    """Compute the rectified rotation and per-image rectifying homographies.

    Follows rectifier.cpp:42-76: new x = baseline direction, y = z1 x x,
    z = x x y; P_rect = K [R_rect | -R_rect t]; T_i = P_rect[:, :3] (K R_i^T)^-1.
    """
    x = t_G_C2 - t_G_C1
    baseline = float(np.linalg.norm(x))
    if baseline < 1e-9:
        raise ValueError("Zero baseline between stereo frames")
    y = np.cross(R_G_C1[:, 2], x)
    z = np.cross(x, y)
    R_rect = np.stack(
        [
            x / np.linalg.norm(x),
            y / np.linalg.norm(y),
            z / np.linalg.norm(z),
        ],
        axis=0,
    )
    P1 = K @ np.hstack([R_rect, (R_rect @ (-t_G_C1))[:, None]])
    P2 = K @ np.hstack([R_rect, (R_rect @ (-t_G_C2))[:, None]])
    T1 = P1[:, :3] @ np.linalg.inv(K @ R_G_C1.T)
    T2 = P2[:, :3] @ np.linalg.inv(K @ R_G_C2.T)
    return RectificationTransforms(R_rect, T1, T2, baseline)


def _rectify_image(image: jax.Array, T_inv: jax.Array) -> jax.Array:
    """Warp ``image`` into the rectified frame: src = proj(T_inv [u, v, 1])."""
    h, w = image.shape[0], image.shape[1]
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = T_inv[0, 0] * u + T_inv[0, 1] * v + T_inv[0, 2]
    y = T_inv[1, 0] * u + T_inv[1, 1] * v + T_inv[1, 2]
    zw = T_inv[2, 0] * u + T_inv[2, 1] * v + T_inv[2, 2]
    zw = jnp.where(jnp.abs(zw) < 1e-12, 1e-12, zw)
    return remap(image, x / zw, y / zw, fill_value=0.0)


@jax.jit
def _rectify_device(image1, image2, T1_inv, T2_inv, corners_rect):
    rect1 = _rectify_image(image1, T1_inv)
    rect2 = _rectify_image(image2, T2_inv)
    h, w = image1.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    mask = point_in_quad(u, v, corners_rect)
    return rect1, rect2, mask


def rectify_pair(
    K: np.ndarray,
    R_G_C1: np.ndarray,
    R_G_C2: np.ndarray,
    t_G_C1: np.ndarray,
    t_G_C2: np.ndarray,
    image1: jax.Array,
    image2: jax.Array,
) -> RectifiedPair:
    """Full rectification of one undistorted virtual-stereo pair."""
    tf = rectification_transforms(K, R_G_C1, R_G_C2, t_G_C1, t_G_C2)
    h, w = image1.shape

    # Warped image-1 corners define the valid quad (rectifier.cpp:116-129).
    corners = np.array(
        [[0.0, 0.0, 1.0], [w - 1.0, 0.0, 1.0], [w - 1.0, h - 1.0, 1.0],
         [0.0, h - 1.0, 1.0]]
    ).T
    warped = tf.T1 @ corners
    corners_rect = (warped[:2] / warped[2:3]).T  # [4, 2] (u, v)

    rect1, rect2, mask = _rectify_device(
        image1,
        image2,
        jnp.asarray(np.linalg.inv(tf.T1), jnp.float32),
        jnp.asarray(np.linalg.inv(tf.T2), jnp.float32),
        jnp.asarray(corners_rect, jnp.float32),
    )
    return RectifiedPair(
        image_left=rect1,
        image_right=rect2,
        mask=mask,
        R_G_C_rect=jnp.asarray(tf.R_G_C_rect, jnp.float32),
        baseline=jnp.asarray(tf.baseline, jnp.float32),
    )
