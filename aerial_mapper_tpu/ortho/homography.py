"""Ortho backend B: forward-homography mosaic with feather blending.

TPU-native rendition of ``ortho::OrthoForwardHomography``
(``aerial_mapper_ortho/src/ortho-forward-homography.cc:74-202``). The
reference back-projects the four image corners onto the ground plane, fits a
perspective transform, ``cv::warpPerspective``s each image into the mosaic
and feeds an OpenCV feather blender. Here the plane-induced homography is
closed form (no 4-point solve): for ground plane z = z0 and world-to-camera
rotation R_cw = R^T,

    p_img ~ K [r1_cw  r2_cw  (r3_cw * z0 + t_cw)] [e, n, 1]^T

so image -> mosaic is (affine world->pixel) o (that matrix)^-1. Every mosaic
pixel then gathers from its source image (the same inverse-map strategy
warpPerspective uses), weighted by the feather weight = distance to the image
border — analytically min(u+1, W-u, v+1, H-v) * sharpness clipped to 1, which
is exactly OpenCV's distance-transform weight map for a full-frame mask.

Images are processed in chunks under ``lax.map`` accumulating
(sum w*I, sum w); the final mosaic is the ratio with unobserved pixels set
to 0 (ortho-forward-homography.cc:179-188).

Deviations (documented): the mosaic is north-up/east-right at configurable
resolution (the reference hardcodes 1 m/px and transposes axes,
ortho-forward-homography.cc:97-104); incremental mode keeps running
accumulators instead of re-feeding the previous blend (cc:116-119), which is
the same limit without double-feathering drift; the batch-mode row-offset
typo (width used for rows, cc:156-158) is not replicated.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.camera.models import Camera
from aerial_mapper_tpu.camera.undistort import undistort_image
from aerial_mapper_tpu.config import OrthoHomographyConfig
from aerial_mapper_tpu.geo.se3 import quat_to_matrix

_FEATHER_SHARPNESS = 0.02  # OpenCV FeatherBlender default


class MosaicState(NamedTuple):
    """Running feather accumulators (the incremental-mode state)."""

    weighted_sum: jax.Array  # [Hm, Wm]
    weight_sum: jax.Array  # [Hm, Wm]

    @property
    def mosaic(self) -> jax.Array:
        out = self.weighted_sum / jnp.maximum(self.weight_sum, 1e-12)
        return jnp.where(self.weight_sum > 1e-12, out, 0.0)


def create_mosaic_state(cfg: OrthoHomographyConfig) -> MosaicState:
    shape = (cfg.height_mosaic_pixels, cfg.width_mosaic_pixels)
    return MosaicState(
        weighted_sum=jnp.zeros(shape, jnp.float32),
        weight_sum=jnp.zeros(shape, jnp.float32),
    )


def _plane_homography_mosaic_to_image(quat, t, cam: Camera,
                                      cfg: OrthoHomographyConfig):
    """3x3 H mapping mosaic pixel (col, row, 1) -> image pixel (u, v, 1).

    Mosaic frame: col = (e - origin_e) / res + W/2, row = H/2 - (n - origin_n)
    / res (north up). Ground plane z = ground_plane_elevation_m.
    """
    R = quat_to_matrix(quat)  # camera-to-world
    R_cw = R.T
    t_cw = -R_cw @ t
    z0 = cfg.ground_plane_elevation_m
    K = jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    # world-plane (e, n, 1) -> image
    col3 = R_cw[:, 2] * z0 + t_cw
    H_w2i = K @ jnp.stack([R_cw[:, 0], R_cw[:, 1], col3], axis=1)

    # mosaic pixel -> world-plane coords
    res = cfg.resolution
    w2 = cfg.width_mosaic_pixels / 2.0
    h2 = cfg.height_mosaic_pixels / 2.0
    ox, oy = cfg.origin[0], cfg.origin[1]
    M = jnp.array(
        [
            [res, 0.0, ox - w2 * res + 0.5 * res],
            [0.0, -res, oy + h2 * res - 0.5 * res],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    return H_w2i @ M


def _feather_weight(u, v, width, height):
    dist = jnp.minimum(
        jnp.minimum(u + 1.0, width - u), jnp.minimum(v + 1.0, height - v)
    )
    return jnp.clip(dist * _FEATHER_SHARPNESS, 0.0, 1.0)


def _warp_accumulate(state: MosaicState, image, quat, t, cam: Camera,
                     cfg: OrthoHomographyConfig) -> MosaicState:
    hm, wm = cfg.height_mosaic_pixels, cfg.width_mosaic_pixels
    H = _plane_homography_mosaic_to_image(quat, t, cam, cfg)
    row = jax.lax.broadcasted_iota(jnp.float32, (hm, wm), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (hm, wm), 1)
    x = H[0, 0] * col + H[0, 1] * row + H[0, 2]
    y = H[1, 0] * col + H[1, 1] * row + H[1, 2]
    z = H[2, 0] * col + H[2, 1] * row + H[2, 2]
    behind = z <= 1e-9
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = x / z
    v = y / z

    iu = jnp.round(u).astype(jnp.int32)  # INTER_NEAREST like the reference
    iv = jnp.round(v).astype(jnp.int32)
    inside = (
        (iu >= 0) & (iv >= 0) & (iu <= cam.width - 1)
        & (iv <= cam.height - 1) & ~behind
    )
    texel = image[jnp.clip(iv, 0, cam.height - 1),
                  jnp.clip(iu, 0, cam.width - 1)]
    wgt = jnp.where(inside, _feather_weight(u, v, cam.width, cam.height), 0.0)
    return MosaicState(
        weighted_sum=state.weighted_sum + wgt * texel.astype(jnp.float32),
        weight_sum=state.weight_sum + wgt,
    )


@partial(jax.jit, static_argnames=("cam", "cfg", "needs_undistortion"))
def homography_mosaic_update(
    state: MosaicState,
    image: jax.Array,  # [H, W] gray
    quat_G_C: jax.Array,  # [4]
    t_G_C: jax.Array,  # [3]
    cam: Camera,
    cfg: OrthoHomographyConfig,
    needs_undistortion: bool = True,
) -> MosaicState:
    """Incremental mode: fold one image into the mosaic
    (updateOrthomosaic, ortho-forward-homography.cc:74-132)."""
    if needs_undistortion and cam.dist_kind != "none":
        image = undistort_image(cam, image)
    return _warp_accumulate(state, image, quat_G_C, t_G_C, cam, cfg)


@partial(jax.jit, static_argnames=("cam", "cfg", "needs_undistortion"))
def homography_mosaic_batch(
    images: jax.Array,  # [N, H, W]
    quats_G_C: jax.Array,  # [N, 4]
    t_G_C: jax.Array,  # [N, 3]
    cam: Camera,
    cfg: OrthoHomographyConfig,
    needs_undistortion: bool = True,
) -> jax.Array:
    """Batch mode (ortho-forward-homography.cc:134-189): all images blended
    in one pass, unobserved pixels set to 0. Returns the [Hm, Wm] mosaic."""
    state = create_mosaic_state(cfg)

    def body(carry, inp):
        image, quat, t = inp
        if needs_undistortion and cam.dist_kind != "none":
            image = undistort_image(cam, image)
        return _warp_accumulate(carry, image, quat, t, cam, cfg), None

    state, _ = jax.lax.scan(body, state, (images, quats_G_C, t_G_C))
    return state.mosaic
