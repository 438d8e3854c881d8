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


def _corner_bbox_mosaic(H, cam: Camera):
    """Warped-footprint bbox on the mosaic from the 4 image corners.

    ``H`` maps mosaic->image; the footprint quad on the mosaic is the
    image rectangle under H^-1, and a projective map keeps edges straight,
    so the bbox is spanned by the corners. Returns (row_min, row_max,
    col_min, col_max, ok) — ok requires all corners strictly in front
    (w > 0), i.e. a bounded footprint.
    """
    Hi = jnp.linalg.inv(H)
    w, h = cam.width - 1.0, cam.height - 1.0
    corners = jnp.array(
        [[0.0, 0.0, 1.0], [w, 0.0, 1.0], [w, h, 1.0], [0.0, h, 1.0]],
        jnp.float32,
    ).T  # [3, 4]
    mc = Hi @ corners
    z = mc[2]
    ok = jnp.all(z > 1e-9)
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    cols = jnp.where(ok, mc[0] / zs, 0.0)
    rows = jnp.where(ok, mc[1] / zs, 0.0)
    return (jnp.min(rows), jnp.max(rows), jnp.min(cols), jnp.max(cols), ok)


def _warp_accumulate_windowed(state: MosaicState, image, quat, t,
                              cam: Camera,
                              cfg: OrthoHomographyConfig) -> MosaicState:
    """Accumulate one image inside its [window_rows, window_cols] slab.

    Exact (bit-identical per-pixel math to ``_warp_accumulate``) whenever
    the footprint bbox fits the window — every skipped mosaic pixel has
    feather weight exactly 0. Images with an unbounded footprint (a corner
    at/behind the ground-plane horizon) contribute nothing; use the full
    path (window 0) for such poses. 249 x 752x480 images into a 1000^2
    mosaic: the full-mosaic inverse warp gathers 249 M texels, the window
    only the footprints.
    """
    hm, wm = cfg.height_mosaic_pixels, cfg.width_mosaic_pixels
    wr, wc = cfg.window_rows, cfg.window_cols
    H = _plane_homography_mosaic_to_image(quat, t, cam, cfg)
    rmin, rmax, cmin, cmax, ok = _corner_bbox_mosaic(H, cam)
    row0 = jnp.clip(jnp.floor(rmin).astype(jnp.int32) - 1, 0, max(hm - wr, 0))
    col0 = jnp.clip(jnp.floor(cmin).astype(jnp.int32) - 1, 0, max(wm - wc, 0))
    # a window that cannot cover the bbox would silently drop texels —
    # contribute nothing instead (the driver sizes windows so this never
    # triggers for valid poses)
    ok &= (rmax - rmin) < (wr - 2)
    ok &= (cmax - cmin) < (wc - 2)

    row = jax.lax.broadcasted_iota(jnp.float32, (wr, wc), 0) \
        + row0.astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.float32, (wr, wc), 1) \
        + col0.astype(jnp.float32)
    x = H[0, 0] * col + H[0, 1] * row + H[0, 2]
    y = H[1, 0] * col + H[1, 1] * row + H[1, 2]
    z = H[2, 0] * col + H[2, 1] * row + H[2, 2]
    behind = z <= 1e-9
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = x / z
    v = y / z
    iu = jnp.round(u).astype(jnp.int32)
    iv = jnp.round(v).astype(jnp.int32)
    inside = (
        (iu >= 0) & (iv >= 0) & (iu <= cam.width - 1)
        & (iv <= cam.height - 1) & ~behind & ok
    )
    texel = image[jnp.clip(iv, 0, cam.height - 1),
                  jnp.clip(iu, 0, cam.width - 1)]
    wgt = jnp.where(inside, _feather_weight(u, v, cam.width, cam.height), 0.0)
    ws = jax.lax.dynamic_slice(state.weighted_sum, (row0, col0), (wr, wc)) \
        + wgt * texel.astype(jnp.float32)
    wn = jax.lax.dynamic_slice(state.weight_sum, (row0, col0), (wr, wc)) \
        + wgt
    return MosaicState(
        weighted_sum=jax.lax.dynamic_update_slice(
            state.weighted_sum, ws, (row0, col0)),
        weight_sum=jax.lax.dynamic_update_slice(
            state.weight_sum, wn, (row0, col0)),
    )


def _accumulate_fn(cam: Camera, cfg: OrthoHomographyConfig):
    windowed = (
        cfg.window_rows > 0
        and cfg.window_cols > 0
        and (cfg.window_rows < cfg.height_mosaic_pixels
             or cfg.window_cols < cfg.width_mosaic_pixels)
    )
    return _warp_accumulate_windowed if windowed else _warp_accumulate


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
    return _accumulate_fn(cam, cfg)(state, image, quat_G_C, t_G_C, cam, cfg)


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
    accumulate = _accumulate_fn(cam, cfg)

    def body(carry, inp):
        image, quat, t = inp
        if needs_undistortion and cam.dist_kind != "none":
            image = undistort_image(cam, image)
        return accumulate(carry, image, quat, t, cam, cfg), None

    state, _ = jax.lax.scan(body, state, (images, quats_G_C, t_G_C))
    return state.mosaic
