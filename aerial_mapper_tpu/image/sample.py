"""Dense image resampling primitives: bilinear gather, remap, homography warp.

These are the TPU equivalents of ``cv::remap`` (used for rectification,
``aerial_mapper_dense_pcl/src/rectifier.cpp:107-112``) and
``cv::warpPerspective`` (``aerial_mapper_ortho/src/ortho-forward-homography.cc:109-115``).
A remap on TPU is a pure gather: XLA lowers the integer-index gathers onto
the VPU and fuses the surrounding arithmetic, so there is no benefit to a
hand-written kernel until the access pattern becomes data-dependent.

Convention: images are ``[H, W]`` or ``[H, W, C]`` float arrays; pixel (u, v)
= (column, row); sampling at integer coordinates hits pixel centers, matching
OpenCV.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_pixels(image: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Clamped integer gather. image [H, W, ...]; iy/ix any shape."""
    h, w = image.shape[0], image.shape[1]
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    return image[iy, ix]


def bilinear_sample(
    image: jax.Array,
    u: jax.Array,
    v: jax.Array,
    fill_value: float = 0.0,
) -> jax.Array:
    """Bilinear sample ``image`` at float coords (u=x=col, v=y=row).

    Out-of-bounds coordinates return ``fill_value`` (cv::BORDER_CONSTANT, the
    reference's choice in rectifier.cpp:107-112).

    TPU note: arbitrary-index gathers run at ~100 M indices/s on v5e, and
    the cost is per *index*, not per fetched element — so the four bilinear
    neighbors are packed as channels of one [H, W, 4] array (two cheap
    rolls) and fetched with a single gather instead of four (~6x faster).
    The rolled edge channels wrap, but their interpolation weight is exactly
    0 whenever the wrapped value would be used on an in-bounds sample.
    """
    h, w = image.shape[0], image.shape[1]
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    iu0 = jnp.clip(u0.astype(jnp.int32), 0, w - 1)
    iv0 = jnp.clip(v0.astype(jnp.int32), 0, h - 1)

    if image.ndim == 2:
        right = jnp.roll(image, -1, axis=1)
        down = jnp.roll(image, -1, axis=0)
        downright = jnp.roll(right, -1, axis=0)
        quad = jnp.stack([image, right, down, downright], axis=-1)
        q = quad[iv0, iu0]  # [..., 4] one gather
        p00, p01, p10, p11 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    else:
        # channel images already gather all channels per index
        p00 = _gather_pixels(image, iv0, iu0)
        p01 = _gather_pixels(image, iv0, iu0 + 1)
        p10 = _gather_pixels(image, iv0 + 1, iu0)
        p11 = _gather_pixels(image, iv0 + 1, iu0 + 1)
        fu = fu[..., None]
        fv = fv[..., None]

    top = p00 * (1.0 - fu) + p01 * fu
    bot = p10 * (1.0 - fu) + p11 * fu
    out = top * (1.0 - fv) + bot * fv

    inside = (u >= 0.0) & (v >= 0.0) & (u <= w - 1.0) & (v <= h - 1.0)
    if image.ndim == 3:
        inside = inside[..., None]
    return jnp.where(inside, out, jnp.asarray(fill_value, out.dtype))


def nearest_sample(
    image: jax.Array,
    u: jax.Array,
    v: jax.Array,
    fill_value: float = 0.0,
) -> jax.Array:
    """Nearest-neighbor sample (cv::INTER_NEAREST, used by the reference's
    warpPerspective at ortho-forward-homography.cc:112-115)."""
    h, w = image.shape[0], image.shape[1]
    iu = jnp.round(u).astype(jnp.int32)
    iv = jnp.round(v).astype(jnp.int32)
    out = _gather_pixels(image, iv, iu)
    inside = (iu >= 0) & (iv >= 0) & (iu <= w - 1) & (iv <= h - 1)
    if image.ndim == 3:
        inside = inside[..., None]
    return jnp.where(inside, out, jnp.asarray(fill_value, out.dtype))


def remap(
    image: jax.Array,
    map_u: jax.Array,
    map_v: jax.Array,
    fill_value: float = 0.0,
    nearest: bool = False,
) -> jax.Array:
    """cv::remap equivalent: output[i, j] = image(map_v[i, j], map_u[i, j])."""
    if nearest:
        return nearest_sample(image, map_u, map_v, fill_value)
    return bilinear_sample(image, map_u, map_v, fill_value)


def _pixel_grid(h: int, w: int, dtype=jnp.float32):
    v = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    u = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return u, v


def homography_warp(
    image: jax.Array,
    h_matrix: jax.Array,
    out_shape: tuple,
    fill_value: float = 0.0,
    nearest: bool = False,
) -> jax.Array:
    """Warp ``image`` by 3x3 homography H mapping image coords -> output coords.

    Implemented as the inverse map (gather from source), the same strategy
    cv::warpPerspective uses internally. ``h_matrix`` maps source pixel
    (u, v, 1) to destination; we invert once (3x3) and evaluate the inverse
    projectively on a dense destination grid.
    """
    hh, ww = out_shape
    h_inv = jnp.linalg.inv(h_matrix)
    u, v = _pixel_grid(hh, ww, jnp.float32)
    x = h_inv[0, 0] * u + h_inv[0, 1] * v + h_inv[0, 2]
    y = h_inv[1, 0] * u + h_inv[1, 1] * v + h_inv[1, 2]
    z = h_inv[2, 0] * u + h_inv[2, 1] * v + h_inv[2, 2]
    z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    src_u = x / z
    src_v = y / z
    return remap(image, src_u, src_v, fill_value, nearest=nearest)


def point_in_quad(
    u: jax.Array, v: jax.Array, corners_uv: jax.Array
) -> jax.Array:
    """Vectorized point-in-convex-quad test.

    Replaces the reference's rasterized mask-by-drawContours
    (``rectifier.cpp:116-129``): a pixel is valid iff it lies inside the
    warped image-corner quadrilateral. ``corners_uv`` is [4, 2] in (winding)
    order; works for either orientation by requiring a consistent sign of all
    edge cross products.
    """
    cross = []
    for i in range(4):
        a = corners_uv[i]
        b = corners_uv[(i + 1) % 4]
        cross.append((b[0] - a[0]) * (v - a[1]) - (b[1] - a[1]) * (u - a[0]))
    cross = jnp.stack(cross, axis=0)
    return jnp.all(cross >= 0.0, axis=0) | jnp.all(cross <= 0.0, axis=0)
