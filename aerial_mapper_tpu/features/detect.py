"""Shi-Tomasi corner detection, dense and batched.

The reference has no feature pipeline (poses arrive pre-optimized from
PIX4D/COLMAP, ``/root/reference/README.md:5``); the north star requires
feature detect+match to feed bundle adjustment (BASELINE.json). TPU-native
shape: gradients and the structure tensor are separable stencils on the
VPU, non-max suppression is a max-pool comparison, and the fixed-size
corner list comes from ``lax.top_k`` — all static shapes, vmappable over an
image batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.stereo.matching import _box_filter


def _gradients(image: jax.Array):
    """Sobel gradients (edge-padded)."""
    p = jnp.pad(image, ((1, 1), (1, 1)), mode="edge")
    gx = (
        (p[:-2, 2:] - p[:-2, :-2])
        + 2.0 * (p[1:-1, 2:] - p[1:-1, :-2])
        + (p[2:, 2:] - p[2:, :-2])
    ) / 8.0
    gy = (
        (p[2:, :-2] - p[:-2, :-2])
        + 2.0 * (p[2:, 1:-1] - p[:-2, 1:-1])
        + (p[2:, 2:] - p[:-2, 2:])
    ) / 8.0
    return gx, gy


def _maxpool_same(x: jax.Array, k: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )


@partial(jax.jit, static_argnames=("num_corners", "window", "nms_radius",
                                   "border"))
def detect_corners(
    image: jax.Array,
    num_corners: int = 512,
    window: int = 5,
    nms_radius: int = 4,
    border: int = 12,
):
    """Top-K Shi-Tomasi corners of one [H, W] image.

    Returns (uv [K, 2] float32, score [K]); weak slots have score <= 0 and
    should be masked by callers. Scores are the structure tensor's minimum
    eigenvalue over a ``window`` x ``window`` patch.
    """
    h, w = image.shape
    gx, gy = _gradients(image.astype(jnp.float32))
    ixx = _box_filter(gx * gx, window)
    iyy = _box_filter(gy * gy, window)
    ixy = _box_filter(gx * gy, window)
    # min eigenvalue of [[ixx, ixy], [ixy, iyy]]
    tr = 0.5 * (ixx + iyy)
    det_rad = jnp.sqrt(
        jnp.maximum(0.25 * (ixx - iyy) ** 2 + ixy * ixy, 0.0)
    )
    score = tr - det_rad

    # non-max suppression + border mask
    is_max = score >= _maxpool_same(score, 2 * nms_radius + 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (row >= border) & (row < h - border)
        & (col >= border) & (col < w - border)
    )
    score = jnp.where(is_max & inside, score, -1.0)

    flat = score.reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, num_corners)
    uv = jnp.stack(
        [(top_idx % w).astype(jnp.float32),
         (top_idx // w).astype(jnp.float32)],
        axis=-1,
    )
    return uv, top_scores
