"""Disparity -> world-frame point cloud, vectorized Q-matrix triangulation.

Dense rendition of the reference's per-pixel triangulation loop
(``aerial_mapper_dense_pcl/src/densifier.cpp:37-107``):

    w = disparity / baseline
    x = (u - cx) / w
    y = ((fx/fy) * v - cy * (fx/fy)) / w
    z = fx / w
    p_world = R_G_C_rect @ [x, y, z] + t_G_C1

Invalid pixels (disparity <= kMaxInvalidDisparity = 1) produce masked-out
entries instead of being compacted — static shapes keep this jittable; the
valid mask travels with the cloud (downstream binning drops invalid points).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.stereo.matching import INVALID_DISPARITY


@partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy"))
def triangulate_disparity(
    disparity: jax.Array,
    intensity_image: jax.Array,
    R_G_C_rect: jax.Array,
    t_G_C1: jax.Array,
    baseline: jax.Array,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
):
    """Returns (points [H*W, 3], intensities [H*W], valid [H*W]).

    ``intensity_image`` is the rectified left image — the reference samples
    point color from it (densifier.cpp:55-56, 85-92).
    """
    h, w = disparity.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    valid = disparity > INVALID_DISPARITY
    d_safe = jnp.where(valid, disparity, 1.0)
    wq = d_safe / baseline  # Q(3,2) * disparity (densifier.cpp:62)

    x = (u - cx) / wq
    y = ((fx / fy) * v - cy * (fx / fy)) / wq
    z = fx / wq
    p_rect = jnp.stack([x, y, z], axis=-1)  # [H, W, 3], rectified frame 1

    # R_G_C_rect (rectifier.cpp:55-58) has rows = rectified axes in world
    # coords, i.e. it is the world->rect rotation (it appears as R in
    # P = K[R | -R t], rectifier.cpp:63-70). Camera->world is therefore
    # R^T. NOTE the reference multiplies R * p_rect without the transpose
    # (densifier.cpp:72) — for its near-nadir geometry R is almost symmetric
    # so the error is tiny there; we use the correct R^T (documented
    # deviation, see SURVEY.md "parity quirks").
    p_world = (
        jnp.einsum("ij,hwj->hwi", R_G_C_rect.T, p_rect,
                   precision=jax.lax.Precision.HIGHEST)
        + t_G_C1
    )

    valid &= jnp.all(jnp.isfinite(p_world), axis=-1)
    return (
        p_world.reshape(-1, 3),
        intensity_image.reshape(-1),
        valid.reshape(-1),
    )
