"""Descriptor matching: MXU similarity + mutual-NN + ratio + epipolar gate.

One [K, D] @ [D, K] matmul computes every pairwise zero-mean NCC; mutual
nearest neighbors with Lowe's ratio test give putative matches; since
approximate poses are always available in this system (PIX4D/COLMAP
trajectories), geometric verification is a vectorized epipolar-distance
gate instead of RANSAC — cheaper, deterministic, and jittable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def match_descriptors(
    desc1: jax.Array,  # [K, D]
    desc2: jax.Array,  # [K, D]
    valid1: jax.Array,  # [K] bool (detector score > 0)
    valid2: jax.Array,
    min_similarity: float = 0.6,
    ratio: float = 1.0,
):
    # ratio defaults to 1.0 (off): on repetitive aerial textures the
    # second-best NCC is legitimately high; mutual-NN + the epipolar gate
    # do the disambiguation. Set ~0.9 for distinctive scenes.
    """Mutual-NN matches. Returns (idx2_of_1 [K] int32, matched [K] bool):
    corner i of image 1 matches corner idx2_of_1[i] of image 2."""
    sim = jnp.dot(desc1, desc2.T, preferred_element_type=jnp.float32)
    neg = -2.0
    sim = jnp.where(valid1[:, None] & valid2[None, :], sim, neg)

    best12 = jnp.argmax(sim, axis=1)  # [K]
    best21 = jnp.argmax(sim, axis=0)  # [K]
    k = desc1.shape[0]
    rows = jnp.arange(k)
    best_sim = sim[rows, best12]

    # Lowe ratio on similarity: second best must be clearly worse
    sim_wo_best = sim.at[rows, best12].set(neg)
    second = jnp.max(sim_wo_best, axis=1)
    mutual = best21[best12] == rows
    matched = mutual & (best_sim > min_similarity) & valid1
    if ratio < 1.0:
        # strict < would also reject EXACT similarity ties at ratio=1.0
        # (repetitive textures — the very case the default disables the
        # test for), so >= 1 skips the comparison entirely
        matched &= second < best_sim * ratio + (1 - ratio) * neg
    return best12.astype(jnp.int32), matched


def epipolar_gate(
    uv1: jax.Array,  # [K, 2] pixels in image 1
    uv2: jax.Array,  # [K, 2] matched pixels in image 2
    R1: jax.Array, t1: jax.Array,  # camera-to-world pose of image 1
    R2: jax.Array, t2: jax.Array,
    fx: float, fy: float, cx: float, cy: float,
    threshold_px: float = 3.0,
    cam=None,
):
    """[K] bool: symmetric epipolar distance below threshold.

    E = [t_rel]_x R_rel in camera-2-from-camera-1 coordinates; distances
    are evaluated in pixels using the focal length scale. Pass ``cam`` (a
    ``camera.models.Camera``) when the keypoints live in DISTORTED image
    space: the normalized coordinates are then pushed through
    ``undistort_points`` before the epipolar algebra — a radtan lens
    displaces peripheral pixels by tens of px, far beyond the threshold,
    so a distortion-blind gate culls correct matches (round-4 review).
    """
    R_rel = R2.T @ R1  # cam1 -> cam2 rotation
    t_rel = R2.T @ (t1 - t2)  # cam1 origin in cam2 frame
    tx = jnp.array(
        [
            [0.0, -t_rel[2], t_rel[1]],
            [t_rel[2], 0.0, -t_rel[0]],
            [-t_rel[1], t_rel[0], 0.0],
        ]
    )
    E = tx @ R_rel

    def norm_coords(uv):
        return jnp.stack(
            [(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy,
             jnp.ones_like(uv[:, 0])],
            axis=-1,
        )

    x1 = norm_coords(uv1)
    x2 = norm_coords(uv2)
    if cam is not None and cam.dist_kind != "none":
        from aerial_mapper_tpu.camera.models import undistort_points

        x1 = x1.at[:, :2].set(undistort_points(cam, x1[:, :2]))
        x2 = x2.at[:, :2].set(undistort_points(cam, x2[:, :2]))
    Ex1 = x1 @ E.T  # [K, 3] epipolar lines in image 2
    Etx2 = x2 @ E  # lines in image 1
    x2tEx1 = jnp.sum(x2 * Ex1, axis=-1)
    f = 0.5 * (fx + fy)
    d2 = x2tEx1**2 * (
        1.0 / jnp.maximum(Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2, 1e-12)
        + 1.0 / jnp.maximum(Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2, 1e-12)
    )
    return jnp.sqrt(d2) * f < threshold_px
