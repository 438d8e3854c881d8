"""Track building (host union-find) and landmark triangulation.

Pairwise matches between consecutive frames are chained into multi-frame
tracks with a union-find on the host — orchestration-scale work (thousands
of matches), not kernel work. Triangulation of every track is a vmapped
linear least squares on device: for rays (o_i, d_i) the point minimizing
sum of squared ray distances solves ``sum(I - d d^T) X = sum (I - d d^T) o``
— a batched 3x3 solve, the classic midpoint method.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.ba.bundle_adjust import BAProblem


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        while self.parent.setdefault(x, x) != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def build_tracks(
    pair_matches: List[Tuple[int, int, np.ndarray, np.ndarray]],
    keypoints: List[np.ndarray],
    min_track_length: int = 2,
    max_observations: int = 0,
):
    """Chain pairwise matches into tracks.

    ``pair_matches``: list of (frame_i, frame_j, idx_i [M], idx_j [M]).
    ``keypoints``: per-frame [K, 2] pixel arrays.

    Returns a BAProblem (host numpy arrays, padded to ``max_observations``
    if given) plus the track count. Tracks observing the same frame twice
    are dropped (inconsistent chains).
    """
    uf = _UnionFind()
    for fi, fj, idx_i, idx_j in pair_matches:
        for a, b in zip(np.asarray(idx_i), np.asarray(idx_j)):
            uf.union((fi, int(a)), (fj, int(b)))

    groups = {}
    for key in list(uf.parent.keys()):
        groups.setdefault(uf.find(key), []).append(key)

    cam_idx, lm_idx, uvs = [], [], []
    track_id = 0
    for members in groups.values():
        frames = [m[0] for m in members]
        if len(members) < min_track_length or len(set(frames)) != len(frames):
            continue
        for f, k in members:
            cam_idx.append(f)
            lm_idx.append(track_id)
            uvs.append(keypoints[f][k])
        track_id += 1

    cam_idx = np.asarray(cam_idx, np.int32)
    lm_idx = np.asarray(lm_idx, np.int32)
    uvs = np.asarray(uvs, np.float32).reshape(-1, 2)
    valid = np.ones(cam_idx.shape[0], bool)

    if max_observations:
        pad = max_observations - cam_idx.shape[0]
        if pad < 0:
            raise ValueError("max_observations too small")
        cam_idx = np.pad(cam_idx, (0, pad))
        lm_idx = np.pad(lm_idx, (0, pad))
        uvs = np.pad(uvs, ((0, pad), (0, 0)))
        valid = np.pad(valid, (0, pad))

    problem = BAProblem(
        cam_idx=jnp.asarray(cam_idx),
        lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uvs),
        valid=jnp.asarray(valid),
    )
    return problem, track_id


def triangulate_tracks(
    problem: BAProblem,
    quats: jax.Array,  # [N, 4] camera-to-world
    trans: jax.Array,  # [N, 3]
    num_landmarks: int,
    fx: float, fy: float, cx: float, cy: float,
) -> jax.Array:
    """[L, 3] midpoint triangulation of every track from all observations."""
    from aerial_mapper_tpu.geo.se3 import quat_rotate

    xn = (problem.uv[:, 0] - cx) / fx
    yn = (problem.uv[:, 1] - cy) / fy
    d_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    q = quats[problem.cam_idx]
    o = trans[problem.cam_idx]
    d = quat_rotate(q, d_cam)  # world-frame ray directions

    eye = jnp.eye(3)
    P = eye[None] - d[:, :, None] * d[:, None, :]  # [M, 3, 3]
    P = jnp.where(problem.valid[:, None, None], P, 0.0)
    rhs = jnp.einsum("mij,mj->mi", P, o)

    A = jax.ops.segment_sum(P, problem.lm_idx, num_segments=num_landmarks)
    b = jax.ops.segment_sum(rhs, problem.lm_idx, num_segments=num_landmarks)
    # regularize empty/degenerate tracks
    A = A + 1e-6 * eye[None]
    return jnp.linalg.solve(A, b[..., None])[..., 0]
