"""End-to-end pose refinement: detect -> match -> tracks -> triangulate -> BA.

The pipeline stage BASELINE.json config 4 asks for: refine a PIX4D/COLMAP
(or otherwise approximate) trajectory by windowed bundle adjustment over
feature tracks before rasterization. Device work (detection, description,
matching, triangulation, BA) is batched/jitted; the host only chains match
graphs into tracks.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.ba.bundle_adjust import BAState, bundle_adjust
from aerial_mapper_tpu.camera.models import Camera
from aerial_mapper_tpu.config import BundleAdjustmentConfig
from aerial_mapper_tpu.features.describe import describe_patches
from aerial_mapper_tpu.features.detect import detect_corners
from aerial_mapper_tpu.features.match import epipolar_gate, match_descriptors
from aerial_mapper_tpu.features.tracks import build_tracks, triangulate_tracks
from aerial_mapper_tpu.io.poses import _rot_matrix_np

logger = logging.getLogger("aerial_mapper_tpu")


def refine_poses(
    images: Sequence[jax.Array],
    quats_G_C: np.ndarray,  # [N, 4] camera-to-world (approximate)
    trans_G_C: np.ndarray,  # [N, 3]
    cam: Camera,
    ba_cfg: BundleAdjustmentConfig = BundleAdjustmentConfig(),
    num_corners: int = 512,
    match_window: int = 2,
    epipolar_threshold_px: float = 4.0,
    min_track_length: int = 2,
):
    """Returns (quats_refined [N, 4], trans_refined [N, 3], stats dict)."""
    n = len(images)
    kps, descs, valids = [], [], []
    for i in range(n):
        img = jnp.asarray(images[i], jnp.float32)
        uv, score = detect_corners(img, num_corners=num_corners)
        desc = describe_patches(img, uv)
        kps.append(np.asarray(uv))
        descs.append(desc)
        valids.append(score > 0)

    Rs = np.stack([_rot_matrix_np(q) for q in np.asarray(quats_G_C)])
    pair_matches = []
    total_matches = 0
    for i in range(n):
        for j in range(i + 1, min(i + 1 + match_window, n)):
            idx2, matched = match_descriptors(
                descs[i], descs[j], valids[i], valids[j]
            )
            uv1 = jnp.asarray(kps[i])
            uv2 = jnp.asarray(kps[j])[idx2]
            gate = epipolar_gate(
                uv1, uv2,
                jnp.asarray(Rs[i], jnp.float32),
                jnp.asarray(trans_G_C[i], jnp.float32),
                jnp.asarray(Rs[j], jnp.float32),
                jnp.asarray(trans_G_C[j], jnp.float32),
                cam.fx, cam.fy, cam.cx, cam.cy,
                threshold_px=epipolar_threshold_px,
                cam=cam,  # keypoints live in distorted image space
            )
            keep = np.asarray(matched & gate)
            ii = np.nonzero(keep)[0]
            if ii.size == 0:
                continue
            pair_matches.append((i, j, ii, np.asarray(idx2)[ii]))
            total_matches += ii.size

    problem, num_tracks = build_tracks(
        pair_matches, kps, min_track_length=min_track_length
    )
    if num_tracks < 8:
        logger.warning("refine_poses: only %d tracks; returning input poses",
                       num_tracks)
        return quats_G_C, trans_G_C, {"tracks": num_tracks,
                                      "matches": total_matches}

    # bucket observation and landmark counts to powers of two: both are
    # STATIC shapes of the jitted BA program, and the windowed driver
    # would otherwise recompile every window (remote compiles run 3 s to
    # >9 min on this toolchain, CLAUDE.md). Padded observations carry
    # valid=False; padded landmarks have no observations (triangulation
    # regularizes them, BA gives them damped no-op solves).
    def _bucket(x: int, floor: int = 256) -> int:
        b = floor
        while b < x:
            b *= 2
        return b

    m_real = int(np.asarray(problem.valid).shape[0])
    problem, _ = build_tracks(
        pair_matches, kps, min_track_length=min_track_length,
        max_observations=_bucket(m_real),
    )
    n_lms = _bucket(num_tracks)

    quats_j = jnp.asarray(quats_G_C, jnp.float32)
    trans_j = jnp.asarray(trans_G_C, jnp.float32)
    landmarks = triangulate_tracks(
        problem, quats_j, trans_j, n_lms,
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    state0 = BAState(quats=quats_j, trans=trans_j, landmarks=landmarks)
    refined = bundle_adjust(
        state0, problem, cam, ba_cfg,
        n_cams=n, n_lms=n_lms,
    )
    stats = {"tracks": num_tracks, "matches": total_matches,
             "observations": int(np.asarray(problem.valid).sum())}
    logger.info("refine_poses: %s", stats)
    return (
        np.asarray(refined.quats, np.float64),
        np.asarray(refined.trans, np.float64),
        stats,
    )


def refine_poses_windowed(
    images: Sequence[jax.Array],
    quats_G_C: np.ndarray,
    trans_G_C: np.ndarray,
    cam: Camera,
    window_size: int = 20,
    overlap: int = 5,
    ba_cfg: BundleAdjustmentConfig = BundleAdjustmentConfig(),
    **refine_kwargs,
):
    """Sliding-window pose refinement over long sequences.

    Each window is refined with :func:`refine_poses`; the already-refined
    overlap poses carry the previous window's result forward (they re-enter
    the next window as its initialization, and the position prior in the BA
    keeps the windows consistent). Memory stays bounded by the window size
    regardless of sequence length — the "windowed bundle adjustment" of the
    north-star plan (BASELINE.json config 4).
    """
    n = len(images)
    if n <= window_size:
        return refine_poses(images, quats_G_C, trans_G_C, cam,
                            ba_cfg=ba_cfg, **refine_kwargs)

    quats = np.array(quats_G_C, np.float64)
    trans = np.array(trans_G_C, np.float64)
    stats_all = {"tracks": 0, "matches": 0, "windows": 0}
    stride = max(window_size - overlap, 1)
    start = 0
    while start < n - overlap:
        stop = min(start + window_size, n)
        q_w, t_w, stats = refine_poses(
            images[start:stop], quats[start:stop], trans[start:stop], cam,
            ba_cfg=ba_cfg, **refine_kwargs,
        )
        quats[start:stop] = q_w
        trans[start:stop] = t_w
        stats_all["tracks"] += stats.get("tracks", 0)
        stats_all["matches"] += stats.get("matches", 0)
        stats_all["windows"] += 1
        if stop == n:
            break
        start += stride
    logger.info("refine_poses_windowed: %s", stats_all)
    return quats, trans, stats_all
