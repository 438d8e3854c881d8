"""NumPy-faithful reimplementations of the reference's math.

These are deliberate, loop-structured ports of the *algorithms* in
ethz-asl/aerial_mapper (cited per function), used as golden values in parity
tests and as the measured CPU baseline for ``bench.py`` (BASELINE.md asks for
a measured denominator since the reference repo publishes no numbers). They
are NOT used in the production TPU path.
"""

from __future__ import annotations

import math

import numpy as np


def idw_reference(
    points_xy: np.ndarray,
    payload: np.ndarray,
    cell_centers_xy: np.ndarray,
    radius_sq: float,
    adaptive: bool,
    growth: float,
    max_radius_sq: float,
    exact_match_shortcut: bool = True,
):
    """Brute-force kd-tree-free rendition of dsm.cc:54-111 / ortho-from-pcl.cc:51-107.

    ``cell_centers_xy``: [M, 2] query positions. Returns (values [M], hit [M]).
    nanoflann returns squared L2 distances, so ``radius_sq`` thresholds d^2
    and weights are 1/d^2 — exactly the reference behavior.
    """
    m = cell_centers_xy.shape[0]
    values = np.zeros(m)
    hit = np.zeros(m, dtype=bool)
    for ci in range(m):
        d2 = np.sum((points_xy - cell_centers_xy[ci]) ** 2, axis=1)
        r = radius_sq
        idx = np.nonzero(d2 < r)[0]
        if adaptive and idx.size == 0 and points_xy.shape[0] > 0:
            # max_radius_sq=None: the reference's UNBOUNDED growth loop
            # (ortho-from-pcl.cc:63-71 has no cap)
            lam = 1.0
            while idx.size == 0:
                idx = np.nonzero(d2 < lam * radius_sq)[0]
                lam *= growth
                if max_radius_sq is not None \
                        and lam * radius_sq > max_radius_sq:
                    break
        if idx.size == 0:
            continue
        num = 0.0
        den = 0.0
        exact = False
        for i in idx:
            if d2[i] == 0.0:
                # FIRST exact hit wins and the loop keeps it (the native
                # baseline's `d2s[k] == 0.0 && !exact` guard; a later
                # exact point must not overwrite it). With the shortcut
                # disabled the reference's 1/d^2 arithmetic would produce
                # inf/inf — the first-exact semantics are the only
                # finite-valued reading, so they apply in both modes.
                if not exact:
                    num = payload[i]
                    den = 1.0
                    exact = True
            elif not exact:
                num += payload[i] / d2[i]
                den += 1.0 / d2[i]
        values[ci] = num / den
        hit[ci] = True
    return values, hit


def rectification_reference(K, R_G_C1, R_G_C2, t_G_C1, t_G_C2):
    """Fusiello planar rectification (rectifier.cpp:34-78), float64.

    Returns (R_G_C_rect, T1_rect, T2_rect, baseline).
    """
    x = t_G_C2 - t_G_C1
    baseline = np.linalg.norm(x)
    y = np.cross(R_G_C1[:, 2], x)
    z = np.cross(x, y)
    R_rect = np.stack(
        [x / np.linalg.norm(x), y / np.linalg.norm(y), z / np.linalg.norm(z)],
        axis=0,
    )  # rows = new axes  (rectifier.cpp:55-58 builds columns then transposes)
    P1 = K @ np.hstack([R_rect, (R_rect @ (-t_G_C1))[:, None]])
    P2 = K @ np.hstack([R_rect, (R_rect @ (-t_G_C2))[:, None]])
    Q1 = K @ R_G_C1.T
    Q2 = K @ R_G_C2.T
    T1 = P1[:, :3] @ np.linalg.inv(Q1)
    T2 = P2[:, :3] @ np.linalg.inv(Q2)
    return R_rect, T1, T2, baseline


def triangulate_reference(disparity, image_left, K, baseline, R_G_C, t_G_C1,
                          max_invalid_disparity=1.0):
    """Q-matrix triangulation loop (densifier.cpp:37-107), float64.

    Returns (points [N, 3], intensities [N]) for valid pixels in scan order.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    h, w = disparity.shape
    pts, intens = [], []
    for v in range(h):
        for u in range(w):
            d = disparity[v, u]
            if d > max_invalid_disparity:
                wq = (1.0 / baseline) * d
                p_r1 = np.array(
                    [
                        (u - cx) / wq,
                        ((fx / fy) * v - cy * (fx / fy)) / wq,
                        fx / wq,
                    ]
                )
                p_g = R_G_C @ p_r1 + t_G_C1
                if not np.isinf(p_g[2]):
                    pts.append(p_g)
                    intens.append(image_left[v, u])
    return (
        np.asarray(pts).reshape(-1, 3),
        np.asarray(intens),
    )


def backward_grid_reference(
    cell_positions,  # [M, 3] (easting, northing, elevation)
    R_G_Cs,  # [N, 3, 3]
    t_G_Cs,  # [N, 3]
    images,  # [N, H, W] grayscale
    K,
):
    """Best-angle backward-grid texturing loop (ortho-backward-grid.cc:56-121).

    Returns (ortho [M], angle [M], obs_index [M]) with -1 obs_index where no
    image sees the cell. Pinhole-only (no distortion), as in the undistorted
    reference path.
    """
    n = R_G_Cs.shape[0]
    height, width = images.shape[1], images.shape[2]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    m = cell_positions.shape[0]
    ortho = np.full(m, 255.0)
    angle = np.zeros(m)
    obs = np.full(m, -1.0)
    for ci in range(m):
        lm = cell_positions[ci]
        if not np.isfinite(lm[2]):
            continue
        for i in range(n):
            pc = R_G_Cs[i].T @ (lm - t_G_Cs[i])
            if pc[2] <= 1e-6:
                continue
            u = fx * pc[0] / pc[2] + cx
            v = fy * pc[1] / pc[2] + cy
            if not (0.0 <= u < width and 0.0 <= v < height):
                continue
            norm_u = np.linalg.norm(pc)
            alpha = math.asin(abs(pc[2]) / norm_u)
            if abs(alpha) > angle[ci]:
                angle[ci] = abs(alpha)
                obs[ci] = i
                kp_x = min(int(round(u)), width - 1)
                kp_y = min(int(round(v)), height - 1)
                ortho[ci] = images[i][kp_y, kp_x]
    return ortho, angle, obs


def sgm_aggregate_reference(cost_hwd: np.ndarray, p1: float, p2: float,
                            num_directions: int = 8) -> np.ndarray:
    """Loop-faithful SGM directional aggregation oracle, [H, W, D] float64.

    Per-path Hirschmuller recurrence with a fresh restart at every image
    border (what cv::StereoSGBM's per-direction Lr buffers do) — the
    parity target for ``stereo.matching.sgm_aggregate``'s sheared
    restart-flag formulation. Mirrors its d-edge treatment exactly
    (the d+-1 neighbor index is CLAMPED, costing that copy +p1).
    """
    h, w, d = cost_hwd.shape
    c = cost_hwd.astype(np.float64)
    dirs4 = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    dirs8 = dirs4 + [(1, 1), (-1, -1), (1, -1), (-1, 1)]
    dirs = dirs8 if num_directions >= 8 else dirs4
    agg = np.zeros_like(c)
    for di, dj in dirs:
        L = np.zeros_like(c)
        ii = range(h) if di >= 0 else range(h - 1, -1, -1)
        for i in ii:
            jj = range(w) if dj >= 0 else range(w - 1, -1, -1)
            for j in jj:
                pi, pj = i - di, j - dj
                if 0 <= pi < h and 0 <= pj < w:
                    prev = L[pi, pj]
                    m = prev.min()
                    up = prev[np.maximum(np.arange(d) - 1, 0)] + p1
                    down = prev[np.minimum(np.arange(d) + 1, d - 1)] + p1
                    best = np.minimum(np.minimum(prev, up),
                                      np.minimum(down, m + p2))
                    L[i, j] = c[i, j] + best - m
                else:
                    L[i, j] = c[i, j]
        agg += L
    return agg
