"""Faithful CPU reference pipeline: the denominator for end-to-end speedups.

The reference system's end-to-end path (SURVEY.md §3.3) is: per-pair OpenCV
stereo (rectify -> cv::StereoBM -> Q-matrix triangulation, stereo.cpp:91-193)
feeding a nanoflann kd-tree IDW DSM (dsm.cc:36-111) and the backward-grid
orthomosaic (ortho-backward-grid.cc:42-221). The reference repo publishes no
numbers, so this module reassembles that exact pipeline from its real
ingredients to measure one:

- rectification: the same Fusiello transforms (testing/numpy_ref.py) applied
  with cv2.warpPerspective — cv::remap with inverse-homography maps, as in
  rectifier.cpp:79-112;
- matching: cv2.StereoBM itself (the reference wraps this class,
  block-matching-bm.cpp) with the common.h:98-109 parameters;
- triangulation: the Q-matrix closed form (densifier.cpp:45-73), vectorized
  with NumPy (the reference's scalar loop is the same arithmetic);
- DSM IDW + backward-grid ortho: the native C++ reimplementations of the
  reference loops with its std::thread parFor (native/reference_baseline.cc)
  on all host cores.

This is deliberately the STRONGEST honest CPU baseline we can assemble:
OpenCV's SIMD matcher plus multithreaded native rasterization loops.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from aerial_mapper_tpu.mapgrid.grid import MapGeometry
from aerial_mapper_tpu.testing.numpy_ref import rectification_reference

_MIN_VALID_DISPARITY = 1.0  # densifier.cpp:60 keeps only d > 1


def _triangulate_np(disp, gray_rect, K, baseline, R_G_C_rect, t_G_C1):
    """Vectorized ``triangulate_reference`` (densifier.cpp:37-107): the same
    Q-matrix arithmetic as the loop oracle in testing/numpy_ref.py,
    including the fx/fy ratio on the y term. ``R_G_C_rect`` is the
    rect-camera-to-world rotation, applied as ``p_rect @ R.T`` (row-vector
    form of ``R @ p``) — convention locked against the loop oracle by
    tests/test_cpu_pipeline.py::test_triangulate_np_rotation_convention
    with non-ideal (yawed/pitched) cameras, where a transposed rotation
    would be meters off."""
    h, w = disp.shape
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    valid = disp > _MIN_VALID_DISPARITY
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    # Q-matrix form: w_q = disp / baseline; z = fx / w_q
    wq = disp / max(baseline, 1e-12)
    wq = np.where(valid, wq, 1.0)
    x = (u - cx) / wq
    y = ((fx / fy) * v - cy * (fx / fy)) / wq
    z = fx / wq
    p_rect = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    pts = p_rect @ R_G_C_rect.T + t_G_C1[None, :]
    return pts, gray_rect.reshape(-1), valid.reshape(-1)


def run_reference_pipeline_cpu(
    K: np.ndarray,
    Rs: np.ndarray,  # [N, 3, 3] camera-to-world
    ts: np.ndarray,  # [N, 3]
    images: np.ndarray,  # [N, H, W] float or uint8 gray
    geom: MapGeometry,
    use_every_nth: int = 7,
    num_disparities: int = 64,
    block_size: int = 15,
    texture_threshold: int = 20,
    uniqueness_ratio: int = 80,
    radius_sq: float = 2.0,
    growth: float = 1.1,
    max_radius_sq: float = 7.0,
    num_threads: int = 0,
    matcher_kind: str = "bm",
):
    """Run stereo -> DSM -> ortho on the CPU exactly as the reference would.

    ``matcher_kind``: "bm" (cv2.StereoBM, the demo flagfiles' choice) or
    "sgbm" (cv2.StereoSGBM with the reference defaults, common.h:85-96 —
    the reference's code default, use_BM = false).

    Returns (elevation [H, W], ortho [H, W], timings dict with
    'stereo'/'dsm'/'ortho'/'total' seconds).
    """
    import cv2

    from aerial_mapper_tpu.native import backward_grid_cpu, dsm_idw_cpu

    t_begin = time.perf_counter()
    # 0-based stride phase, matching bench.py's historical workload
    # (the production TPU drivers default to the reference phase n-1;
    # bench passes phase=0 so numerator and denominator agree)
    idx = list(range(0, len(images), use_every_nth))
    if len(idx) < 2:
        raise ValueError("need at least two subsampled frames")

    if matcher_kind == "sgbm":
        # reference SGBM defaults (common.h:85-96); block_size there is 9
        sg_block = 9 if block_size == 15 else block_size
        matcher = cv2.StereoSGBM_create(
            minDisparity=1, numDisparities=num_disparities,
            blockSize=sg_block, P1=120, P2=250, uniquenessRatio=10,
            disp12MaxDiff=0, speckleWindowSize=100, speckleRange=20,
            preFilterCap=35,
        )
    else:
        matcher = cv2.StereoBM_create(numDisparities=num_disparities,
                                      blockSize=block_size)
        matcher.setTextureThreshold(texture_threshold)
        matcher.setUniquenessRatio(uniqueness_ratio)
        matcher.setPreFilterCap(31)  # common.h:104 (pre_filter_size is the
        # reference wrapper's documented no-op, block-matching-bm.h:32-33)

    h, w = images.shape[1], images.shape[2]
    all_pts, all_valid = [], []
    t0 = time.perf_counter()
    for a, b in zip(idx[:-1], idx[1:]):
        R1, R2 = Rs[a], Rs[b]
        t1, t2 = np.asarray(ts[a], np.float64), np.asarray(ts[b], np.float64)
        R_rect, T1, T2, baseline = rectification_reference(
            np.asarray(K, np.float64), R1, R2, t1, t2
        )
        img1 = np.asarray(images[a], np.float32).astype(np.uint8)
        img2 = np.asarray(images[b], np.float32).astype(np.uint8)
        rect1 = cv2.warpPerspective(img1, T1, (w, h))  # rectifier.cpp:107-112
        rect2 = cv2.warpPerspective(img2, T2, (w, h))
        disp = matcher.compute(rect1, rect2).astype(np.float64) / 16.0
        pts, gray, valid = _triangulate_np(
            disp, rect1, np.asarray(K, np.float64), baseline,
            np.asarray(R_rect, np.float64), t1,
        )
        all_pts.append(pts)
        all_valid.append(valid)
    t_stereo = time.perf_counter() - t0

    pts = np.concatenate(all_pts)[np.concatenate(all_valid)]
    # z > -100 sanity filter (aerial-mapper-io.cc:319,339)
    pts = pts[pts[:, 2] > -100.0]

    # cell centers (row 0 = north edge, col 0 = west edge)
    jj, ii = np.meshgrid(np.arange(geom.width), np.arange(geom.height))
    qx = (geom.west + (jj + 0.5) * geom.resolution).ravel()
    qy = (geom.north - (ii + 0.5) * geom.resolution).ravel()

    t0 = time.perf_counter()
    values, hit = dsm_idw_cpu(
        pts, qx, qy, radius_sq=radius_sq, adaptive=True, growth=growth,
        max_radius_sq=max_radius_sq, num_threads=num_threads,
    )
    t_dsm = time.perf_counter() - t0
    elevation = np.where(hit, values, np.nan).reshape(geom.height, geom.width)

    cells = np.stack(
        [qx, qy, elevation.ravel().astype(np.float64)], axis=1
    )
    R_cw = np.transpose(np.asarray(Rs, np.float64), (0, 2, 1))
    t0 = time.perf_counter()
    ortho, _angle, _obs = backward_grid_cpu(
        cells, R_cw, np.asarray(ts, np.float64),
        np.asarray(images, np.float32),
        K[0, 0], K[1, 1], K[0, 2], K[1, 2], num_threads=num_threads,
    )
    t_ortho = time.perf_counter() - t0

    timings = {
        "stereo": t_stereo,
        "dsm": t_dsm,
        "ortho": t_ortho,
        # true wall time; the residual over the three stages is point
        # accumulation/copies, which the reference pipeline also pays
        "total": time.perf_counter() - t_begin,
    }
    return elevation, ortho.reshape(geom.height, geom.width), timings
