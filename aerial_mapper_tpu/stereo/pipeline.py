"""Virtual-stereo driver: image sequence -> dense point cloud.

Mirrors ``stereo::Stereo`` (``aerial_mapper_dense_pcl/src/stereo.cpp``):
consecutive (every-nth) frames form virtual stereo pairs — the previous frame
is the left camera, the new frame the right (stereo.cpp:127-147) — which are
undistorted, planar-rectified, matched, and triangulated into a world-frame
cloud.

TPU shape: per-pair homography algebra is O(1) host float64; all dense work
(undistort, rectify, cost volume, triangulation) is jitted device code with
shapes fixed by the camera, so the per-pair step compiles once and is reused
for the whole sequence. ``process_sequence`` returns fixed-size per-pair
point buffers + valid masks (static shapes; compaction happens at the
consumer, e.g. DSM binning, which drops invalid points for free).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aerial_mapper_tpu.camera.models import Camera
from aerial_mapper_tpu.camera.undistort import undistort_image
from aerial_mapper_tpu.config import BlockMatchingConfig, SgmConfig, StereoConfig
from aerial_mapper_tpu.stereo.matching import (
    block_matching_disparity,
    sgm_disparity,
)
from aerial_mapper_tpu.stereo.rectify import rectify_pair
from aerial_mapper_tpu.stereo.triangulate import triangulate_disparity


class StereoResult(NamedTuple):
    """Fixed-size output of one virtual-stereo pair."""

    points: jax.Array  # [H*W, 3] world-frame points
    intensities: jax.Array  # [H*W]
    valid: jax.Array  # [H*W] bool
    disparity: jax.Array  # [H, W]


class VirtualStereo:
    """Sequential-pair stereo engine (the reference's ``Stereo`` class)."""

    def __init__(
        self,
        camera: Camera,
        cfg: StereoConfig = StereoConfig(),
        bm_cfg: BlockMatchingConfig = BlockMatchingConfig(),
        sgm_cfg: SgmConfig = SgmConfig(),
    ):
        self.camera = camera
        self.cfg = cfg
        self.bm_cfg = bm_cfg
        self.sgm_cfg = sgm_cfg
        self._prev_image: Optional[jax.Array] = None
        self._prev_R: Optional[np.ndarray] = None
        self._prev_t: Optional[np.ndarray] = None

    # -- single-pair core ---------------------------------------------------
    def process_pair(
        self,
        image1: jax.Array,
        image2: jax.Array,
        R_G_C1: np.ndarray,
        t_G_C1: np.ndarray,
        R_G_C2: np.ndarray,
        t_G_C2: np.ndarray,
    ) -> StereoResult:
        """Undistort -> rectify -> match -> triangulate one pair
        (stereo.cpp:149-193)."""
        cam = self.camera
        if self.cfg.images_need_undistortion:
            image1 = undistort_image(cam, image1)
            image2 = undistort_image(cam, image2)

        rect = rectify_pair(
            cam.K, R_G_C1, R_G_C2, t_G_C1, t_G_C2, image1, image2
        )
        if self.cfg.matcher == "bm":
            disparity = block_matching_disparity(
                rect.image_left, rect.image_right, rect.mask, self.bm_cfg
            )
        elif self.cfg.matcher == "sgm":
            disparity = sgm_disparity(
                rect.image_left, rect.image_right, rect.mask, self.sgm_cfg
            )
        else:
            raise ValueError(f"Unknown matcher: {self.cfg.matcher}")

        points, intens, valid = triangulate_disparity(
            disparity,
            rect.image_left,
            rect.R_G_C_rect,
            jnp.asarray(t_G_C1, jnp.float32),
            rect.baseline,
            fx=cam.fx,
            fy=cam.fy,
            cx=cam.cx,
            cy=cam.cy,
        )
        return StereoResult(points, intens, valid, disparity)

    # -- streaming interface (addFrame semantics) ---------------------------
    def add_frame(
        self, T_G_C_R: np.ndarray, T_G_C_t: np.ndarray, image: jax.Array
    ) -> Optional[StereoResult]:
        """Feed one camera-frame pose + image; returns a result from the
        second frame on (stereo.cpp:113-147)."""
        if self._prev_image is None:
            self._prev_image = image
            self._prev_R = T_G_C_R
            self._prev_t = T_G_C_t
            return None
        result = self.process_pair(
            self._prev_image, image, self._prev_R, self._prev_t,
            T_G_C_R, T_G_C_t,
        )
        self._prev_image = image
        self._prev_R = T_G_C_R
        self._prev_t = T_G_C_t
        return result

    def reset(self):
        self._prev_image = None
        self._prev_R = None
        self._prev_t = None

    # -- batch interface (addFrames semantics) ------------------------------
    def process_sequence(
        self,
        images: Sequence[jax.Array],
        quats_G_C: np.ndarray,
        trans_G_C: np.ndarray,
    ) -> List[StereoResult]:
        """Every-nth subsampled consecutive pairs (stereo.cpp:82-110).

        ``quats_G_C``/``trans_G_C``: [N, 4] wxyz + [N, 3] camera-frame poses
        (callers convert body poses via the rig extrinsics first).
        """
        self.reset()
        # host-side float64 rotation matrices (UTM-scale precision)
        q = np.asarray(quats_G_C, dtype=np.float64)
        w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        Rs = np.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            axis=-1,
        ).reshape(-1, 3, 3)
        results: List[StereoResult] = []
        skip = 0
        for i in range(len(images)):
            skip += 1
            if skip % self.cfg.use_every_nth_image != 0:
                continue
            res = self.add_frame(Rs[i], trans_G_C[i], images[i])
            if res is not None:
                results.append(res)
        return results
