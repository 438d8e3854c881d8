"""Debug visualizations for the stereo stage.

Replaces ``Stereo::visualizeRectification`` (stereo.cpp:206-223): the
classic 2x2 panel — undistorted pair on top, rectified pair with horizontal
epipolar rule lines below — written as a PNG instead of a cv::imshow window.
"""

from __future__ import annotations

import numpy as np


def rectification_panel(
    image1: np.ndarray,
    image2: np.ndarray,
    rect1: np.ndarray,
    rect2: np.ndarray,
    line_spacing: int = 50,
) -> np.ndarray:
    """[2H, 2W] uint8 panel with epipolar rule lines on the rectified row."""
    def u8(x):
        return np.clip(np.asarray(x), 0, 255).astype(np.uint8)

    top = np.concatenate([u8(image1), u8(image2)], axis=1)
    bottom = np.concatenate([u8(rect1), u8(rect2)], axis=1)
    for y in range(line_spacing, bottom.shape[0], line_spacing):
        bottom[y, :] = 255
    return np.concatenate([top, bottom], axis=0)


def save_rectification_panel(path: str, image1, image2, rect1, rect2,
                             line_spacing: int = 50) -> None:
    from aerial_mapper_tpu.io.images import save_image

    save_image(path, rectification_panel(image1, image2, rect1, rect2,
                                         line_spacing))
