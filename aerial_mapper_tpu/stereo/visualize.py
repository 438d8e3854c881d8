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


def cloud_topdown_panel(
    points: np.ndarray,  # [N, 3] world points
    west: float,
    north: float,
    resolution: float,
    height: int,
    width: int,
    palette: str = "terrain",
    z_range=None,
    background: int = 17,
) -> np.ndarray:
    """[H, W, 3] uint8 top-down scatter of a point cloud, colored by
    elevation — the live-preview analogue of the reference's growing
    PointCloud2 in rviz (stereo.cpp:78-79 publishes the cloud per frame;
    rviz renders exactly this nadir scatter for aerial scenes).

    Points rasterize into the same geotransform the map layers use (pixel
    (0,0) upper-left at (west, north)); multiple points per pixel keep
    the HIGHEST z (a nadir z-buffer, so canopy/roofs win like in rviz's
    top view). ``z_range`` fixes the palette normalization across
    preview frames (None = this cloud's finite range)."""
    from aerial_mapper_tpu.utils.palettes import apply_palette

    pts = np.asarray(points, np.float64).reshape(-1, 3)
    img_z = np.full((height, width), np.nan, np.float32)
    if pts.size:
        col = np.floor((pts[:, 0] - west) / resolution).astype(np.int64)
        row = np.floor((north - pts[:, 1]) / resolution).astype(np.int64)
        ok = (col >= 0) & (col < width) & (row >= 0) & (row < height) \
            & np.isfinite(pts[:, 2])
        flat = row[ok] * width + col[ok]
        zbuf = np.full(height * width, -np.inf, np.float32)
        np.maximum.at(zbuf, flat, pts[ok, 2].astype(np.float32))
        img_z = np.where(np.isfinite(zbuf), zbuf,
                         np.nan).reshape(height, width)
    vmin, vmax = (None, None) if z_range is None else z_range
    if vmin is None and not np.isfinite(img_z).any():
        vmin, vmax = 0.0, 1.0  # empty cloud: skip the all-NaN nanmin
    rgb = apply_palette(img_z, palette, vmin=vmin, vmax=vmax)
    empty = np.isnan(img_z)
    return np.where(empty[..., None], np.uint8(background),
                    rgb).astype(np.uint8)
