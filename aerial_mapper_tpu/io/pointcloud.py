"""Point cloud text I/O: ``x y z intensity`` rows.

Replaces ``io::AerialMapperIO::loadPointCloudFromFile``
(``aerial_mapper_io/src/aerial-mapper-io.cc:309-347``), including the
``z > -100`` sanity filter.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_MIN_VALID_Z = -100.0  # aerial-mapper-io.cc:319,339


def load_point_cloud_txt(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (points [N, 3] float64, intensities [N] float64)."""
    data = np.loadtxt(filename, dtype=np.float64)
    if data.ndim == 1:
        data = data.reshape(1, -1)
    if data.shape[1] == 3:
        points, intens = data, np.zeros(data.shape[0])
    else:
        points, intens = data[:, :3], data[:, 3]
    keep = points[:, 2] > _MIN_VALID_Z
    if not keep.any():
        raise ValueError("No valid points in " + filename)
    return points[keep], intens[keep]


def save_point_cloud_txt(filename: str, points: np.ndarray,
                         intensities=None) -> None:
    points = np.asarray(points)
    if intensities is None:
        intensities = np.zeros(points.shape[0])
    with open(filename, "w") as f:
        for p, i in zip(points, np.asarray(intensities)):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {int(round(float(i)))}\n")
