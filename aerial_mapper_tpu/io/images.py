"""Image loading/saving (host-side, PIL).

Replaces ``io::AerialMapperIO::loadImagesFromFile`` (``aerial_mapper_io/src/
aerial-mapper-io.cc:207-249``): load by ``prefix + index + ".jpg"`` or by an
explicit name list, grayscale or color. Returns float32 numpy arrays in
[0, 255] ready for device upload (the whole stack moves to HBM in one
transfer when passed to jnp.stack).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def _load_one(path: str, color: bool) -> np.ndarray:
    with Image.open(path) as img:
        img = img.convert("RGB" if color else "L")
        return np.asarray(img, dtype=np.float32)


def load_images_by_prefix(
    filename_base: str,
    num_poses: int,
    color: bool = False,
    extension: str = ".jpg",
) -> List[np.ndarray]:
    """Load ``filename_base + str(i) + extension`` for i in [0, num_poses)
    (aerial-mapper-io.cc:207-227)."""
    images = []
    for i in range(num_poses):
        path = f"{filename_base}{i}{extension}"
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        images.append(_load_one(path, color))
    if not images:
        raise ValueError("No images loaded.")
    return images


def load_images_by_names(
    directory: str,
    image_names: Sequence[str],
    color: bool = False,
    extension: str = ".png",
) -> List[np.ndarray]:
    """Load ``directory/name + extension`` per name (aerial-mapper-io.cc:229-249).
    Names that already carry an extension are used as-is."""
    images = []
    for name in image_names:
        fname = name if os.path.splitext(name)[1] else name + extension
        images.append(_load_one(os.path.join(directory, fname), color))
    if not images:
        raise ValueError("No images loaded.")
    return images


def save_image(path: str, array: np.ndarray) -> None:
    arr = np.clip(np.asarray(array), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
