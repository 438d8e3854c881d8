"""Image loading/saving (host-side).

Replaces ``io::AerialMapperIO::loadImagesFromFile`` (``aerial_mapper_io/src/
aerial-mapper-io.cc:207-249``): load by ``prefix + index + ".jpg"`` or by an
explicit name list, grayscale or color. Returns float32 numpy arrays in
[0, 255] ready for device upload (the whole stack moves to HBM in one
transfer when passed to jnp.stack).

``backend`` selects the decoder: "native" = the thread-pool prefetching
C++ loader (native/image_loader.cc; decodes the whole sequence in
parallel), "pil" = single-threaded PIL, "auto" (default) = native when the
library builds, PIL otherwise. PNG/PNM gray decodes are bit-identical
between the two; JPEG lumas may differ ~1 gray level.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np
from PIL import Image


def _load_one(path: str, color: bool) -> np.ndarray:
    with Image.open(path) as img:
        img = img.convert("RGB" if color else "L")
        return np.asarray(img, dtype=np.float32)


def _load_many(paths: Sequence[str], color: bool, backend: str):
    if backend not in ("auto", "native", "pil"):
        raise ValueError(f"unknown image backend {backend!r}")
    if backend in ("auto", "native"):
        from aerial_mapper_tpu.io.native_loader import (
            load_images_native,
            native_loader_available,
        )

        if native_loader_available():
            return load_images_native(paths, color=color)
        if backend == "native":
            raise RuntimeError("native image loader unavailable")
    return [_load_one(p, color) for p in paths]


def load_images_by_prefix(
    filename_base: str,
    num_poses: int,
    color: bool = False,
    extension: str = ".jpg",
    backend: str = "auto",
) -> List[np.ndarray]:
    """Load ``filename_base + str(i) + extension`` for i in [0, num_poses)
    (aerial-mapper-io.cc:207-227)."""
    paths = []
    for i in range(num_poses):
        path = f"{filename_base}{i}{extension}"
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        paths.append(path)
    if not paths:
        raise ValueError("No images loaded.")
    return _load_many(paths, color, backend)


def load_images_by_names(
    directory: str,
    image_names: Sequence[str],
    color: bool = False,
    extension: str = ".png",
    backend: str = "auto",
) -> List[np.ndarray]:
    """Load ``directory/name + extension`` per name (aerial-mapper-io.cc:229-249).
    Names that already carry an extension are used as-is."""
    paths = [
        os.path.join(directory,
                     name if os.path.splitext(name)[1] else name + extension)
        for name in image_names
    ]
    if not paths:
        raise ValueError("No images loaded.")
    return _load_many(paths, color, backend)


def save_image(path: str, array: np.ndarray) -> None:
    """Write a uint8 image ATOMICALLY (temp file + rename): live-preview
    consumers (io/preview_server.py) read these paths while the mapping
    loop rewrites them, and an in-place write would serve torn PNGs."""
    arr = np.clip(np.asarray(array), 0, 255).astype(np.uint8)
    d, base = os.path.split(path)
    tmp = os.path.join(d, f".tmp{os.getpid()}_{base}")
    Image.fromarray(arr).save(tmp)
    os.replace(tmp, path)
