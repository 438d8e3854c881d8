"""Device-mesh construction for tile/pair-sharded mapping.

The reference's entire parallel runtime is one std::thread parallel-for over
grid cells on a single host (``aerial_mapper_utils/.../utils-common.h:29-59``
— SURVEY.md §2.3). The TPU-native equivalents are axes of a
``jax.sharding.Mesh``:

- ``tiles``: map row-bands (the cell-sharding analogue; DSM/ortho rasters)
- ``pairs``: virtual-stereo pair batches (the sequential-image-loop analogue)

Multi-host runs initialize ``jax.distributed`` first; the mesh then spans
the pod slice and collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Sequence[str] = ("tiles",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With ``shape=None`` the first axis absorbs all devices. For 2-D meshes
    (e.g. ("pairs", "tiles")) pass an explicit shape whose product equals the
    device count.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
