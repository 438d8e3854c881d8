"""Typed stage artifacts: checkpoint/resume between pipeline stages.

The reference's implicit checkpointing is file-based: each demo can consume
the previous stage's text artifact instead of recomputing (SURVEY.md §5
"Checkpoint / resume": point clouds from txt at main-dsm.cc:78-81, poses
from txt, mosaics to jpg). We formalize that contract as npz artifacts with
schema versions so every stage of the pipeline is resumable:

- ``points``:  points [N, 3] f32, intensities [N] f32, valid [N] bool
- ``layers``:  the full MapState layer dict + geometry metadata
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from aerial_mapper_tpu.mapgrid.grid import MapGeometry

_SCHEMA_POINTS = 1
_SCHEMA_LAYERS = 1


def save_points(filename: str, points, intensities, valid) -> None:
    # atomic + suffix-consistent like save_layers: np.savez appends .npz
    # to suffix-less names (load_points would then miss the file), and a
    # crash mid-write must not leave a truncated checkpoint artifact
    import os

    d, base = os.path.split(filename)
    tmp = os.path.join(d, f".tmp{os.getpid()}_{base}")
    if not tmp.endswith(".npz"):
        tmp += ".npz"
    np.savez_compressed(
        tmp,
        schema=np.int32(_SCHEMA_POINTS),
        kind="points",
        points=np.asarray(points, np.float32),
        intensities=np.asarray(intensities, np.float32),
        valid=np.asarray(valid, bool),
    )
    os.replace(tmp, filename)


def load_points(filename: str):
    with np.load(filename, allow_pickle=False) as z:
        if str(z["kind"]) != "points":
            raise ValueError(f"{filename} is not a points artifact")
        return z["points"], z["intensities"], z["valid"]


def save_layers(filename: str, layers: Dict[str, np.ndarray],
                geom: MapGeometry) -> None:
    # atomic (temp + rename): the live-preview npz is re-written per
    # update while a resume might read it (np.savez appends .npz to names
    # without the suffix — keep it on the temp file)
    import os

    d, base = os.path.split(filename)
    tmp = os.path.join(d, f".tmp{os.getpid()}_{base}")
    if not tmp.endswith(".npz"):
        tmp += ".npz"
    payload = {f"layer_{k}": np.asarray(v) for k, v in layers.items()}
    np.savez_compressed(
        tmp,
        schema=np.int32(_SCHEMA_LAYERS),
        kind="layers",
        geom=np.asarray(
            [geom.center_easting, geom.center_northing, geom.resolution,
             geom.height, geom.width],
            np.float64,
        ),
        **payload,
    )
    os.replace(tmp, filename)


def load_layers(filename: str) -> Tuple[Dict[str, np.ndarray], MapGeometry]:
    with np.load(filename, allow_pickle=False) as z:
        if str(z["kind"]) != "layers":
            raise ValueError(f"{filename} is not a layers artifact")
        g = z["geom"]
        geom = MapGeometry(
            center_easting=float(g[0]),
            center_northing=float(g[1]),
            resolution=float(g[2]),
            height=int(g[3]),
            width=int(g[4]),
        )
        layers = {
            k[len("layer_"):]: z[k] for k in z.files if k.startswith("layer_")
        }
    return layers, geom
