"""The map substrate: a layered raster as a JAX pytree.

TPU-native replacement for the ethz ``grid_map`` library wrapped by the
reference's ``grid_map::AerialGridMap`` (``aerial_mapper_grid_map/src/
aerial-mapper-grid-map.cc:23-49``): a dict of ``[H, W]`` float32 layers plus
static geometry, registered as a pytree so whole map states flow through
``jit`` / ``shard_map`` and tile-shard across devices.

Layer set and init values mirror the reference exactly
(aerial-mapper-grid-map.cc:25-48): ortho=255, elevation=NaN,
elevation_angle=0, the rest NaN/0.

Geometry convention (deliberate deviation from ethz grid_map's rotated index
frame, documented per SURVEY.md §7.1): row 0 = northern edge, col 0 = western
edge, i.e. GeoTiff-native axis order. ``resolution`` is meters/cell and cell
(i, j)'s center is at::

    easting  = center_easting  - delta_easting/2  + (j + 0.5) * resolution
    northing = center_northing + delta_northing/2 - (i + 0.5) * resolution
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.config import GridMapConfig

# The 9 reference layers (aerial-mapper-grid-map.cc:25-28).
LAYERS = (
    "ortho",
    "elevation",
    "elevation_angle",
    "num_observations",
    "elevation_angle_first_view",
    "delta",
    "observation_index",
    "observation_index_first",
    "colored_ortho",
)

_INIT_VALUES = {
    "ortho": 255.0,
    "elevation": float("nan"),
    "elevation_angle": 0.0,
    "num_observations": 0.0,
    "elevation_angle_first_view": float("nan"),
    "delta": float("nan"),
    "observation_index": float("nan"),
    "observation_index_first": float("nan"),
    "colored_ortho": float("nan"),
}


class MapGeometry(NamedTuple):
    """Static (hashable) raster geometry. Safe to close over in jit."""

    center_easting: float
    center_northing: float
    resolution: float
    height: int  # rows (northing extent / resolution)
    width: int  # cols (easting extent / resolution)

    @classmethod
    def from_config(cls, cfg: GridMapConfig) -> "MapGeometry":
        return cls(
            center_easting=float(cfg.center_easting),
            center_northing=float(cfg.center_northing),
            resolution=float(cfg.resolution),
            height=cfg.height,
            width=cfg.width,
        )

    @property
    def west(self) -> float:
        return self.center_easting - 0.5 * self.width * self.resolution

    @property
    def north(self) -> float:
        return self.center_northing + 0.5 * self.height * self.resolution

    @property
    def geotransform(self):
        """GDAL-style geotransform (x0, dx, 0, y0, 0, -dy) for GeoTiff export."""
        return (self.west, self.resolution, 0.0, self.north, 0.0, -self.resolution)


class MapState(NamedTuple):
    """layers: dict name -> [H, W] float32. A pytree; geometry rides along
    as auxiliary static data via closures, not in the tree."""

    layers: Dict[str, jax.Array]

    def layer(self, name: str) -> jax.Array:
        return self.layers[name]

    def with_layer(self, name: str, value: jax.Array) -> "MapState":
        new = dict(self.layers)
        new[name] = value
        return MapState(new)


def create_map_state(geom: MapGeometry, dtype=jnp.float32) -> MapState:
    layers = {
        name: jnp.full((geom.height, geom.width), _INIT_VALUES[name], dtype)
        for name in LAYERS
    }
    return MapState(layers)


def cell_centers(geom: MapGeometry, dtype=jnp.float32):
    """Return (easting [H, W], northing [H, W]) cell-center coordinate grids."""
    i = jax.lax.broadcasted_iota(dtype, (geom.height, geom.width), 0)
    j = jax.lax.broadcasted_iota(dtype, (geom.height, geom.width), 1)
    easting = geom.west + (j + 0.5) * geom.resolution
    northing = geom.north - (i + 0.5) * geom.resolution
    return easting, northing


def position_to_index(geom: MapGeometry, easting, northing):
    """Float (easting, northing) -> (row, col) integer cell indices (floor)."""
    col = jnp.floor((easting - geom.west) / geom.resolution).astype(jnp.int32)
    row = jnp.floor((geom.north - northing) / geom.resolution).astype(jnp.int32)
    return row, col
