"""Tile- and pair-sharded map operators (shard_map over a device mesh).

TPU-native replacement for the reference's cell-sharded ``utils::parFor``
thread parallelism (SURVEY.md §2.3): map rasters are split into row bands
across the ``tiles`` mesh axis; stereo pair batches are split across every
device. Points are exchanged with one ``all_gather`` (pairs -> tiles
boundary); raster updates stay entirely local to their band — the IDW
window never needs a neighbor's *layer* rows because each band bins the
(replicated) points into an extended band with ``halo`` extra rows on each
side, which is cheaper than exchanging bin structures over ICI.

All ops are bit-identical to their single-device counterparts (asserted by
tests/test_parallel.py) because binning order, window order, and best-angle
argmax are deterministic and band-local.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aerial_mapper_tpu.camera.models import Camera
from aerial_mapper_tpu.config import (
    BlockMatchingConfig,
    DsmConfig,
    OrthoBackwardGridConfig,
    SgmConfig,
)
from aerial_mapper_tpu.dsm.idw import bin_points, binned_idw, _window_halfwidth
from aerial_mapper_tpu.mapgrid.grid import MapGeometry
from aerial_mapper_tpu.ortho.backward_grid import backward_grid_update
from aerial_mapper_tpu.stereo.batched import PairOperands, process_pairs_batched


def _band_geometry(geom: MapGeometry, n_tiles: int, halo: int) -> MapGeometry:
    """Static geometry of one extended row band (same for every device)."""
    if geom.height % n_tiles != 0:
        raise ValueError(
            f"map height {geom.height} not divisible by {n_tiles} tiles"
        )
    band_h = geom.height // n_tiles
    return MapGeometry(
        center_easting=geom.center_easting,
        center_northing=geom.center_northing,  # unused by band ops
        resolution=geom.resolution,
        height=band_h + 2 * halo,
        width=geom.width,
    )


def _dsm_band_update(elevation_band, points, valid, geom, cfg: DsmConfig,
                     axis_name: str):
    """Update one device's elevation row band from the full point set."""
    n_tiles = jax.lax.psum(1, axis_name)
    band_h = elevation_band.shape[0]
    halo = _window_halfwidth(
        cfg.max_radius_sq if cfg.adaptive_interpolation
        else cfg.interpolation_radius_sq,
        geom.resolution,
    )
    ext_geom = MapGeometry(
        geom.center_easting, geom.center_northing, geom.resolution,
        band_h + 2 * halo, geom.width + 2 * halo,
    )
    row0 = jax.lax.axis_index(axis_name) * band_h
    # assignment + center arithmetic against the GLOBAL edges; only the
    # integer index shift is band-local — bit-for-bit the arithmetic of
    # the single-device path (see bin_points docstring)
    binned = bin_points(
        points[:, :2], points[:, 2], valid, ext_geom, cfg.bin_capacity,
        north=geom.north, west=geom.west,
        row_offset=halo - row0, col_offset=halo,
    )
    idw_kw = dict(
        radius_sq=cfg.interpolation_radius_sq,
        adaptive=cfg.adaptive_interpolation,
        growth=cfg.adaptive_growth_factor,
        max_radius_sq=cfg.max_radius_sq,
    )
    if cfg.idw_kernel == "pallas":
        from aerial_mapper_tpu.dsm.pallas_idw import binned_idw_pallas

        values, hit = binned_idw_pallas(
            binned, ext_geom, interpret=jax.default_backend() == "cpu",
            **idw_kw,
        )
    elif cfg.idw_kernel == "xla":
        values, hit = binned_idw(binned, ext_geom, **idw_kw)
    else:
        raise ValueError(
            f"idw kernel must be 'xla' or 'pallas', got {cfg.idw_kernel!r}"
        )
    values = values[halo: halo + band_h, halo: halo + geom.width]
    hit = hit[halo: halo + band_h, halo: halo + geom.width]
    return jnp.where(hit, values, elevation_band)


@partial(jax.jit, static_argnames=("geom", "cfg", "mesh", "axis_name"))
def sharded_dsm_update(
    elevation: jax.Array,  # [H, W]
    points: jax.Array,  # [N, 3] (replicated)
    valid: jax.Array,  # [N]
    geom: MapGeometry,
    cfg: DsmConfig,
    mesh: Mesh,
    axis_name: str = "tiles",
) -> jax.Array:
    """Row-band-sharded DSM update; numerically identical to the
    single-device ``update_elevation_layer``."""
    fn = jax.shard_map(
        partial(_dsm_band_update, geom=geom, cfg=cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P()),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return fn(elevation, points, valid)


def _ortho_band_update(band_layers, quats, ts, images, geom, cam, cfg,
                       axis_name):
    band_h = band_layers["elevation_angle"].shape[0]
    row0 = jax.lax.axis_index(axis_name) * band_h
    return backward_grid_update(
        band_layers, quats, ts, images, geom, cam, cfg,
        row_offset=row0.astype(jnp.float32),
    )


@partial(jax.jit, static_argnames=("geom", "cam", "cfg", "mesh", "axis_name"))
def sharded_backward_grid_update(
    layers: dict,
    quats_G_C: jax.Array,
    t_G_C: jax.Array,
    images: jax.Array,
    geom: MapGeometry,
    cam: Camera,
    cfg: OrthoBackwardGridConfig,
    mesh: Mesh,
    axis_name: str = "tiles",
) -> dict:
    """Row-band-sharded backward-grid ortho (cells are independent, so the
    only distribution cost is the replicated image broadcast)."""
    layer_spec = {k: P(axis_name, None) for k in layers}
    fn = jax.shard_map(
        partial(_ortho_band_update, geom=geom, cam=cam, cfg=cfg,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(layer_spec, P(), P(), P()),
        out_specs=layer_spec,
        check_vma=False,
    )
    return fn(layers, quats_G_C, t_G_C, images)


# ---------------------------------------------------------------------------
# Fused multi-chip map step: pair-sharded stereo -> tile-sharded raster.
# ---------------------------------------------------------------------------


def _map_step_body(
    layers, ops: PairOperands, quats, ts, images,
    geom: MapGeometry, cam: Camera,
    dsm_cfg: DsmConfig, ortho_cfg: OrthoBackwardGridConfig,
    matcher, bm_cfg, sgm_cfg, pairs_axis, tiles_axis,
):
    # 1) local stereo pairs -> points (data-parallel over ALL devices)
    pts, intens, valid = process_pairs_batched(
        ops, cam, matcher=matcher, bm_cfg=bm_cfg, sgm_cfg=sgm_cfg,
        batch_chunk=1,
    )
    # 2) gather every device's points (pairs axis AND tiles axis both carry
    #    distinct pairs; gather over both to reconstruct the full cloud)
    pts = jax.lax.all_gather(pts, pairs_axis, tiled=True)
    valid = jax.lax.all_gather(valid, pairs_axis, tiled=True)
    pts = jax.lax.all_gather(pts, tiles_axis, tiled=True)
    valid = jax.lax.all_gather(valid, tiles_axis, tiled=True)
    pts_flat = pts.reshape(-1, 3)
    valid_flat = valid.reshape(-1)

    # 3) tile-sharded DSM band update
    new_elev = _dsm_band_update(
        layers["elevation"], pts_flat, valid_flat, geom, dsm_cfg, tiles_axis
    )
    layers = dict(layers)
    layers["elevation"] = new_elev

    # 4) tile-sharded backward-grid ortho against the full image set
    layers = _ortho_band_update(
        layers, quats, ts, images, geom, cam, ortho_cfg, tiles_axis
    )
    return layers


@partial(
    jax.jit,
    static_argnames=(
        "geom", "cam", "dsm_cfg", "ortho_cfg", "matcher", "bm_cfg",
        "sgm_cfg", "mesh", "pairs_axis", "tiles_axis",
    ),
)
def sharded_map_step(
    layers: dict,
    ops: PairOperands,
    quats_G_C: jax.Array,
    t_G_C: jax.Array,
    images: jax.Array,
    geom: MapGeometry,
    cam: Camera,
    dsm_cfg: DsmConfig,
    ortho_cfg: OrthoBackwardGridConfig,
    mesh: Mesh,
    matcher: str = "bm",
    bm_cfg: BlockMatchingConfig = BlockMatchingConfig(),
    sgm_cfg: SgmConfig = SgmConfig(),
    pairs_axis: str = "pairs",
    tiles_axis: str = "tiles",
) -> dict:
    """One fused multi-chip incremental mapping step.

    Sharding layout (the framework's dp x spatial equivalent of tensor/
    data-parallel layouts): the stereo pair batch is data-parallel over the
    flattened (pairs, tiles) mesh; the map rasters are row-band-sharded over
    ``tiles`` and replicated over ``pairs``. The only cross-device traffic
    is the point all-gather and XLA's image broadcast, both over ICI.
    """
    n_pairs = mesh.shape[pairs_axis]
    n_tiles = mesh.shape[tiles_axis]
    b = ops.image1.shape[0]
    if b % (n_pairs * n_tiles) != 0:
        raise ValueError(
            f"pair batch {b} not divisible by device count "
            f"{n_pairs * n_tiles}"
        )

    layer_spec = {k: P(tiles_axis, None) for k in layers}
    pair_spec = PairOperands(
        image1=P((pairs_axis, tiles_axis)),
        image2=P((pairs_axis, tiles_axis)),
        T1_inv=P((pairs_axis, tiles_axis)),
        T2_inv=P((pairs_axis, tiles_axis)),
        corners_rect=P((pairs_axis, tiles_axis)),
        R_G_C_rect=P((pairs_axis, tiles_axis)),
        t_G_C1=P((pairs_axis, tiles_axis)),
        baseline=P((pairs_axis, tiles_axis)),
    )
    fn = jax.shard_map(
        partial(
            _map_step_body, geom=geom, cam=cam, dsm_cfg=dsm_cfg,
            ortho_cfg=ortho_cfg, matcher=matcher, bm_cfg=bm_cfg,
            sgm_cfg=sgm_cfg, pairs_axis=pairs_axis, tiles_axis=tiles_axis,
        ),
        mesh=mesh,
        in_specs=(layer_spec, pair_spec, P(), P(), P()),
        out_specs=layer_spec,
        check_vma=False,
    )
    return fn(layers, ops, quats_G_C, t_G_C, images)


def shard_layers(layers: dict, mesh: Mesh, axis_name: str = "tiles") -> dict:
    """Place a layer dict with row-band sharding on the mesh.

    Single-process path uses ``device_put``. Multi-process meshes must go
    through ``host_local_array_to_global_array``: cross-process
    ``device_put`` asserts value equality with ``==``, which NaN-initialized
    layers (elevation) can never satisfy (NaN != NaN).
    """
    sharding = NamedSharding(mesh, P(axis_name, None))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        n_tiles = mesh.shape[axis_name]

        def to_global(v):
            # slice out this process's rows from the (host-replicated)
            # full raster, then assemble the global array
            full = np.asarray(v)
            band = full.shape[0] // n_tiles
            locs = [
                d for d in mesh.devices.ravel()
                if d.process_index == jax.process_index()
            ]
            tile_ids = sorted(
                int(np.where(mesh.devices.ravel() == d)[0][0]) for d in locs
            )
            local = np.concatenate(
                [full[t * band:(t + 1) * band] for t in tile_ids]
            )
            return multihost_utils.host_local_array_to_global_array(
                local, mesh, P(axis_name, None)
            )

        return {k: to_global(v) for k, v in layers.items()}
    return {k: jax.device_put(v, sharding) for k, v in layers.items()}
