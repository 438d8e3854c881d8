"""Tile- and pair-sharded map operators (shard_map over a device mesh).

TPU-native replacement for the reference's cell-sharded ``utils::parFor``
thread parallelism (SURVEY.md §2.3): map rasters are split into row bands
across the ``tiles`` mesh axis; stereo pair batches are split across every
device with RING frames (one frame per pair slot; the boundary frame
``ppermute``s to the neighbor).

The fused ``sharded_map_step`` SCALES per-device footprint down with the
mesh: stereo points are ROUTED to their owner tile with a fixed-capacity
``all_to_all`` (each device bins ~1/n_tiles of the cloud), the interior
halo rows of the binned structure are completed by trading [K, halo, W]
strips over ICI (``halo_exchange_extended``), and each band's ortho pass
textures from a conservatively CULLED image subset
(``band_image_operands``). The standalone ``sharded_dsm_update`` /
``sharded_backward_grid_update`` keep the simpler replicated-operand
layout for single-host batch drivers.

All ops are bit-identical to their single-device counterparts (asserted by
tests/test_parallel.py) because binning order (global-edge arithmetic +
global-rank tie-break), window order, and best-angle argmax are
deterministic and band-local; for the routed step this additionally
requires the returned routing ``overflow`` to be 0.
"""

from __future__ import annotations


from functools import partial
from typing import NamedTuple

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


def _check_halo_fits_band(geom: MapGeometry, n_tiles: int,
                          cfg: DsmConfig) -> None:
    """The routed DSM band update trades halo strips with IMMEDIATE
    neighbors only, so a point can influence another tile's cells only
    when the IDW window halfwidth fits inside one band. A halo wider than
    the band would silently lose contributions from tiles two hops away —
    reject the configuration statically instead."""
    halo = _window_halfwidth(
        cfg.max_radius_sq if cfg.adaptive_interpolation
        else cfg.interpolation_radius_sq,
        geom.resolution,
    )
    band_h = geom.height // n_tiles
    if halo > band_h:
        raise ValueError(
            f"IDW halo ({halo} rows at resolution {geom.resolution}) "
            f"exceeds the per-tile band height ({band_h} rows = "
            f"{geom.height} / {n_tiles} tiles); halo exchange only spans "
            "immediate neighbors. Use fewer tiles, a taller map, or a "
            "smaller max_radius_sq."
        )


def _binned_idw_band(binned, ext_geom: MapGeometry, cfg: DsmConfig):
    """Shared band tail: kernel dispatch (with validation) + IDW of a
    halo-extended binned structure. Used by both the replicated and the
    routed band updates so the two paths cannot drift."""
    import jax as _jax

    idw_kw = dict(
        radius_sq=cfg.interpolation_radius_sq,
        adaptive=cfg.adaptive_interpolation,
        growth=cfg.adaptive_growth_factor,
        max_radius_sq=cfg.max_radius_sq,
    )
    if cfg.idw_kernel == "pallas":
        from aerial_mapper_tpu.dsm.pallas_idw import binned_idw_pallas

        return binned_idw_pallas(
            binned, ext_geom, interpret=_jax.default_backend() == "cpu",
            **idw_kw,
        )
    if cfg.idw_kernel == "xla":
        return binned_idw(binned, ext_geom, **idw_kw)
    raise ValueError(
        f"idw kernel must be 'xla' or 'pallas', got {cfg.idw_kernel!r}"
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
    values, hit = _binned_idw_band(binned, ext_geom, cfg)
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
    single-device ``update_elevation_layer`` (no halo/band constraint:
    each band bins its halo rows directly from the replicated cloud)."""
    fn = jax.shard_map(
        partial(_dsm_band_update, geom=geom, cfg=cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(), P()),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return fn(elevation, points, valid)


def _ortho_band_update(band_layers, quats, ts, images, image_ids, geom,
                       cam, cfg, axis_name):
    band_h = band_layers["elevation_angle"].shape[0]
    row0 = jax.lax.axis_index(axis_name) * band_h
    return backward_grid_update(
        band_layers, quats, ts, images, geom, cam, cfg,
        row_offset=row0.astype(jnp.float32), image_ids=image_ids,
    )


def _ortho_band_update_banded(band_layers, b_imgs, b_quats, b_ts, b_ids,
                              geom, cam, cfg, axis_name):
    band_h = band_layers["elevation_angle"].shape[0]
    row0 = jax.lax.axis_index(axis_name) * band_h
    return backward_grid_update(
        band_layers, b_quats[0], b_ts[0], b_imgs[0], geom, cam, cfg,
        row_offset=row0.astype(jnp.float32), image_ids=b_ids[0],
    )


@partial(jax.jit, static_argnames=("geom", "cam", "cfg", "mesh", "axis_name"))
def sharded_backward_grid_update_banded(
    layers: dict,
    banded: BandedImages,
    geom: MapGeometry,
    cam: Camera,
    cfg: OrthoBackwardGridConfig,
    mesh: Mesh,
    axis_name: str = "tiles",
) -> dict:
    """Row-band-sharded backward-grid ortho with per-band CULLED image
    subsets: each device holds only its band's images
    (``band_image_operands``) instead of the full replicated stack — the
    batch driver's scale-out path. The caller owns the cull slab's
    validity; the batch driver derives it from the ACTUAL post-DSM
    elevation range, so it is exact by construction."""
    layer_spec = {k: P(axis_name, None) for k in layers}
    fn = jax.shard_map(
        partial(_ortho_band_update_banded, geom=geom, cam=cam, cfg=cfg,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(layer_spec, P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=layer_spec,
        check_vma=False,
    )
    return fn(layers, banded.images, banded.quats, banded.ts, banded.ids)


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
    image_ids=None,
) -> dict:
    """Row-band-sharded backward-grid ortho (cells are independent, so the
    only distribution cost is the replicated image broadcast).
    ``image_ids`` (optional replicated [M] int32): explicit global
    observation ids (the multicam drivers' convention); None keeps the
    positional 0..M-1 ids."""
    layer_spec = {k: P(axis_name, None) for k in layers}
    fn = jax.shard_map(
        partial(_ortho_band_update, geom=geom, cam=cam, cfg=cfg,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(layer_spec, P(), P(), P(), P()),
        out_specs=layer_spec,
        check_vma=False,
    )
    return fn(layers, quats_G_C, t_G_C, images, image_ids)


# ---------------------------------------------------------------------------
# Fused multi-chip map step: ring-pass pair-sharded stereo -> owner-tile
# routed points -> halo-strip-exchanged binned DSM -> band-culled ortho.
# ---------------------------------------------------------------------------


class RingPairOperands(NamedTuple):
    """Pair operands with ONE frame per pair slot (ring layout).

    ``frames[j]`` is pair j's LEFT frame; the right frame is the next
    slot's left frame — within a device that is a local shift, across the
    device boundary a single ``ppermute`` of one frame (SURVEY.md §2.3
    row 2: the ring-pass of the shared boundary frame, the analogue of the
    reference's previous-frame reuse, stereo.cpp:127-147). Halves the
    stereo image HBM + host transfer of the duplicated-image layout.
    ``tail`` is the right frame of the LAST pair (replicated, one image).

    ``pair_valid`` (optional [B] bool) marks real pair slots; padding
    slots appended by ``pad_ring_pairs`` carry False and contribute no
    points (their triangulated output is masked invalid before routing).
    """

    frames: jax.Array  # [B, H, W]
    tail: jax.Array  # [H, W]
    T1_inv: jax.Array  # [B, 3, 3]
    T2_inv: jax.Array
    corners_rect: jax.Array  # [B, 4, 2]
    R_G_C_rect: jax.Array  # [B, 3, 3]
    t_G_C1: jax.Array  # [B, 3]
    baseline: jax.Array  # [B]
    pair_valid: jax.Array | None = None  # [B] bool (None = all real)


def pad_ring_pairs(ring: RingPairOperands, multiple: int) -> RingPairOperands:
    """Pad the pair batch up to a multiple of the device count.

    Padding slots are appended at the END so every real pair keeps its
    global slot index (the nearest-K rank tie-break stays bit-identical to
    the unpadded single-device cloud). A padding slot's LEFT frame is the
    ring ``tail``, so the last REAL pair still receives its true right
    frame from the next slot over the ring-pass; padding pairs themselves
    match ``tail`` against ``tail`` and are masked out via ``pair_valid``.
    """
    b = ring.frames.shape[0]
    pad = (-b) % multiple
    pv = ring.pair_valid
    if pv is None:
        pv = jnp.ones((b,), bool)
    if pad == 0:
        return ring._replace(pair_valid=pv)

    def pad_tail(x):
        reps = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
        return jnp.concatenate([x, reps], axis=0)

    frames = jnp.concatenate(
        [ring.frames,
         jnp.broadcast_to(ring.tail[None], (pad,) + ring.tail.shape)],
        axis=0,
    )
    return RingPairOperands(
        frames=frames, tail=ring.tail,
        T1_inv=pad_tail(ring.T1_inv), T2_inv=pad_tail(ring.T2_inv),
        corners_rect=pad_tail(ring.corners_rect),
        R_G_C_rect=pad_tail(ring.R_G_C_rect),
        t_G_C1=pad_tail(ring.t_G_C1), baseline=pad_tail(ring.baseline),
        pair_valid=jnp.concatenate([pv, jnp.zeros((pad,), bool)]),
    )


def pad_map_geometry(geom: MapGeometry, n_tiles: int):
    """(padded_geom, pad_rows): extend the map SOUTH to a height divisible
    by ``n_tiles``; crop results with ``layers[k][:geom.height]``.

    North/west edges are preserved, so cell assignment, cell-center
    arithmetic, and the IDW halo reads for every ORIGINAL row are
    bit-identical to the unpadded map (padding only appends southern rows
    whose own results are discarded)."""
    pad = (-geom.height) % n_tiles
    if pad == 0:
        return geom, 0
    h = geom.height + pad
    return MapGeometry(
        center_easting=geom.center_easting,
        center_northing=geom.north - 0.5 * h * geom.resolution,
        resolution=geom.resolution,
        height=h,
        width=geom.width,
    ), pad


def prepare_ring_pair_operands(K, Rs, ts, images,
                               use_every_nth: int = 1) -> RingPairOperands:
    """Host-side: consecutive (subsampled) frames -> ring pair operands.

    Consecutive pairs share frames (pair j = frames a_j, a_{j+1}), so the
    ring layout stores each frame once instead of twice."""
    from aerial_mapper_tpu.stereo.batched import prepare_pair_operands

    ops = prepare_pair_operands(K, Rs, ts, images,
                                use_every_nth=use_every_nth)
    return RingPairOperands(
        frames=ops.image1, tail=ops.image2[-1],
        T1_inv=ops.T1_inv, T2_inv=ops.T2_inv,
        corners_rect=ops.corners_rect, R_G_C_rect=ops.R_G_C_rect,
        t_G_C1=ops.t_G_C1, baseline=ops.baseline,
    )


class BandedImages(NamedTuple):
    """Per-tile-band image subsets for the ortho pass.

    Cells in one row band see a bounded camera subset, so each band holds
    only the images whose ground footprint can overlap it (conservative
    host-side frustum cull, `band_image_operands`) — per-device image
    bytes shrink with the mesh instead of replicating the full stack
    (SURVEY.md §2.3 / utils-common.h:29-59 analogue, scaled out).
    ``ids`` maps local slot -> global image index; -1 marks padding slots
    whose pose is parked 1e9 m above ground (invisible to every finite
    cell, so they contribute nothing and keep num_observations exact).
    """

    images: jax.Array  # [n_tiles, M, H, W]
    quats: jax.Array  # [n_tiles, M, 4]
    ts: jax.Array  # [n_tiles, M, 3]
    ids: jax.Array  # [n_tiles, M] int32, -1 = padding


def replicated_band_images(quats_G_C, t_G_C, images) -> BandedImages:
    """Every-band (uncull) operands in the REPLICATED layout: [M, ...]
    arrays shared by every tile instead of an [n_tiles, M, ...] copy per
    band. ``sharded_map_step`` broadcasts them (in_spec ``P()``), so the
    host pays one image transfer, not ``n_tiles``. Use when no elevation
    slab is known (e.g. the incremental driver, whose DSM update changes
    the very elevations a cull would have to bound — see the slab
    obligation note on ``sharded_map_step``)."""
    m = np.asarray(t_G_C).shape[0]
    return BandedImages(
        images=jnp.asarray(images),
        quats=jnp.asarray(quats_G_C, jnp.float32),
        ts=jnp.asarray(t_G_C, jnp.float32),
        ids=jnp.arange(m, dtype=jnp.int32),
    )


_BOUNDARY_RAYS_CACHE: dict = {}


def _boundary_ray_dirs(cam: Camera) -> np.ndarray:
    """[3, B] camera-frame rays through every image-BOUNDARY pixel center
    plus the half-pixel outer corners, through the lens model.

    Memoized per (hashable) camera: the distorted-lens branch dispatches
    ``undistort_points`` to the device and reads it back — a per-call
    tunnel sync the incremental driver would otherwise pay on EVERY
    culled update for a result that depends only on the camera.

    For a distorted camera the ground footprint's extremes need not lie at
    the 4 corners, but the image boundary maps to a closed curve on any
    ground plane and the interior maps inside it (continuity), so rays
    through the full boundary ring bound the footprint; per-pixel sampling
    plus the caller's margin covers sub-pixel curvature between samples.
    Reference projection semantics under distortion:
    ortho-backward-grid.cc:66-81 (project3 visibility implies the pixel is
    inside the image rect)."""
    cached = _BOUNDARY_RAYS_CACHE.get(cam)
    if cached is not None:
        return cached
    w, h = cam.width, cam.height
    us = np.arange(w, dtype=np.float64) + 0.5
    vs = np.arange(h, dtype=np.float64) + 0.5
    ring = np.concatenate([
        np.stack([us, np.full(w, 0.5)], 1),
        np.stack([us, np.full(w, h - 0.5)], 1),
        np.stack([np.full(h, 0.5), vs], 1),
        np.stack([np.full(h, w - 0.5), vs], 1),
        np.array([[-0.5, -0.5], [w - 0.5, -0.5], [w - 0.5, h - 0.5],
                  [-0.5, h - 0.5]]),
    ])  # [B, 2]
    xy = np.stack([(ring[:, 0] - cam.cx) / cam.fx,
                   (ring[:, 1] - cam.cy) / cam.fy], axis=1)
    if cam.dist_kind != "none":
        from aerial_mapper_tpu.camera.models import undistort_points

        xy = np.asarray(
            undistort_points(cam, jnp.asarray(xy, jnp.float32)),
            np.float64,
        )
    rays = np.concatenate([xy, np.ones((xy.shape[0], 1))], axis=1).T
    _BOUNDARY_RAYS_CACHE[cam] = rays
    return rays


def band_image_operands(
    geom: MapGeometry,
    n_tiles: int,
    quats_G_C,
    t_G_C,
    images,
    cam: Camera,
    elev_min=None,
    elev_max=None,
    margin_cells: float = 2.0,
    capacity_multiple: int = 1,
) -> BandedImages:
    """Host-side conservative per-band image cull.

    An image can texture a cell only if the cell is inside its view
    frustum; intersecting the frustum boundary rays with the elevation
    slab [elev_min, elev_max] bounds the footprint's northing range (for
    a pinhole the 4 corner rays are exact — the frustum slab section is
    the convex hull of the 8 intersection points; for a distorted camera
    the full boundary ring of rays through the lens model is used, plus
    ``margin_cells``). Bands whose row range misses it skip the image.
    Cameras with any non-descending boundary ray (horizon in view) fall
    back to every band (correct, no cull); so does ``elev_min=None``
    (no slab known).

    SLAB OBLIGATION: the cull is only exact if every cell elevation the
    ortho pass reads — including values written by the SAME step's DSM
    update — lies in [elev_min, elev_max]. ``sharded_map_step`` returns
    the post-update elevation range in its diagnostics so callers can
    verify; with no trustworthy slab use ``replicated_band_images`` (or
    leave elev_min None here).

    ``capacity_multiple`` rounds the padded per-band capacity m up to a
    multiple, bucketing the operand SHAPES: m is a compiled shape, so a
    caller invoking this per update (the incremental driver) would
    otherwise recompile the fused step whenever the cull tightness
    changes by one image. Pass ``images`` as host numpy — the layouts are
    rebuilt here, so a device array would cost a device->host readback.
    """
    from aerial_mapper_tpu.io.poses import _rot_matrix_np

    quats_np = np.asarray(quats_G_C, np.float64)
    ts_np = np.asarray(t_G_C, np.float64)
    n = quats_np.shape[0]
    band_h = geom.height // n_tiles
    dirs_cam = _boundary_ray_dirs(cam)  # [3, B]
    margin = margin_cells * geom.resolution
    members = [[] for _ in range(n_tiles)]
    for i in range(n):
        every_band = elev_min is None or elev_max is None
        if not every_band:
            R = _rot_matrix_np(quats_np[i])  # camera-to-world
            dirs = R @ dirs_cam  # [3, B] world rays
            if np.any(dirs[2] >= -1e-12):  # horizon/ascending ray
                every_band = True
            else:
                ns = []
                for z0 in (elev_min, elev_max):
                    s = (z0 - ts_np[i, 2]) / dirs[2]
                    ns.append(ts_np[i, 1] + s * dirs[1])
                n_lo = min(min(v) for v in ns) - margin
                n_hi = max(max(v) for v in ns) + margin
                r_lo = int(np.floor((geom.north - n_hi) / geom.resolution))
                r_hi = int(np.ceil((geom.north - n_lo) / geom.resolution))
                t_lo = max(r_lo // band_h, 0)
                t_hi = min(r_hi // band_h, n_tiles - 1)
                for t in range(t_lo, t_hi + 1):
                    members[t].append(i)
        if every_band:
            for t in range(n_tiles):
                members[t].append(i)

    m = max(1, max(len(mm) for mm in members))
    m = -(-m // capacity_multiple) * capacity_multiple
    img_np = np.asarray(images)
    out_imgs = np.zeros((n_tiles, m) + img_np.shape[1:], img_np.dtype)
    out_quats = np.zeros((n_tiles, m, 4), np.float32)
    out_quats[..., 0] = 1.0  # identity padding
    out_ts = np.zeros((n_tiles, m, 3), np.float32)
    out_ts[..., 2] = 1.0e9  # padding pose far above ground: never visible
    out_ids = np.full((n_tiles, m), -1, np.int32)
    for t, mm in enumerate(members):
        out_imgs[t, : len(mm)] = img_np[mm]
        out_quats[t, : len(mm)] = quats_np[mm]
        out_ts[t, : len(mm)] = ts_np[mm]
        out_ids[t, : len(mm)] = mm
    return BandedImages(
        images=jnp.asarray(out_imgs),
        quats=jnp.asarray(out_quats),
        ts=jnp.asarray(out_ts),
        ids=jnp.asarray(out_ids),
    )


def _route_points(pts, valid, rank, geom: MapGeometry, n_tiles: int,
                  cap: int, tiles_axis: str):
    """Send each point to its owner tile (row band) with a fixed
    per-destination capacity; returns (pts, valid, rank, overflow) where
    the received arrays are [n_tiles * cap, ...].

    The dest row uses the same floor arithmetic as ``bin_points`` against
    the GLOBAL north edge, so a routed point always lands inside its
    owner's extended band. Out-of-map rows clamp to the edge tiles (their
    extended bands hold the out-of-map halo). ``overflow`` counts valid
    points dropped because a destination bucket exceeded ``cap`` —
    exactness requires it to be 0 (the caller sizes cap and checks).
    """
    n = pts.shape[0]
    band_h = geom.height // n_tiles
    row_g = jnp.floor((geom.north - pts[:, 1]) / geom.resolution)
    row_i = jnp.clip(row_g, -2.0**30, 2.0**30).astype(jnp.int32)
    dest = jnp.clip(jnp.floor_divide(row_i, band_h), 0, n_tiles - 1)
    ok_pt = valid & jnp.isfinite(pts[:, 0]) & jnp.isfinite(pts[:, 1])
    dest = jnp.where(ok_pt, dest, n_tiles)

    idx = jnp.arange(n, dtype=jnp.int32)
    _, sidx = jax.lax.sort((dest, idx), num_keys=2, is_stable=False)
    counts = jnp.zeros(n_tiles + 1, jnp.int32).at[dest].add(1)
    starts = jnp.cumsum(counts) - counts  # exclusive prefix
    pos = starts[:n_tiles, None] + jnp.arange(cap, dtype=jnp.int32)[None]
    in_bucket = pos < (starts[:n_tiles] + counts[:n_tiles])[:, None]
    src = sidx[jnp.minimum(pos, n - 1).reshape(-1)]  # [n_tiles*cap]

    # one row gather for the float payload: xyz + valid. The int32 rank
    # rides a SEPARATE all_to_all: bitcasting it into an f32 channel makes
    # small ranks denormal bit patterns, and a denormal-flushing copy
    # anywhere in where/all_to_all would silently corrupt the nearest-K
    # tie-break (ADVICE r2; CLAUDE.md documents axon fused-program
    # miscompiles). The extra transfer is 4 bytes/point vs 16.
    packed = jnp.concatenate(
        [pts.astype(jnp.float32), valid.astype(jnp.float32)[:, None]],
        axis=1,
    )  # [N, 4]
    rows = packed[src]
    okf = in_bucket.reshape(-1)
    rows = jnp.where(okf[:, None], rows, 0.0)
    ranks = jnp.where(okf, rank.astype(jnp.int32)[src], jnp.int32(2**31 - 1))
    overflow = jnp.sum(jnp.maximum(counts[:n_tiles] - cap, 0))

    recv = jax.lax.all_to_all(rows, tiles_axis, 0, 0, tiled=True)
    r_rank = jax.lax.all_to_all(ranks, tiles_axis, 0, 0, tiled=True)
    r_pts = recv[:, :3]
    r_valid = recv[:, 3] > 0.5
    # padding rows carry the max rank so they can never displace a real
    # point in the nearest-K tie-break
    r_rank = jnp.where(r_valid, r_rank, jnp.int32(2**31 - 1))
    return r_pts, r_valid, r_rank, overflow


def _dsm_band_update_routed(elevation_band, pts, valid, rank,
                            geom: MapGeometry, cfg: DsmConfig,
                            tiles_axis: str):
    """Band DSM update from OWNER-ROUTED points only.

    Bins this band's points into a halo-extended band (global-edge
    arithmetic, global rank tie-break), then completes the interior halo
    rows by trading [K, halo, W] strips of the binned structure with the
    neighbors (`halo_exchange_extended`) — bit-identical to binning a
    replicated cloud, at 1/n_tiles of the points per device.
    """
    from aerial_mapper_tpu.parallel.halo import halo_exchange_extended

    n_tiles = jax.lax.psum(1, tiles_axis)
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
    row0 = jax.lax.axis_index(tiles_axis) * band_h
    binned = bin_points(
        pts[:, :2], pts[:, 2], valid, ext_geom, cfg.bin_capacity,
        north=geom.north, west=geom.west,
        row_offset=halo - row0, col_offset=halo, rank=rank,
    )
    ex = partial(halo_exchange_extended, halo=halo, axis_name=tiles_axis,
                 axis=1)
    binned = binned._replace(
        de=ex(binned.de), dn=ex(binned.dn), payload=ex(binned.payload),
        count=halo_exchange_extended(binned.count, halo, tiles_axis, axis=0),
    )
    values, hit = _binned_idw_band(binned, ext_geom, cfg)
    values = values[halo: halo + band_h, halo: halo + geom.width]
    hit = hit[halo: halo + band_h, halo: halo + geom.width]
    del n_tiles
    return jnp.where(hit, values, elevation_band)


def _ring_stereo_local(ops: RingPairOperands, cam, matcher, bm_cfg,
                       sgm_cfg, axes):
    """Shared shard-body front-end: ring-pass the boundary frame, then run
    this device's stereo pairs. Returns (pts [b_loc, HW, 3],
    intens [b_loc, HW], valid [b_loc, HW]) with padding slots masked."""
    n_dev = jax.lax.psum(1, axes)
    flat_idx = jax.lax.axis_index(axes)

    # ring-pass: reconstruct each pair's right frame from the NEXT slot's
    # left frame; only the device-boundary frame moves over ICI
    frames = ops.frames  # [b_loc, H, W]
    from_next = jax.lax.ppermute(
        frames[0], axes, [(i + 1, i) for i in range(n_dev - 1)]
    )
    last_right = jnp.where(flat_idx == n_dev - 1, ops.tail, from_next)
    pair_ops = PairOperands(
        image1=frames,
        image2=jnp.concatenate([frames[1:], last_right[None]], axis=0),
        T1_inv=ops.T1_inv, T2_inv=ops.T2_inv,
        corners_rect=ops.corners_rect, R_G_C_rect=ops.R_G_C_rect,
        t_G_C1=ops.t_G_C1, baseline=ops.baseline,
    )
    pts, intens, valid = process_pairs_batched(
        pair_ops, cam, matcher=matcher, bm_cfg=bm_cfg, sgm_cfg=sgm_cfg,
        batch_chunk=1,
    )
    if ops.pair_valid is not None:
        # padding slots (pad_ring_pairs) contribute no points
        valid = valid & ops.pair_valid[:, None]
    return pts, intens, valid


def _stereo_shard_body(ops, cam, matcher, bm_cfg, sgm_cfg, axis_name):
    return _ring_stereo_local(ops, cam, matcher, bm_cfg, sgm_cfg,
                              (axis_name,))


@partial(
    jax.jit,
    static_argnames=("cam", "matcher", "bm_cfg", "sgm_cfg", "mesh",
                     "axis_name"),
)
def sharded_process_pairs(
    ops: RingPairOperands,
    cam: Camera,
    mesh: Mesh,
    matcher: str = "bm",
    bm_cfg: BlockMatchingConfig = BlockMatchingConfig(),
    sgm_cfg: SgmConfig = SgmConfig(),
    axis_name: str = "tiles",
):
    """Pair-data-parallel stereo for the BATCH drivers: the ring pair
    batch (pad with ``pad_ring_pairs`` first) is split across every
    device; each runs its shard through the same per-pair program and the
    outputs concatenate back in global pair order — bit-identical per pair
    to ``process_pairs_batched`` (SURVEY.md §2.3 row 2: the sequential
    stereo loop, stereo.cpp:91-110, scaled out)."""
    b = ops.frames.shape[0]
    n_dev = mesh.shape[axis_name]
    if b % n_dev != 0:
        raise ValueError(
            f"pair batch {b} not divisible by {n_dev} devices; pad with "
            "pad_ring_pairs"
        )
    dp = P(axis_name)
    pair_spec = RingPairOperands(
        frames=dp, tail=P(), T1_inv=dp, T2_inv=dp, corners_rect=dp,
        R_G_C_rect=dp, t_G_C1=dp, baseline=dp,
        pair_valid=None if ops.pair_valid is None else dp,
    )
    fn = jax.shard_map(
        partial(_stereo_shard_body, cam=cam, matcher=matcher,
                bm_cfg=bm_cfg, sgm_cfg=sgm_cfg, axis_name=axis_name),
        mesh=mesh,
        in_specs=(pair_spec,),
        out_specs=(dp, dp, dp),
        check_vma=False,
    )
    return fn(ops)


def _map_step_body(
    layers, ops: RingPairOperands, b_imgs, b_quats, b_ts, b_ids,
    geom: MapGeometry, cam: Camera,
    dsm_cfg: DsmConfig, ortho_cfg: OrthoBackwardGridConfig,
    matcher, bm_cfg, sgm_cfg, pairs_axis, tiles_axis, cap,
    z_min=None, z_max=None,
):
    axes = (pairs_axis, tiles_axis)
    n_tiles = jax.lax.psum(1, tiles_axis)
    flat_idx = jax.lax.axis_index(axes)

    # 1-2) ring-pass + local stereo (data-parallel over ALL devices)
    pts, intens, valid = _ring_stereo_local(
        ops, cam, matcher, bm_cfg, sgm_cfg, axes
    )
    from aerial_mapper_tpu.stereo.batched import filter_points_z

    valid = filter_points_z(pts, valid, z_min, z_max)
    b_loc = ops.frames.shape[0]
    hw = pts.shape[1]
    pts_f = pts.reshape(-1, 3)
    valid_f = valid.reshape(-1)
    # global point rank (= the index the point would have in the
    # single-device full-batch cloud): pair batch is sharded row-major
    # over the flattened (pairs, tiles) mesh
    rank = flat_idx * (b_loc * hw) + jnp.arange(b_loc * hw, dtype=jnp.int32)

    # 3) owner-tile routing (all_to_all over tiles) + gather over the
    #    pairs axis: each device ends with ~cap * n_tiles * n_pairs points
    #    instead of the full cloud
    r_pts, r_valid, r_rank, overflow = _route_points(
        pts_f, valid_f, rank, geom, n_tiles, cap, tiles_axis
    )
    r_pts = jax.lax.all_gather(r_pts, pairs_axis, tiled=True)
    r_valid = jax.lax.all_gather(r_valid, pairs_axis, tiled=True)
    r_rank = jax.lax.all_gather(r_rank, pairs_axis, tiled=True)
    overflow = jax.lax.psum(jax.lax.psum(overflow, tiles_axis), pairs_axis)
    # scale-out diagnostic: valid points this tile actually received
    # (identical across the pairs replicas after the all_gather)
    routed = jnp.sum(r_valid.astype(jnp.int32))[None]

    # 4) tile-sharded DSM band update from routed points + halo strips
    layers = dict(layers)
    layers["elevation"] = _dsm_band_update_routed(
        layers["elevation"], r_pts, r_valid, r_rank, geom, dsm_cfg,
        tiles_axis,
    )

    # slab diagnostic: global post-update elevation range, so callers can
    # verify the band cull's [elev_min, elev_max] obligation (see
    # band_image_operands docstring; ADVICE r2). nanmin/nanmax over the
    # band then min/max over tiles; all-NaN maps yield +/-inf sentinels.
    elev = layers["elevation"]
    elev_lo = jax.lax.pmin(
        jax.lax.pmin(jnp.nanmin(jnp.where(jnp.isnan(elev), jnp.inf, elev)),
                     tiles_axis),
        pairs_axis,
    )
    elev_hi = jax.lax.pmax(
        jax.lax.pmax(jnp.nanmax(jnp.where(jnp.isnan(elev), -jnp.inf, elev)),
                     tiles_axis),
        pairs_axis,
    )

    # 5) tile-sharded backward-grid ortho against the band's image subset:
    #    CULLED layout ([1, M, ...] per-band locals) or REPLICATED layout
    #    ([M, ...] shared, replicated_band_images). The layouts are told
    #    apart by the ids rank ([n_tiles, M] vs [M]) — image rank is
    #    ambiguous once color channels enter ([M, H, W, 3] replicated has
    #    the same rank as [1, M, H, W] banded gray).
    if b_ids.ndim == 1:
        quats_m, ts_m, imgs_m, ids_m = b_quats, b_ts, b_imgs, b_ids
    else:
        quats_m, ts_m, imgs_m, ids_m = (
            b_quats[0], b_ts[0], b_imgs[0], b_ids[0])
    band_h = layers["elevation"].shape[0]
    row0 = jax.lax.axis_index(tiles_axis) * band_h
    layers = backward_grid_update(
        layers, quats_m, ts_m, imgs_m, geom, cam, ortho_cfg,
        row_offset=row0.astype(jnp.float32), image_ids=ids_m,
    )
    return layers, overflow, elev_lo, elev_hi, routed


class StepDiagnostics(NamedTuple):
    """Validity signals of one ``sharded_map_step``.

    ``overflow``: valid points dropped by the fixed-capacity routing —
    exactness requires 0. ``elev_min``/``elev_max``: global post-DSM
    elevation range the ortho pass read (+/-inf on an all-NaN map) — the
    caller of a slab-culled ``band_image_operands`` must verify it lies
    inside the [elev_min, elev_max] slab the cull was built with, or the
    bit-identical-to-single-device invariant is void (ADVICE r2).
    ``routed``: [n_tiles] int32 valid points each tile received from the
    routing — the scale-out evidence (sums to the global valid cloud when
    overflow is 0)."""

    overflow: jax.Array  # int32 scalar
    elev_min: jax.Array  # float32 scalar
    elev_max: jax.Array  # float32 scalar
    routed: jax.Array | None = None  # [n_tiles] int32

    def check(self, slab_min=None, slab_max=None):
        """Host-side validation (reads back three scalars); raises on
        routing overflow or slab violation."""
        overflow = int(self.overflow)
        if overflow:
            raise RuntimeError(
                f"sharded_map_step dropped {overflow} routed points "
                "(raise route_capacity_factor)"
            )
        if slab_min is not None:
            lo, hi = float(self.elev_min), float(self.elev_max)
            if lo < slab_min or hi > slab_max:
                raise RuntimeError(
                    f"elevation range [{lo:.2f}, {hi:.2f}] escapes the "
                    f"band-cull slab [{slab_min:.2f}, {slab_max:.2f}]; "
                    "culled bands may have skipped visible images"
                )


@partial(
    jax.jit,
    static_argnames=(
        "geom", "cam", "dsm_cfg", "ortho_cfg", "matcher", "bm_cfg",
        "sgm_cfg", "mesh", "pairs_axis", "tiles_axis",
        "route_capacity_factor", "z_min", "z_max",
    ),
)
def sharded_map_step(
    layers: dict,
    ops: RingPairOperands,
    banded: BandedImages,
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
    route_capacity_factor: float = 2.0,
    z_min=None,
    z_max=None,
):
    """One fused multi-chip incremental mapping step. Returns
    ``(layers, StepDiagnostics)``.

    Sharding layout (the framework's dp x spatial equivalent of tensor/
    data-parallel layouts): the stereo pair batch is data-parallel over
    the flattened (pairs, tiles) mesh with RING frames (one frame per
    slot; the boundary frame ppermutes to the neighbor); the map rasters
    are row-band-sharded over ``tiles`` and replicated over ``pairs``.
    Points are ROUTED to their owner tile with a fixed-capacity
    all_to_all (capacity = route_capacity_factor * fair share), the
    binned halo strips are exchanged over ICI, and each band textures
    from its image subset — either the conservatively CULLED per-band
    layout (``band_image_operands``, [n_tiles, M, ...]) or the replicated
    every-band layout (``replicated_band_images``, [M, ...]) — so
    per-device point and image bytes SHRINK with the mesh instead of
    replicating (VERDICT r1 #2/#5).

    Bit-identical to the single-device composition whenever
    ``diag.overflow == 0`` AND (for a slab-culled ``banded``) the
    post-update elevation range ``[diag.elev_min, diag.elev_max]`` lies
    inside the slab the cull was built with — ``diag.check(slab_min,
    slab_max)`` validates both. A pair batch not divisible by the device
    count must be padded first (``pad_ring_pairs``); a map height not
    divisible by the tile count, via ``pad_map_geometry``.
    """
    n_pairs = mesh.shape[pairs_axis]
    n_tiles = mesh.shape[tiles_axis]
    b = ops.frames.shape[0]
    if b % (n_pairs * n_tiles) != 0:
        raise ValueError(
            f"pair batch {b} not divisible by device count "
            f"{n_pairs * n_tiles}; pad with pad_ring_pairs"
        )
    hw = ops.frames.shape[1] * ops.frames.shape[2]
    n_loc = (b // (n_pairs * n_tiles)) * hw
    cap = min(n_loc, int(-(-route_capacity_factor * n_loc // n_tiles)))
    _check_halo_fits_band(geom, n_tiles, dsm_cfg)

    layer_spec = {k: P(tiles_axis, None) for k in layers}
    dp = P((pairs_axis, tiles_axis))
    pair_spec = RingPairOperands(
        frames=dp, tail=P(), T1_inv=dp, T2_inv=dp, corners_rect=dp,
        R_G_C_rect=dp, t_G_C1=dp, baseline=dp,
        pair_valid=None if ops.pair_valid is None else dp,
    )
    if banded.ids.ndim == 1:  # replicated every-band layout
        band_specs = (P(), P(), P(), P())
    else:
        band_specs = (P(tiles_axis), P(tiles_axis), P(tiles_axis),
                      P(tiles_axis))
    fn = jax.shard_map(
        partial(
            _map_step_body, geom=geom, cam=cam, dsm_cfg=dsm_cfg,
            ortho_cfg=ortho_cfg, matcher=matcher, bm_cfg=bm_cfg,
            sgm_cfg=sgm_cfg, pairs_axis=pairs_axis, tiles_axis=tiles_axis,
            cap=cap, z_min=z_min, z_max=z_max,
        ),
        mesh=mesh,
        in_specs=(layer_spec, pair_spec) + band_specs,
        out_specs=(layer_spec, P(), P(), P(), P(tiles_axis)),
        check_vma=False,
    )
    out, overflow, elev_lo, elev_hi, routed = fn(
        layers, ops, banded.images, banded.quats, banded.ts, banded.ids
    )
    return out, StepDiagnostics(overflow, elev_lo, elev_hi, routed)


@partial(jax.jit, static_argnames=("cam", "cfg", "mesh", "axis_name"))
def sharded_plane_sweep(
    ops,  # PlaneSweepOperands, [B, ...] with B % n_devices == 0
    cam: Camera,
    cfg,
    mesh: Mesh,
    axis_name: str = "tiles",
):
    """Reference-view-data-parallel plane-sweep MVS: the batched view
    SLOTS (``prepare_plane_sweep_operands(pad_to_multiple=n_devices)``)
    shard over every device; the unique image stack stays replicated
    (every device may reference any frame through ``view_idx``, and a
    frame appears once instead of (1+M)x) and each device runs the same
    vmapped sweep — outputs concatenate back in global view order, the
    multi-view analogue of ``sharded_process_pairs`` (no cross-device
    exchange: a reference view owns its whole neighborhood)."""
    from aerial_mapper_tpu.stereo.plane_sweep import plane_sweep_batched

    b = ops.view_idx.shape[0]
    n_dev = mesh.shape[axis_name]
    if b % n_dev != 0:
        raise ValueError(
            f"reference-view batch {b} not divisible by {n_dev} devices; "
            "pad with prepare_plane_sweep_operands(pad_to_multiple=...)"
        )
    dp = P(axis_name)
    spec = type(ops)(
        images=P(), view_idx=dp, R_refs=dp, t_refs=dp,
        R_cw_nbrs=dp, t_nbrs=dp, ref_valid=dp,
    )
    fn = jax.shard_map(
        lambda o: plane_sweep_batched(o, cam, cfg),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(dp, dp, dp),
        check_vma=False,
    )
    return fn(ops)


def _homography_shard_body(images, quats, ts, valid, cam, cfg,
                           needs_undistortion, axis_name,
                           return_state=False):
    from aerial_mapper_tpu.camera.undistort import undistort_image
    from aerial_mapper_tpu.ortho.homography import (
        _accumulate_fn,
        create_mosaic_state,
    )

    accumulate = _accumulate_fn(cam, cfg)
    state0 = create_mosaic_state(cfg)

    def body(carry, inp):
        image, quat, t, ok = inp
        if needs_undistortion and cam.dist_kind != "none":
            image = undistort_image(cam, image)
        nxt = accumulate(carry, image, quat, t, cam, cfg)
        # padding slots contribute nothing (feather weights are nonzero
        # even for a black image, so masking the OUTPUT is required)
        nxt = jax.tree.map(
            lambda a, b: jnp.where(ok > 0.5, a, b), nxt, carry
        )
        return nxt, None

    state, _ = jax.lax.scan(body, state0, (images, quats, ts, valid))
    num = jax.lax.psum(state.weighted_sum, axis_name)
    den = jax.lax.psum(state.weight_sum, axis_name)
    # the single-device blend epsilon, verbatim (MosaicState.mosaic)
    st = type(state0)(num, den)
    return st if return_state else st.mosaic


@partial(
    jax.jit,
    static_argnames=("cam", "cfg", "mesh", "needs_undistortion",
                     "axis_name", "return_state"),
)
def sharded_homography_mosaic_batch(
    images: jax.Array,  # [N, H, W]
    quats_G_C: jax.Array,  # [N, 4]
    t_G_C: jax.Array,  # [N, 3]
    cam: Camera,
    cfg,
    mesh: Mesh,
    needs_undistortion: bool = True,
    axis_name: str = "tiles",
    return_state: bool = False,
):
    """Image-sharded forward-homography feather mosaic.

    The feather blend is a weighted SUM over images
    (ortho-forward-homography.cc:197-202 via cv::detail::FeatherBlender),
    so it is commutative: each device scans its image shard into local
    (weighted_sum, weight_sum) accumulators and two ``psum``s complete the
    blend. Equal to the single-device ``homography_mosaic_batch`` up to
    float summation order (allclose, not bit-identical — asserted by
    tests/test_parallel.py). The batch is padded to the device count with
    masked slots.
    """
    n = images.shape[0]
    n_dev = mesh.shape[axis_name]
    pad = (-n) % n_dev
    valid = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)]
    )
    if pad:
        def pad_tail(x):
            reps = jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])
            return jnp.concatenate([x, reps], axis=0)

        images = pad_tail(images)
        quats_G_C = pad_tail(quats_G_C)
        t_G_C = pad_tail(t_G_C)
    fn = jax.shard_map(
        partial(
            _homography_shard_body, cam=cam, cfg=cfg,
            needs_undistortion=needs_undistortion, axis_name=axis_name,
            return_state=return_state,
        ),
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(images, quats_G_C, t_G_C, valid)


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
