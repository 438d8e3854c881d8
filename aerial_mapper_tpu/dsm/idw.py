"""Grid-binned inverse-distance-weighted rasterization.

TPU-native replacement for the reference's kd-tree radius-search IDW
(``aerial_mapper_dsm/src/dsm.cc:36-111`` and
``aerial_mapper_ortho/src/ortho-from-pcl.cc:27-107``). Instead of a pointer-
chasing nanoflann tree we:

1. **bin** points into their owning map cell with a rank sort
   (cell id, quantized own-center distance, point index) + segment-boundary
   two-hop gather (capacity K slots per cell, deterministic NEAREST-K
   policy: an over-capacity cell keeps its K nearest points — the K largest
   IDW weights at that cell; error vs the reference's all-neighbors average
   is measured by the capacity sweep in tests/test_dsm_idw.py), and
2. **gather** per query cell over a fixed (2*hw+1)^2 cell window around it,
   accumulating the IDW sums with the exact per-point distances.

This is dense, static-shaped, and vectorizes onto the VPU; the window loop is
a ``lax.fori_loop`` over shifted views of a zero-copy padded array, so XLA
pipelines the HBM reads.

Numerical parity notes (see SURVEY.md "Parity with reference quirks"):

- The reference passes its ``interpolation_radius`` parameter straight into
  nanoflann, whose L2 adaptor returns **squared** distances
  (``nanoflann.hpp:296-330``), so the search radius is in m^2 and IDW weights
  are ``1/d^2``. We reproduce exactly that: ``radius_sq`` thresholds squared
  distances and weights are inverse *squared* distance.
- Adaptive growth multiplies the (squared) radius by ``growth`` until a
  neighbor is found, capped at ``max_radius_sq`` (7.0 m^2 for the DSM,
  dsm.cc:66-77; x10 growth for ortho-from-pcl, ortho-from-pcl.cc:63-71).
  Equivalent closed form: the effective radius is the smallest
  ``radius_sq * growth^k`` strictly greater than the squared distance to the
  nearest point.
- A point exactly on the cell center (d=0) short-circuits to that point's
  payload (ortho-from-pcl.cc:89-96; the DSM variant would CHECK-crash there,
  dsm.cc:98 — we take the payload instead of crashing).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.config import DsmConfig, OrthoFromPclConfig
from aerial_mapper_tpu.mapgrid.grid import MapGeometry

_FAR = 1.0e9  # sentinel coordinate offset for empty bin slots
_EXACT_EPS = 1.0e-12  # d^2 below this counts as a perfect match
_BOUNDS_STRIDE = 64  # block size for the two-level segment-bounds search


def _bounds_of_sorted(sorted_ids: jax.Array, num_cells: int) -> jax.Array:
    """bounds[c] = #sorted ids < c, for every c in [0, num_cells]; exact.

    Replaces ``jnp.searchsorted``'s 24-step binary scan (24 arbitrary
    gathers per query — gather cost on this hardware is per index) with a
    two-level search: per-block maxima of stride-64 blocks are counted
    into a histogram + exclusive cumsum that locates each query's block
    directly (dense integer queries make the histogram O(num_cells)),
    then log2(stride) = 6 binary steps refine within the block. Measured
    28.5 -> 10.1 ms for 168k queries into 12.6M ids on a v5e; bit-exact
    vs searchsorted (unit test + A/B).
    """
    n = sorted_ids.shape[0]
    stride = _BOUNDS_STRIDE
    npad = -(-n // stride) * stride
    # pad with a value larger than any query so padded tails never count
    s = jnp.pad(sorted_ids, (0, npad - n), constant_values=num_cells + 1)
    block_max = s[stride - 1::stride]
    hist = jnp.zeros(num_cells + 2, jnp.int32).at[
        jnp.clip(block_max, 0, num_cells + 1)
    ].add(1)
    ex = jnp.cumsum(hist)
    nblocks_lt = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), ex[:num_cells]]
    )  # [num_cells + 1]
    lo = nblocks_lt * stride  # bounds[c] - lo[c] in [0, stride - 1]
    c = jnp.arange(num_cells + 1, dtype=sorted_ids.dtype)
    off = jnp.zeros(num_cells + 1, jnp.int32)
    step = stride // 2
    while step >= 1:  # static unrolled binary refinement
        p = jnp.minimum(lo + off + step - 1, npad - 1)
        off = off + jnp.where(s[p] < c, step, 0)
        step //= 2
    return jnp.minimum(lo + off, n)


class BinnedPoints(NamedTuple):
    """Points scattered into per-cell capacity-K slots.

    ``de``/``dn``: [K, H, W] offsets of each stored point from its owning
    cell's center (meters; _FAR for empty slots). ``payload``: [K, H, W].
    ``count``: [H, W] number of points binned (pre-capacity-clip).

    The slot axis K leads: XLA tiles the two minor-most dims to the
    (sublane, lane) = (8, 128) register shape, so a trailing K=8 axis pads
    to 128 lanes — 16x the footprint and HBM traffic of the same data with
    (H, W) minor (the windowed accumulation measured 3.3x slower in the
    trailing-K layout on a v5e).
    """

    de: jax.Array
    dn: jax.Array
    payload: jax.Array
    count: jax.Array


@partial(jax.jit, static_argnames=("geom", "capacity"))
def bin_points(
    points_xy: jax.Array,
    payload: jax.Array,
    valid: jax.Array,
    geom: MapGeometry,
    capacity: int,
    north=None,
    west=None,
    row_offset=0,
    col_offset=0,
    rank=None,
) -> BinnedPoints:
    """Scatter points (x=easting, y=northing) into per-cell slots.

    Out-of-grid points and slots beyond ``capacity`` are dropped (the
    capacity policy keeps each cell's K NEAREST points by distance to the
    owning cell center, ties by input index — deterministic across runs
    and shardings; see the sort-key comment below). Stores cell-relative
    offsets so everything after binning is small-magnitude float32.

    ``north``/``west`` are the edges used for cell assignment AND the
    cell-center arithmetic (default: ``geom``'s own). ``row_offset``/
    ``col_offset`` (integers, may be traced) shift the assigned indices
    into this grid's local frame AFTER assignment. Halo-extended and
    tile-sharded callers must pass the GLOBAL map edges plus their integer
    offset instead of a shifted edge: every float op (floor, cell center,
    point-to-center offset) is then bit-for-bit the same on every tile and
    on a single device, so IDW knife-edge cases (a distance exactly at the
    radius, the adaptive ladder's ceil) cannot diverge between shardings
    (test_parallel.py asserts bit-identical rasters).

    ``rank`` (optional int32 [N], default = position): the nearest-K
    tie-break key. Owner-tile-routed callers pass each point's GLOBAL
    index so slot assignment is bit-identical to a single device binning
    the whole cloud, regardless of arrival order after routing.
    """
    h, w, k = geom.height, geom.width, capacity
    n = points_xy.shape[0]
    if n == 0:
        # static early-out: the gathers below are ill-defined on size-0
        # operands (ADVICE r1) and an empty stack trivially bins to nothing
        return BinnedPoints(
            de=jnp.full((k, h, w), _FAR, points_xy.dtype),
            dn=jnp.full((k, h, w), _FAR, points_xy.dtype),
            payload=jnp.zeros((k, h, w), payload.dtype),
            count=jnp.zeros((h, w), jnp.int32),
        )
    north_edge = geom.north if north is None else north
    west_edge = geom.west if west is None else west

    col_g = jnp.floor((points_xy[:, 0] - west_edge) / geom.resolution)
    row_g = jnp.floor((north_edge - points_xy[:, 1]) / geom.resolution)
    col = col_g + col_offset
    row = row_g + row_offset
    in_map = (
        valid
        & (col >= 0)
        & (col < w)
        & (row >= 0)
        & (row < h)
        & jnp.isfinite(points_xy[:, 0])
        & jnp.isfinite(points_xy[:, 1])
    )
    coli = jnp.clip(col.astype(jnp.int32), 0, w - 1)
    rowi = jnp.clip(row.astype(jnp.int32), 0, h - 1)
    cell_id = jnp.where(in_map, rowi * w + coli, h * w)  # invalid -> sentinel

    # Cell-relative offsets (meters from owning cell center), computed from
    # the GLOBAL cell index (integer un-shift, exact) and the global edges.
    ce = west_edge + (
        (coli - col_offset).astype(points_xy.dtype) + 0.5
    ) * geom.resolution
    cn = north_edge - (
        (rowi - row_offset).astype(points_xy.dtype) + 0.5
    ) * geom.resolution

    # Three-key sort (cell id, quantized own-center distance, point index):
    # sort cost scales with carried bytes, so ranking 12 B/point instead of
    # dragging the three float payloads through the comparator network
    # keeps the sort cheap. Slot (cell, rank) lives at sorted position
    # bounds[cell] + rank; slot values come from a TWO-HOP gather
    # (slot -> sorted index -> packed point row) — gather cost here is per
    # index, not per fetched element, so (de, dn, payload) ride as trailing
    # channels of one row fetch. Versus three 12M-element scatters the
    # whole binning measured 895 -> 155 -> 116 ms for 12.6M points on a
    # v5e.
    #
    # CAPACITY POLICY (nearest-K): the middle key ranks each cell's points
    # by squared distance to the OWNING cell's center (quantized to 2^-22
    # of the max in-cell d^2, ties broken by input index), so a cell over
    # capacity keeps its K nearest points — the K largest 1/d^2 IDW weights
    # for queries at that cell's own center, and approximately the largest
    # for nearby query cells. The reference averages EVERY in-radius point
    # (dsm.cc:93-104); the nearest-K clip's residual error is bounded by
    # the dropped tail's weight share and is measured by the overflow
    # parity sweep in tests/test_dsm_idw.py. Deterministic across runs AND
    # shardings: d^2 is computed from the GLOBAL edges (bit-identical on
    # every tile) and the index tie-break is total.
    idx = jnp.arange(n, dtype=jnp.int32)
    de_pt = points_xy[:, 0] - ce
    dn_pt = points_xy[:, 1] - cn
    d2_own = de_pt * de_pt + dn_pt * dn_pt
    # in-cell d^2 <= res^2/2; quantize to int32 with ~2^22 buckets of that
    # range (invalid/out-of-map points get the max key; their cell id is
    # already the drop sentinel)
    qscale = float(2 ** 22) / (geom.resolution * geom.resolution * 0.5)
    qd2 = jnp.where(
        in_map, jnp.minimum(d2_own * qscale, 2.0 ** 30), 2.0 ** 30
    ).astype(jnp.int32)
    # (cell, qd2, rank, idx) tuples are all distinct (idx is), so an
    # unstable 4-key sort yields a deterministic total order; rank defaults
    # to idx (one key collapses)
    if rank is None:
        sorted_ids, _, sorted_idx = jax.lax.sort(
            (cell_id, qd2, idx), num_keys=3, is_stable=False
        )
    else:
        sorted_ids, _, _, sorted_idx = jax.lax.sort(
            (cell_id, qd2, rank.astype(jnp.int32), idx),
            num_keys=4, is_stable=False,
        )
    packed_src = jnp.stack(
        [points_xy[:, 0] - ce, points_xy[:, 1] - cn,
         payload.astype(points_xy.dtype)], axis=-1
    )  # [N, 3]
    bounds = _bounds_of_sorted(sorted_ids, h * w)
    # slot-major [K, H*W] positions so the outputs land directly in the
    # K-leading layout (see BinnedPoints docstring)
    pos = bounds[None, :-1] + jnp.arange(k, dtype=bounds.dtype)[:, None]
    slot_ok = (pos < bounds[None, 1:]).reshape(-1)  # rank < count[cell]
    # Hop 1 (sorted position -> original point index): each cell's K slot
    # positions are CONSECUTIVE (bounds[c] .. bounds[c]+K-1), so instead
    # of K*H*W arbitrary gathers, fetch the ceil((K+7)/8)+1 8-aligned rows
    # of a [N/8, 8]-grouped sorted_idx that cover them (nrows*H*W indices —
    # gather cost here is per index) and pick each slot with a branchless
    # 8-way shift select (integer, bit-exact). The select is K*8 cheap
    # vector ops, so the grouped path stays ahead of the K*H*W arbitrary
    # gather up to K ~ 64 (capacity-sweep parity tests run K = 8/16/32).
    n_sorted = sorted_ids.shape[0]
    if k <= 64:
        grp = 8
        nrows = (k + grp - 2) // grp + 1  # rows covering base..base+k-1
        ngrp = -(-n_sorted // grp) + nrows - 1  # pad: r0 + nrows - 1 in range
        sidx_g = jnp.pad(
            sorted_idx, (0, ngrp * grp - n_sorted)
        ).reshape(ngrp, grp)
        base = jnp.minimum(bounds[:-1], n_sorted - 1)  # [C]
        r0 = base // grp
        shift = base % grp
        cat = jnp.concatenate(
            [sidx_g[r0 + j] for j in range(nrows)], axis=1
        )  # [C, nrows*8]
        rows = [
            sum(
                jnp.where(shift == s, cat[:, s + kk], 0)
                for s in range(grp)
            )
            for kk in range(k)
        ]
        point_idx = jnp.stack(rows, axis=0).reshape(-1)  # [K*C] slot-major
        point_idx = jnp.minimum(point_idx, n_sorted - 1)
    else:
        posc = jnp.minimum(pos, n_sorted - 1).reshape(-1)
        point_idx = sorted_idx[posc]
    slots = packed_src[point_idx]  # [K*H*W, 3] hop 2
    de = jnp.where(slot_ok, slots[:, 0], _FAR)
    dn = jnp.where(slot_ok, slots[:, 1], _FAR)
    pl = jnp.where(slot_ok, slots[:, 2].astype(payload.dtype),
                   jnp.zeros((), payload.dtype))
    count = jnp.diff(bounds).astype(jnp.int32)

    return BinnedPoints(
        de=de.reshape(k, h, w),
        dn=dn.reshape(k, h, w),
        payload=pl.reshape(k, h, w),
        count=count.reshape(h, w),
    )


def _window_halfwidth(max_radius_sq: float, resolution: float) -> int:
    """Cells needed so the window covers the max search radius.

    A point in a neighbor cell at offset o (cells) can be as close as
    (o-1)*resolution from the query center, so we need (hw)*res >= r_max + res.
    """
    r_max = math.sqrt(max_radius_sq)
    return max(1, int(math.ceil(r_max / resolution)) + 1)


def _circular_offsets(hw: int, resolution: float, r2_cap: float):
    """Static (oi, oj) window offsets whose cells can contain an in-radius
    point: a point binned to cell offset (di, dj) sits at least
    max(|di|-0.5, 0) / max(|dj|-0.5, 0) cells from the query center per
    axis, so offsets beyond that bound can never pass the strict in_r test
    nor move the adaptive ladder's outcome (see binned_idw)."""
    win = 2 * hw + 1

    def min_d2(di: int, dj: int) -> float:
        ee = max(abs(dj) - 0.5, 0.0) * resolution
        nn = max(abs(di) - 0.5, 0.0) * resolution
        return ee * ee + nn * nn

    return [
        (oi, oj)
        for oi in range(win)
        for oj in range(win)
        if min_d2(oi - hw, oj - hw) <= r2_cap * (1.0 + 1e-6)
    ]


@partial(
    jax.jit,
    static_argnames=("geom", "radius_sq", "adaptive", "growth", "max_radius_sq"),
)
def binned_idw(
    binned: BinnedPoints,
    geom: MapGeometry,
    radius_sq: float,
    adaptive: bool = True,
    growth: float = 1.1,
    max_radius_sq: float = 7.0,
):
    """IDW interpolation of ``binned.payload`` onto every map cell.

    Returns ``(values [H, W], hit_mask [H, W])``; cells with no neighbor in
    the (possibly grown) radius have hit_mask False (the reference leaves the
    layer value untouched there, dsm.cc:79-106).
    """
    k, h, w = binned.de.shape
    dtype = binned.de.dtype
    r2_cap = max_radius_sq if adaptive else radius_sq
    hw = _window_halfwidth(r2_cap, geom.resolution)

    # Static circular offset mask (~2x fewer iterations than the square
    # window at large radius/resolution); exactness argument at
    # _circular_offsets.
    offsets = _circular_offsets(hw, geom.resolution, r2_cap)
    offs_arr = jnp.asarray(offsets, jnp.int32)  # [M, 2]
    num_offsets = len(offsets)

    pad = ((0, 0), (hw, hw), (hw, hw))
    de_p = jnp.pad(binned.de, pad, constant_values=_FAR)
    dn_p = jnp.pad(binned.dn, pad, constant_values=_FAR)
    pl_p = jnp.pad(binned.payload, pad, constant_values=0.0)

    res = jnp.asarray(geom.resolution, dtype)

    def window_view(arr, oi, oj):
        return jax.lax.dynamic_slice(arr, (0, oi, oj), (k, h, w))

    def d2_at(oi, oj):
        # Source point position relative to query cell center:
        # offset-from-own-cell + (cell offset) * resolution.
        # oi is row offset (northing decreases with row), oj is col offset.
        dj = (oj - hw).astype(dtype)
        di = (oi - hw).astype(dtype)
        de = window_view(de_p, oi, oj) + dj * res
        dn = window_view(dn_p, oi, oj) - di * res
        return de * de + dn * dn

    # ---- Pass 1: squared distance to the nearest point per cell. ----
    # Only needed for the adaptive ladder; the fixed-radius path reads
    # nothing from it.
    def min_body(o, d2min):
        oi, oj = offs_arr[o, 0], offs_arr[o, 1]
        d2 = d2_at(oi, oj)
        return jnp.minimum(d2min, jnp.min(d2, axis=0))

    if adaptive:
        d2min = jax.lax.fori_loop(
            0, num_offsets, min_body, jnp.full((h, w), _FAR, dtype)
        )

    # ---- Effective per-cell squared radius (adaptive ladder). ----
    if adaptive:
        # smallest radius_sq * growth^k strictly greater than d2min
        ratio = jnp.maximum(d2min / radius_sq, 1e-30)
        kk = jnp.ceil(jnp.log(ratio) / math.log(growth))
        # strict inequality: if d2min == radius_sq * growth^k exactly, grow once
        kk = jnp.where(
            radius_sq * jnp.power(growth, kk) <= d2min, kk + 1.0, kk
        )
        kk = jnp.maximum(kk, 0.0)
        r_eff = radius_sq * jnp.power(growth, kk)
        r_eff = jnp.where(d2min < radius_sq, radius_sq, r_eff)
        ok = r_eff <= max_radius_sq * (1.0 + 1e-6)
        r_eff = jnp.where(ok, r_eff, 0.0)  # empty neighbor set
    else:
        r_eff = jnp.full((h, w), radius_sq, dtype)

    # ---- Pass 2: accumulate IDW sums within r_eff. ----
    def sum_body(o, carry):
        num, den, exact_val, exact_hit = carry
        oi, oj = offs_arr[o, 0], offs_arr[o, 1]
        d2 = d2_at(oi, oj)
        pl = window_view(pl_p, oi, oj)
        in_r = d2 < r_eff[None]
        is_exact = in_r & (d2 <= _EXACT_EPS)
        wgt = jnp.where(in_r & ~is_exact, 1.0 / jnp.maximum(d2, _EXACT_EPS), 0.0)
        num = num + jnp.sum(wgt * pl, axis=0)
        den = den + jnp.sum(wgt, axis=0)
        any_exact = jnp.any(is_exact, axis=0)
        # first exact slot along K as a masked reduce — a per-cell arbitrary
        # gather here costs H*W indices PER OFFSET (~20M gathered indices
        # over the loop, the dominant cost of the old trailing-K version)
        slot = jnp.argmax(is_exact, axis=0)
        slot_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (k, h, w), 0) == slot[None]
        )
        first_exact = jnp.sum(jnp.where(slot_oh, pl, 0.0), axis=0)
        exact_val = jnp.where(~exact_hit & any_exact, first_exact, exact_val)
        exact_hit = exact_hit | any_exact
        return num, den, exact_val, exact_hit

    num0 = jnp.zeros((h, w), dtype)
    den0 = jnp.zeros((h, w), dtype)
    ex0 = jnp.zeros((h, w), dtype)
    exh0 = jnp.zeros((h, w), jnp.bool_)
    num, den, exact_val, exact_hit = jax.lax.fori_loop(
        0, num_offsets, sum_body, (num0, den0, ex0, exh0)
    )

    hit = (den > 0.0) | exact_hit
    values = jnp.where(
        exact_hit, exact_val, num / jnp.where(den > 0.0, den, 1.0)
    )
    return values, hit


def idw_to_grid(
    points_xy: jax.Array,
    payload: jax.Array,
    valid: jax.Array,
    geom: MapGeometry,
    capacity: int,
    radius_sq: float,
    adaptive: bool,
    growth: float,
    max_radius_sq: float,
    kernel: str = "xla",
):
    """Bin + IDW onto ``geom``'s grid, halo-extended so points just outside
    the map still contribute to edge cells.

    The reference builds its kd-tree from ALL points regardless of map
    bounds (dsm.cc:36-52), so a point beyond the map edge is a valid
    neighbor of an edge cell; the halo ring reproduces that.
    """
    halo = _window_halfwidth(max_radius_sq if adaptive else radius_sq,
                             geom.resolution)
    ext_geom = MapGeometry(
        geom.center_easting, geom.center_northing, geom.resolution,
        geom.height + 2 * halo, geom.width + 2 * halo,
    )
    binned = bin_points(
        points_xy, payload, valid, ext_geom, capacity,
        north=geom.north, west=geom.west,
        row_offset=halo, col_offset=halo,
    )
    if kernel == "pallas":
        from aerial_mapper_tpu.dsm.pallas_idw import binned_idw_pallas

        values, hit = binned_idw_pallas(
            binned, ext_geom, radius_sq=radius_sq, adaptive=adaptive,
            growth=growth, max_radius_sq=max_radius_sq,
            interpret=jax.default_backend() == "cpu",
        )
    elif kernel == "xla":
        values, hit = binned_idw(
            binned, ext_geom, radius_sq=radius_sq, adaptive=adaptive,
            growth=growth, max_radius_sq=max_radius_sq,
        )
    else:
        raise ValueError(
            f"idw kernel must be 'xla' or 'pallas', got {kernel!r}"
        )
    crop = (slice(halo, halo + geom.height), slice(halo, halo + geom.width))
    return values[crop], hit[crop]


def update_elevation_layer(
    map_layers: dict,
    points_xyz: jax.Array,
    valid: jax.Array,
    geom: MapGeometry,
    cfg: DsmConfig,
) -> dict:
    """DSM entry point: IDW of point z onto the ``elevation`` layer.

    Mirrors ``dsm::Dsm::process`` (dsm.cc:186-201): cells without neighbors
    keep their previous value (NaN on a fresh map). The reference's
    center_easting/northing offsets (dsm.cc:42-43) are handled by the map
    geometry itself.
    """
    values, hit = idw_to_grid(
        points_xyz[:, :2], points_xyz[:, 2], valid, geom, cfg.bin_capacity,
        radius_sq=cfg.interpolation_radius_sq,
        adaptive=cfg.adaptive_interpolation,
        growth=cfg.adaptive_growth_factor,
        max_radius_sq=cfg.max_radius_sq,
        kernel=cfg.idw_kernel,
    )
    old = map_layers["elevation"]
    new = dict(map_layers)
    new["elevation"] = jnp.where(hit, values, old)
    return new


@partial(
    jax.jit,
    static_argnames=("geom", "radius_sq", "growth", "cell_chunk"),
)
def idw_unbounded_brute(
    points_xy: jax.Array,
    payload: jax.Array,
    valid: jax.Array,
    geom: MapGeometry,
    radius_sq: float,
    growth: float,
    cell_chunk: int = 2048,
):
    """UNBOUNDED adaptive IDW by brute force over every point.

    Reproduces the reference's cap-free growth loop — the kd-tree holds
    ALL points and the radius multiplies by ``growth`` until a neighbor
    appears, with no upper bound (ortho-from-pcl.cc:63-71) — by computing
    each cell's global nearest squared distance directly, taking the
    closed-form ladder rung, and accumulating the 1/d^2 sums over the full
    [cell_chunk, N] distance tile. O(cells x points): this is the
    sparse-cloud fallback behind ``ortho_from_points`` (dense clouds never
    reach it), not a bulk path. A cloud with zero valid points returns
    hit=False everywhere (the reference would spin forever there,
    ortho-from-pcl.cc:64-70).
    """
    from aerial_mapper_tpu.mapgrid.grid import cell_centers

    ce, cn = cell_centers(geom)
    q = jnp.stack([ce.ravel(), cn.ravel()], axis=1)  # [M, 2]
    m = q.shape[0]
    npad = -(-m // cell_chunk) * cell_chunk
    qp = jnp.pad(q, ((0, npad - m), (0, 0)))
    # invalid points at +inf: their d^2 is +inf, outside every radius
    px = jnp.where(valid, points_xy[:, 0].astype(jnp.float32), jnp.inf)
    py = jnp.where(valid, points_xy[:, 1].astype(jnp.float32), jnp.inf)
    pl = payload.astype(jnp.float32)

    def chunk_fn(qc):  # [C, 2] -> (values [C], hit [C])
        dx = qc[:, :1] - px[None, :]
        dy = qc[:, 1:2] - py[None, :]
        d2 = dx * dx + dy * dy  # [C, N]
        d2min = jnp.min(d2, axis=1)
        # closed-form cap-free ladder (same arithmetic as binned_idw)
        ratio = jnp.maximum(d2min / radius_sq, 1e-30)
        kk = jnp.ceil(jnp.log(ratio) / math.log(growth))
        kk = jnp.where(
            radius_sq * jnp.power(growth, kk) <= d2min, kk + 1.0, kk
        )
        kk = jnp.maximum(kk, 0.0)
        r_eff = radius_sq * jnp.power(growth, kk)
        r_eff = jnp.where(d2min < radius_sq, radius_sq, r_eff)
        in_r = d2 < r_eff[:, None]
        is_exact = in_r & (d2 <= _EXACT_EPS)
        wgt = jnp.where(
            in_r & ~is_exact, 1.0 / jnp.maximum(d2, _EXACT_EPS), 0.0
        )
        num = jnp.sum(wgt * pl[None, :], axis=1)
        den = jnp.sum(wgt, axis=1)
        any_exact = jnp.any(is_exact, axis=1)
        exact_val = pl[jnp.argmax(is_exact, axis=1)]
        hit = (den > 0.0) | any_exact
        vals = jnp.where(
            any_exact, exact_val, num / jnp.where(den > 0.0, den, 1.0)
        )
        return vals, hit

    vals, hit = jax.lax.map(
        chunk_fn, qp.reshape(-1, cell_chunk, 2)
    )
    return (
        vals.reshape(-1)[:m].reshape(ce.shape),
        hit.reshape(-1)[:m].reshape(ce.shape),
    )


def ortho_from_points(
    map_layers: dict,
    points_xyz: jax.Array,
    intensities: jax.Array,
    valid: jax.Array,
    geom: MapGeometry,
    cfg: OrthoFromPclConfig,
) -> dict:
    """Ortho backend C: IDW of pixel intensities onto the ``ortho`` layer.

    Mirrors ``ortho::OrthoFromPcl::process`` (ortho-from-pcl.cc:20-107) —
    same kd-tree/IDW machinery as the DSM but with intensity payload.

    ``cfg.max_radius_sq=None`` reproduces the reference's UNBOUNDED
    adaptive growth (ortho-from-pcl.cc:63-71): the windowed kernel runs
    with a working cap first (bit-identical for every cell it fills —
    ladder rungs below the cap are cap-independent), then the sparse
    remainder is completed by the exact global brute-force pass. On dense
    clouds the fallback never dispatches (one host-side all-hit check).
    """
    adaptive = cfg.use_adaptive_interpolation
    unbounded = cfg.max_radius_sq is None and adaptive
    if unbounded:
        # working cap: a ~12-cell window keeps the fast path fast; snapped
        # up to at least one growth rung above the base radius
        cap = max(cfg.interpolation_radius_sq * cfg.adaptive_growth_factor,
                  (12.0 * geom.resolution) ** 2)
    elif cfg.max_radius_sq is None:
        cap = cfg.interpolation_radius_sq  # fixed radius, no growth
    else:
        cap = cfg.max_radius_sq
    values, hit = idw_to_grid(
        points_xyz[:, :2], intensities.astype(jnp.float32), valid, geom,
        cfg.bin_capacity,
        radius_sq=cfg.interpolation_radius_sq,
        adaptive=adaptive,
        growth=cfg.adaptive_growth_factor,
        max_radius_sq=cap,
    )
    if unbounded and not bool(hit.all()):
        far_vals, far_hit = idw_unbounded_brute(
            points_xyz[:, :2], intensities, valid, geom,
            radius_sq=cfg.interpolation_radius_sq,
            growth=cfg.adaptive_growth_factor,
        )
        values = jnp.where(hit, values, far_vals)
        hit = hit | far_hit
    new = dict(map_layers)
    new["ortho"] = jnp.where(hit, values, map_layers["ortho"])
    return new
