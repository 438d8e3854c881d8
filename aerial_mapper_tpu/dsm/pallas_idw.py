"""Fused Pallas IDW window accumulation: both passes VMEM-resident per tile.

The XLA window loop (dsm/idw.py::binned_idw) re-reads the padded [K, H, W]
binned arrays from HBM for every one of the ~105 window offsets in each of
its two passes (nearest-point, then weighted accumulation) — ~200 streamed
passes over the map. This kernel tiles the map rows over the Pallas grid,
loads each tile's halo-extended strips ([K, tile_h + 2*hw, W + 2*hw]) into
VMEM ONCE, and runs both offset loops plus the adaptive-radius ladder
entirely on-chip; HBM traffic collapses to one read of the binned arrays
and one write of the per-cell outputs.

Semantics mirror ``binned_idw`` op-for-op: the same circular offset list
(``_circular_offsets``), strict ``d2 < r_eff`` membership, 1/d^2 weights,
exact-match (d^2 <= eps) first-hit shortcut, and the closed-form adaptive
ladder, with identical K-leading reduction order.

Like stereo/pallas_bm.py and ortho/pallas_score.py, Mosaic cannot compile
through the axon remote-compile tunnel, so this kernel is validated in
interpret mode on CPU and shipped as the production-TPU opt-in path
(``DsmConfig.idw_kernel = "pallas"``); the XLA loop remains the default.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aerial_mapper_tpu.dsm.idw import (
    _EXACT_EPS,
    _FAR,
    _circular_offsets,
    _window_halfwidth,
    BinnedPoints,
)
from aerial_mapper_tpu.mapgrid.grid import MapGeometry

_LANES = 128


def _idw_kernel(offs_ref, de_ref, dn_ref, pl_ref, out_val, out_hit, *,
                tile_h: int, width: int, hw: int, num_offsets: int,
                resolution: float, radius_sq: float, adaptive: bool,
                growth: float, max_radius_sq: float):
    """One row tile: strips [K, tile_h + 2hw, Wp] resident in VMEM.

    offs_ref: [M, 2] int32 window offsets in SMEM (scalar-prefetch).
    Outputs [1, tile_h, width].
    """
    k = de_ref.shape[1]  # block shape [1, K, rows, cols]
    res = jnp.float32(resolution)

    def window(ref, oi, oj):
        # ref-level dynamic slices (value-level dynamic_slice has no
        # Mosaic lowering)
        return ref[0, :, pl.ds(oi, tile_h), pl.ds(oj, width)]  # [K, th, W]

    def d2_at(oi, oj):
        dj = (oj - hw).astype(jnp.float32)
        di = (oi - hw).astype(jnp.float32)
        de = window(de_ref, oi, oj) + dj * res
        dn = window(dn_ref, oi, oj) - di * res
        return de * de + dn * dn

    shape = (tile_h, width)

    # ---- Pass 1: nearest squared distance (adaptive ladder input). ----
    if adaptive:
        def min_body(o, d2min):
            d2 = d2_at(offs_ref[o, 0], offs_ref[o, 1])
            return jnp.minimum(d2min, jnp.min(d2, axis=0))

        d2min = jax.lax.fori_loop(
            0, num_offsets, min_body, jnp.full(shape, _FAR, jnp.float32)
        )
        ratio = jnp.maximum(d2min / radius_sq, 1e-30)
        kk = jnp.ceil(jnp.log(ratio) / math.log(growth))
        kk = jnp.where(
            radius_sq * jnp.power(growth, kk) <= d2min, kk + 1.0, kk
        )
        kk = jnp.maximum(kk, 0.0)
        r_eff = radius_sq * jnp.power(growth, kk)
        r_eff = jnp.where(d2min < radius_sq, radius_sq, r_eff)
        ok = r_eff <= max_radius_sq * (1.0 + 1e-6)
        r_eff = jnp.where(ok, r_eff, 0.0)
    else:
        r_eff = jnp.full(shape, radius_sq, jnp.float32)

    # ---- Pass 2: weighted accumulation within r_eff. ----
    def sum_body(o, carry):
        num, den, exact_val, exact_hit = carry
        oi, oj = offs_ref[o, 0], offs_ref[o, 1]
        d2 = d2_at(oi, oj)  # [K, th, W]
        pld = window(pl_ref, oi, oj)
        in_r = d2 < r_eff[None]
        is_exact = in_r & (d2 <= _EXACT_EPS)
        wgt = jnp.where(in_r & ~is_exact,
                        1.0 / jnp.maximum(d2, _EXACT_EPS), 0.0)
        num = num + jnp.sum(wgt * pld, axis=0)
        den = den + jnp.sum(wgt, axis=0)
        any_exact = jnp.any(is_exact, axis=0)
        # first exact slot along K (argmax of the bool mask), then keep the
        # first offset o that produced one (~exact_hit gate) — same policy
        # as the XLA loop
        slot = jnp.argmax(is_exact, axis=0)  # [th, W]
        slot_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (k,) + shape, 0)
            == slot[None]
        )
        first_exact = jnp.sum(jnp.where(slot_oh, pld, 0.0), axis=0)
        exact_val = jnp.where(~exact_hit & any_exact, first_exact, exact_val)
        exact_hit = exact_hit | any_exact
        return num, den, exact_val, exact_hit

    zeros = jnp.zeros(shape, jnp.float32)
    num, den, exact_val, exact_hit = jax.lax.fori_loop(
        0, num_offsets, sum_body,
        (zeros, zeros, zeros, jnp.zeros(shape, jnp.bool_)),
    )

    hit = (den > 0.0) | exact_hit
    values = jnp.where(
        exact_hit, exact_val, num / jnp.where(den > 0.0, den, 1.0)
    )
    out_val[:] = values[None]
    out_hit[:] = hit.astype(jnp.float32)[None]


@partial(
    jax.jit,
    static_argnames=("geom", "radius_sq", "adaptive", "growth",
                     "max_radius_sq", "tile_h", "interpret"),
)
def binned_idw_pallas(
    binned: BinnedPoints,
    geom: MapGeometry,
    radius_sq: float,
    adaptive: bool = True,
    growth: float = 1.1,
    max_radius_sq: float = 7.0,
    tile_h: int = 64,
    interpret: bool = False,
):
    """Drop-in fused-kernel alternative to ``binned_idw``.

    Returns ``(values [H, W], hit [H, W] bool)``.
    """
    k, h, w = binned.de.shape
    r2_cap = max_radius_sq if adaptive else radius_sq
    hw = _window_halfwidth(r2_cap, geom.resolution)
    offsets = _circular_offsets(hw, geom.resolution, r2_cap)
    offs = jnp.asarray(offsets, jnp.int32)

    tile_h = min(tile_h, h)
    pad_h = (-h) % tile_h
    n_tiles = (h + pad_h) // tile_h
    wp = w + 2 * hw
    wp_pad = (-wp) % _LANES

    def prep(arr, fill):
        # [K, H, W] -> [K, H + pads, Wp]: halo + tile padding on rows,
        # halo + lane alignment on columns (slot axis already leads)
        return jnp.pad(
            arr, ((0, 0), (hw, hw + pad_h), (hw, hw + wp_pad)),
            constant_values=fill,
        )

    de_p = prep(binned.de, _FAR)
    dn_p = prep(binned.dn, _FAR)
    pl_p = prep(binned.payload, 0.0)

    # overlapping halo strips pre-sliced into a leading tile axis
    # (BlockSpec blocks are disjoint; n_tiles x strip is small)
    strip_rows = tile_h + 2 * hw

    def strips(a):
        return jnp.stack(
            [jax.lax.dynamic_slice(
                a, (0, i * tile_h, 0), (k, strip_rows, wp + wp_pad))
             for i in range(n_tiles)]
        )

    kernel = partial(
        _idw_kernel, tile_h=tile_h, width=w, hw=hw,
        num_offsets=len(offsets), resolution=float(geom.resolution),
        radius_sq=float(radius_sq), adaptive=bool(adaptive),
        growth=float(growth), max_radius_sq=float(max_radius_sq),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, k, strip_rows, wp + wp_pad),
                         lambda i, offs_ref: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w), lambda i, offs_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
    )

    values, hit = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, w), jnp.float32)
            for _ in range(2)
        ],
        interpret=interpret,
    )(offs, strips(de_p), strips(dn_p), strips(pl_p))

    values = values.reshape(n_tiles * tile_h, w)[:h]
    hit = hit.reshape(n_tiles * tile_h, w)[:h] > 0.5
    return values, hit
