"""Fused Pallas SGM aggregation: the directional DP runs in VMEM per row tile.

The XLA SGM path (stereo/matching.py::_sgm_scan_1d) expresses each
Hirschmuller scan as a ``lax.scan`` whose carry round-trips through HBM every
step and whose compile time grows with the scan length; at 752x480x64 the
4-direction aggregation costs ~24 ms/pair (unroll=4). This kernel tiles rows over the
Pallas grid (scan lines are independent for a horizontal pass), keeps the
[tile_h, D, W] cost strip and the [tile_h, D] carry resident in VMEM, and
walks W with ref-level dynamic slices — HBM traffic collapses to one read of
the cost volume and one write of the aggregated volume per direction.

The recurrence mirrors ``_sgm_scan_1d`` op-for-op (same +P1 clamped-copy
boundary treatment, same min ordering), so aggregated volumes match the XLA
path to float tolerance. Vertical directions reuse the same kernel on the
H<->W transposed volume; reverse directions flip W — both pure relayouts.

Like the other fused kernels, Mosaic cannot compile through the axon
remote-compile tunnel, so this is validated in interpret mode on CPU and
shipped as the production-TPU opt-in path (``SgmConfig.kernel = "pallas"``);
the XLA formulation stays the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aerial_mapper_tpu.config import SgmConfig
from aerial_mapper_tpu.stereo.matching import (
    INVALID_DISPARITY,
    _border_mask,
    _box_filter,
    _bt_cost,
    _lr_consistency_mask,
    apply_speckle_filter,
    _uniqueness_mask,
    _wta_subpixel,
    _xsobel_prefilter,
)

_LANES = 128


def _sgm_scan_kernel(*refs, width: int, p1: float, p2: float,
                     has_restart: bool):
    """One row tile: cost_ref/out_ref [1, tile_h, D, W_pad] in VMEM.

    Walks columns 0..width-1 with the SGM recurrence; the carry [tile_h, D]
    lives in registers/VMEM. With ``has_restart`` an extra
    [1, tile_h, W_pad] float mask marks segment starts where the DP resets
    (out = raw cost) — the diagonal passes' border restart.
    """
    if has_restart:
        cost_ref, restart_ref, out_ref = refs
    else:
        cost_ref, out_ref = refs
    init = cost_ref[0, :, :, 0]  # [tile_h, D]
    out_ref[0, :, :, 0] = init

    def step(w, carry):
        c = cost_ref[0, :, :, w]  # [tile_h, D]
        m = jnp.min(carry, axis=-1, keepdims=True)
        up = jnp.concatenate(
            [carry[:, :1] + p1, carry[:, :-1] + p1], axis=-1
        )
        down = jnp.concatenate(
            [carry[:, 1:] + p1, carry[:, -1:] + p1], axis=-1
        )
        best = jnp.minimum(jnp.minimum(carry, up),
                           jnp.minimum(down, m + p2))
        out = c + best - m
        if has_restart:
            # r = 1 at a segment start: drop the carry entirely
            r = restart_ref[0, :, w][:, None]  # [tile_h, 1]
            out = c + (best - m) * (1.0 - r)
        out_ref[0, :, :, w] = out
        return out

    jax.lax.fori_loop(1, width, step, init)


@partial(jax.jit, static_argnames=("p1", "p2", "reverse", "tile_h",
                                   "interpret"))
def sgm_aggregate_pallas(
    cost: jax.Array,  # [H, W, D]
    p1: float,
    p2: float,
    reverse: bool = False,
    tile_h: int = 64,
    interpret: bool = False,
    restart: jax.Array | None = None,  # [H, W] bool segment starts (fwd)
) -> jax.Array:
    """One directional aggregation along W. Matches
    ``_sgm_scan_1d(cost, p1, p2, reverse, restart=...)`` (matching.py),
    including the diagonal passes' border-restart flags."""
    h, w, d = cost.shape
    if restart is not None:
        if reverse:
            # segment start in reverse order == forward segment end
            restart = jnp.concatenate(
                [restart[:, 1:], jnp.ones_like(restart[:, :1])], axis=1
            )
        rmask = restart.astype(cost.dtype)
        if reverse:
            rmask = jnp.flip(rmask, axis=1)
    if reverse:
        cost = jnp.flip(cost, axis=1)

    tile_h = min(tile_h, h)
    pad_h = (-h) % tile_h
    n_tiles = (h + pad_h) // tile_h
    w_pad = (-w) % _LANES

    # [H, W, D] -> [H_pad, D, W_pad]: the scan axis goes to lanes so each
    # step is a lane-axis dynamic slice; D rides the sublane axis
    chw = jnp.moveaxis(cost, 2, 1)  # [H, D, W]
    chw = jnp.pad(chw, ((0, pad_h), (0, 0), (0, w_pad)))
    chw = chw.reshape(n_tiles, tile_h, d, w + w_pad)

    kernel = partial(_sgm_scan_kernel, width=w, p1=float(p1), p2=float(p2),
                     has_restart=restart is not None)
    operands = [chw]
    in_specs = [
        pl.BlockSpec((1, tile_h, d, w + w_pad), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if restart is not None:
        rm = jnp.pad(rmask, ((0, pad_h), (0, w_pad)))
        operands.append(rm.reshape(n_tiles, tile_h, w + w_pad))
        in_specs.append(
            pl.BlockSpec((1, tile_h, w + w_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    agg = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, d, w + w_pad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, tile_h, d, w + w_pad), cost.dtype
        ),
        interpret=interpret,
    )(*operands)

    agg = agg.reshape(n_tiles * tile_h, d, w + w_pad)[:h, :, :w]
    agg = jnp.moveaxis(agg, 1, 2)  # [H, W, D]
    if reverse:
        agg = jnp.flip(agg, axis=1)
    return agg


@partial(jax.jit, static_argnames=("cfg", "tile_h", "interpret"))
def sgm_disparity_pallas(
    left: jax.Array,
    right: jax.Array,
    mask: jax.Array,
    cfg: SgmConfig,
    tile_h: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused-aggregation alternative to ``sgm_disparity``
    (4 or 8 scan directions per ``cfg.num_directions``; cost build and
    post-filters shared with the XLA path)."""
    h, w = left.shape
    lf = _xsobel_prefilter(left.astype(jnp.float32),
                           float(cfg.pre_filter_cap))
    rf = _xsobel_prefilter(right.astype(jnp.float32),
                           float(cfg.pre_filter_cap))

    cost = _bt_cost(lf, rf, cfg.num_disparities, cfg.min_disparity)
    if cfg.block_size > 1:
        cost = _box_filter(cost, cfg.block_size) / float(cfg.block_size**2)
    border = _border_mask(h, w, cfg.num_disparities, cfg.min_disparity)
    cost = jnp.where(border, cost, 1e4)

    chwd = jnp.moveaxis(cost, 0, -1)  # [H, W, D]
    kw = dict(tile_h=tile_h, interpret=interpret)
    agg = sgm_aggregate_pallas(chwd, cfg.p1, cfg.p2, reverse=False, **kw)
    agg = agg + sgm_aggregate_pallas(chwd, cfg.p1, cfg.p2, reverse=True,
                                     **kw)
    cthw = jnp.swapaxes(chwd, 0, 1)  # [W, H, D]
    agg_v = sgm_aggregate_pallas(cthw, cfg.p1, cfg.p2, reverse=False, **kw)
    agg_v = agg_v + sgm_aggregate_pallas(cthw, cfg.p1, cfg.p2, reverse=True,
                                         **kw)
    agg = agg + jnp.swapaxes(agg_v, 0, 1)

    if cfg.num_directions >= 8:
        # Diagonals via the same row-shear as the XLA path (matching.py):
        # shift row i by +/- i columns (mod W) so each diagonal becomes a
        # column, aggregate vertically with the same kernel, unshear.
        def shear(x, sign):
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
                + sign * jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            ) % w
            return jnp.take_along_axis(x, idx[..., None], axis=1)

        for sign in (+1, -1):
            swhd = jnp.swapaxes(shear(chwd, sign), 0, 1)  # [W, H, D]
            # same border-restart flags as the XLA path: a new diagonal
            # segment begins where the sheared source column wraps
            src_col = (
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
                + sign * jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
            ) % w
            restart = jnp.swapaxes(
                src_col == (0 if sign > 0 else w - 1), 0, 1
            )  # [W, H]
            a = sgm_aggregate_pallas(swhd, cfg.p1, cfg.p2, reverse=False,
                                     restart=restart, **kw)
            a = a + sgm_aggregate_pallas(swhd, cfg.p1, cfg.p2, reverse=True,
                                         restart=restart, **kw)
            agg = agg + shear(jnp.swapaxes(a, 0, 1), -sign)

    cost_agg = jnp.moveaxis(agg, -1, 0)  # [D, H, W]
    disp, c0, best = _wta_subpixel(cost_agg, cfg.min_disparity)
    valid = _uniqueness_mask(cost_agg, best, c0, cfg.uniqueness_ratio)
    if cfg.disp_12_max_diff >= 0:
        valid &= _lr_consistency_mask(cost_agg, best, cfg.min_disparity,
                                      cfg.disp_12_max_diff)
    valid &= mask & jnp.any(border, axis=0)
    valid = apply_speckle_filter(disp, valid, cfg)
    return jnp.where(valid, disp, INVALID_DISPARITY)
