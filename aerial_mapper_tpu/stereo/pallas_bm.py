"""Fused Pallas block-matching kernel: cost volume never touches HBM.

The XLA BM path (stereo/matching.py) materializes the [D, H, W] SAD cost
volume (~92 MB at 752x480x64) several times; at HBM bandwidth that caps the
matcher around 10-15 ms/pair. This kernel streams over disparities inside
VMEM: for each row tile it keeps the left/right strips resident, loops d
with a running (best, argbest, neighbor-costs, runner-up) state, and writes
only [H, W]-shaped outputs — HBM traffic collapses to reading the two
images once and writing five maps.

Per-d work inside the kernel: absolute difference of the left strip against
the right strip shifted by d (a static-size dynamic slice of a D-padded
strip), then a separable box sum via cumulative sums — all VPU ops on
[tile_h, W]-shaped blocks.

Semantics vs the XLA path: identical border masking, WTA tie-break,
parabolic sub-pixel (same interior-index gate and _BIG neighbor
sentinels), texture threshold, and speckle filter — bit-identical
disparities wherever BOTH paths accept a pixel, and bit-identical
rasters end-to-end under ``uniqueness_ratio<0`` + ``disp_12_max_diff<0``
(asserted by tests/test_pallas_bm.py and the dryrun matcher-family flip).
Two documented deviations in the ACCEPTANCE set only: the uniqueness
runner-up is a *running* minimum over costs farther than +-1 from the
argmin at insertion time, which can only under-estimate the true
runner-up (strictly more conservative rejection), and the left-right
check is not applied (it needs the full cost volume this kernel exists
to avoid; ``disp_12_max_diff`` is ignored).

``block_matching_disparity_pallas`` reuses the XLA implementation's
prefilter and post-filters, so it is a drop-in alternative to
``block_matching_disparity`` — production-selectable via
``BlockMatchingConfig.kernel = "pallas"`` (dispatched in
stereo/batched.py); set ``interpret=True`` to run it on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aerial_mapper_tpu.config import BlockMatchingConfig
from aerial_mapper_tpu.stereo.matching import (
    INVALID_DISPARITY,
    _box_filter,
    apply_speckle_filter,
    _xsobel_prefilter,
    use_integer_costs,
)

_BIG = 1.0e9


def _bm_kernel(lf_ref, rf_ref, out_disp, out_c0, out_cm, out_cp,
               out_runner, *, num_disp, min_disp, block, tile_h, width):
    """One row tile. Strip refs: [1, tile_h + 2r, W + lpad + 2r] with
    lpad = num_disp - 1 + min_disp columns of shift headroom on the left."""
    r = block // 2
    lpad = num_disp - 1 + min_disp

    # the left image's REAL columns (strip rows carry the vertical edge
    # halo; vertical image-edge replication commutes with the rowwise AD,
    # so it reproduces the XLA path's AD row replication for free)
    ls = lf_ref[0, :, pl.ds(lpad + r, width)]  # [tile_h + 2r, W]
    # column iotas: AD-level (strip rows) and cost-level (tile rows). A
    # candidate d exists at column u only when the shifted right pixel
    # u - (min_disp + d) is a real pixel — the XLA _border_mask rule.
    u_ad = jax.lax.broadcasted_iota(jnp.float32, (tile_h + 2 * r, width), 1)
    u_col = jax.lax.broadcasted_iota(jnp.float32, (tile_h, width), 1)

    def boxsum(ad):
        # separable (2r+1)^2 window sum as unrolled shifted adds (cumsum
        # has no Pallas TPU lowering; 2*(2r+1) VPU adds per element)
        rows = ad[0:tile_h, :]
        for o in range(1, 2 * r + 1):
            rows = rows + ad[o:o + tile_h, :]
        cost = rows[:, 0:width]
        for o in range(1, 2 * r + 1):
            cost = cost + rows[:, o:o + width]
        return cost  # [tile_h, W]

    state_shape = (tile_h, width)

    def body(d, carry):
        best, bestd, cm, cp, prev_cost, runner = carry
        # right image aligned to left columns: rs[:, u] = rf[u - min_disp - d]
        rs = rf_ref[0, :, pl.ds(num_disp - 1 - d + r, width)]
        # XLA-exact absolute differences: out-of-range shifts are 0-filled
        # (_shifted_right fill=0 -> ad = |lf - 0| = lf, prefilter output is
        # nonnegative), then the AD — not the images — is edge-replicated
        # horizontally before the window sum (matching _box_filter's edge
        # padding), so window sums are bit-identical to the XLA cost
        # volume at every column including the borders.
        ad = jnp.where(u_ad >= (d + min_disp), jnp.abs(ls - rs), ls)
        ad = jnp.concatenate(
            [jnp.broadcast_to(ad[:, :1], (tile_h + 2 * r, r)), ad,
             jnp.broadcast_to(ad[:, -1:], (tile_h + 2 * r, r))], axis=1,
        )
        cost = boxsum(ad)
        cost = jnp.where(u_col >= (d + min_disp), cost, _BIG)

        is_better = cost < best
        # running runner-up outside +-1 of the argmin at insertion time
        runner = jnp.where(
            is_better,
            jnp.minimum(runner, jnp.where(jnp.abs(bestd - d) > 1, best,
                                          _BIG)),
            jnp.minimum(runner, jnp.where(jnp.abs(d - bestd) > 1, cost,
                                          _BIG)),
        )
        cp = jnp.where(d == bestd + 1, cost, cp)
        cm = jnp.where(is_better, prev_cost, cm)
        bestd = jnp.where(is_better, d, bestd)
        best = jnp.minimum(best, cost)
        return best, bestd, cm, cp, cost, runner

    init = (
        jnp.full(state_shape, _BIG),
        jnp.full(state_shape, -2, jnp.int32),
        jnp.full(state_shape, _BIG),
        jnp.full(state_shape, _BIG),
        jnp.full(state_shape, _BIG),
        jnp.full(state_shape, _BIG),
    )
    best, bestd, cm, cp, _, runner = jax.lax.fori_loop(
        0, num_disp, body, init
    )

    out_disp[:] = bestd.astype(jnp.float32) + min_disp
    out_c0[:] = best
    out_cm[:] = cm
    out_cp[:] = cp
    out_runner[:] = runner


@partial(jax.jit, static_argnames=("cfg", "tile_h", "interpret"))
def block_matching_disparity_pallas(
    left: jax.Array,
    right: jax.Array,
    mask: jax.Array,
    cfg: BlockMatchingConfig,
    tile_h: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused-kernel alternative to ``block_matching_disparity``."""
    h, w = left.shape
    d_num = cfg.num_disparities
    block = cfg.block_size
    r = block // 2
    pad_h = (-h) % tile_h
    lpad = d_num - 1 + cfg.min_disparity

    left_f = left.astype(jnp.float32)
    right_f = right.astype(jnp.float32)
    if use_integer_costs(cfg):
        # match the XLA matcher's cv-faithful quantization (the SAME
        # guard, so a config that overflows int16 skips quantization in
        # both paths): integer-valued images -> integer SADs, so the two
        # paths' winners and sub-pixel offsets agree exactly (the VMEM
        # kernel keeps float math; the values are integers)
        left_f = jnp.round(left_f)
        right_f = jnp.round(right_f)
    lf = _xsobel_prefilter(left_f, cfg.pre_filter_cap)
    rf = _xsobel_prefilter(right_f, cfg.pre_filter_cap)

    lf_p = jnp.pad(lf, ((r, r + pad_h), (lpad + r, r)), mode="edge")
    rf_p = jnp.pad(rf, ((r, r + pad_h), (lpad + r, r)), mode="edge")

    n_tiles = (h + pad_h) // tile_h
    strip_w = w + lpad + 2 * r
    # overlapping row strips (tile + halo) pre-sliced into a leading tile
    # axis: BlockSpec blocks are disjoint, so halos are materialized here
    # (n_tiles x strip is a few MB — negligible next to the cost volume
    # this kernel avoids)
    strips_l = jnp.stack(
        [jax.lax.dynamic_slice(lf_p, (i * tile_h, 0),
                               (tile_h + 2 * r, strip_w))
         for i in range(n_tiles)]
    )
    strips_r = jnp.stack(
        [jax.lax.dynamic_slice(rf_p, (i * tile_h, 0),
                               (tile_h + 2 * r, strip_w))
         for i in range(n_tiles)]
    )

    kernel = partial(
        _bm_kernel, num_disp=d_num, min_disp=cfg.min_disparity,
        block=block, tile_h=tile_h, width=w,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile_h + 2 * r, strip_w),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        out_specs=[
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=[jax.ShapeDtypeStruct((h + pad_h, w), jnp.float32)
                   for _ in range(5)],
        interpret=interpret,
    )(strips_l, strips_r)

    disp_i, c0, cm, cp, runner = [o[:h] for o in outs]

    # sub-pixel refinement (matching matching.py::_wta_subpixel): the
    # parabolic delta applies only at interior winner INDICES, exactly the
    # XLA path's gate — masked-neighbor costs already carry the same _BIG
    # sentinel as the XLA volume, so delta values agree bit-for-bit.
    denom = cm - 2.0 * c0 + cp
    delta = jnp.where(jnp.abs(denom) > 1e-9, (cm - cp) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    best_idx = disp_i - cfg.min_disparity  # integer winner index as float
    interior = (best_idx > 0.0) & (best_idx < d_num - 1.0)
    disp = disp_i + jnp.where(interior, delta, 0.0)

    if cfg.uniqueness_ratio < 0:
        valid = jnp.ones((h, w), bool)
    elif use_integer_costs(cfg):
        # cv integer threshold (values are exact integers in float32):
        # thresh = c0 + c0*ratio//100, equality rejects
        thresh = jnp.floor(c0 * (100 + cfg.uniqueness_ratio) / 100.0)
        valid = runner > thresh
    else:
        valid = runner > c0 * (1.0 + cfg.uniqueness_ratio / 100.0)
    texture = _box_filter(jnp.abs(lf - cfg.pre_filter_cap), block)
    valid &= texture >= cfg.texture_threshold  # raw sum, like cv (and XLA)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    valid &= u >= cfg.min_disparity  # some candidate exists (= any(border))
    valid &= mask
    valid = apply_speckle_filter(disp, valid, cfg)
    return jnp.where(valid, disp, INVALID_DISPARITY)
