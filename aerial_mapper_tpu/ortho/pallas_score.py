"""Fused Pallas score pass for backward-grid ortho: zero [T, N] HBM traffic.

The XLA score pass (ortho/backward_grid.py::_score_pass) materializes
[num_images, num_cells]-shaped intermediates several times; at HBM bandwidth
that holds the 400x400x249 pass at ~4 ms on a v5e even though the arithmetic
is ~1.6 GFLOP. This kernel tiles the cell axis over the Pallas grid and keeps
the whole camera bank (rotation rows + projected offsets, [16, N_pad] floats)
resident in VMEM: each tile computes its [tile_t, N] camera-frame coordinates,
visibility and angle-ranking key entirely on the VPU and reduces them to three
[tile_t] outputs in one pass — HBM traffic collapses to reading the cells
once and writing the per-cell winner index / angle / count.

Semantics match ``_score_pass`` (ortho-backward-grid.cc:66-90 behavior)
op-for-op: the same safe-z division, bounds test, monotone ranking key
q = z^2/||p||^2 and first-max reduction, so winner selection (including
near-tie rounding) mirrors the XLA path; the only residual divergence is FMA
ordering in the 3-term rotation (broadcast multiply-adds here vs dot_general
there).
Pinhole cameras only (``DIST_NONE``); the general XLA path stays the
default.

Like stereo/pallas_bm.py, this kernel cannot be compiled through the axon
remote-compile tunnel (its chipless AOT compiler fails libtpu init), so it is
validated in interpret mode on CPU and shipped as the production-TPU path;
``backward_grid.py`` remains the portable default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aerial_mapper_tpu.camera.models import DIST_NONE, Camera

_LANES = 128


def _score_kernel(cells_ref, cams_ref, out_best, out_q, out_u, out_v,
                  out_nvis, *, tile_t: int, n_pad: int, fx, fy, cx, cy,
                  width, height):
    """One cell tile vs the full camera bank.

    cells_ref: [tile_t, 8]  (easting, northing, elevation, 5 pad lanes)
    cams_ref:  [16, n_pad]  rows 0..8 = R_cw row-major, rows 9..11 = R_cw @ t
    outputs:   [1, tile_t]  winner index (f32), ranking key q, winner pixel
               (u, v), visible count
    """
    ce = cells_ref[:, 0:1]  # [tile_t, 1]
    cn = cells_ref[:, 1:2]
    el = cells_ref[:, 2:3]

    r = cams_ref[:, :]  # [16, n_pad]
    x = ce * r[0:1, :] + cn * r[1:2, :] + el * r[2:3, :] - r[9:10, :]
    y = ce * r[3:4, :] + cn * r[4:5, :] + el * r[5:6, :] - r[10:11, :]
    z = ce * r[6:7, :] + cn * r[7:8, :] + el * r[8:9, :] - r[11:12, :]

    # op-for-op the same arithmetic as backward_grid._score_pass, so winner
    # selection (incl. near-tie rounding) is identical to the XLA path; the
    # only residual divergence is FMA ordering in the 3-term rotation.
    # Ranking key q = z^2/||p||^2 is strictly increasing in the reference's
    # alpha = asin(|z|/||p||) (ortho-backward-grid.cc:83-87); the exact angle
    # is recovered from the [tile_t] winner only.
    safe_z = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx * (x / safe_z) + cx
    v = fy * (y / safe_z) + cy
    vis = (
        (z > 1e-6)
        & (u >= 0.0) & (v >= 0.0)
        & (u < width) & (v < height)
        & jnp.isfinite(u) & jnp.isfinite(v)
    )
    q = (z * z) / jnp.maximum(x * x + y * y + z * z, 1e-18)
    qm = jnp.where(vis, q, -jnp.inf)  # [tile_t, n_pad]; padding
    # cameras have R = 0 -> z = 0 -> invisible -> -inf

    best = jnp.argmax(qm, axis=1)  # first max, matching the XLA path
    m = jnp.max(qm, axis=1)
    # winner payloads (pixel coordinates) via a masked one-hot reduction —
    # stays VMEM-resident, mirrors the XLA path's variadic-reduce payloads
    one_hot = (
        jax.lax.broadcasted_iota(jnp.int32, qm.shape, 1) == best[:, None]
    )
    bu = jnp.sum(jnp.where(one_hot, u, 0.0), axis=1)
    bv = jnp.sum(jnp.where(one_hot, v, 0.0), axis=1)
    nvis = jnp.sum(jnp.where(vis, 1.0, 0.0), axis=1)

    out_best[:] = best.astype(jnp.float32)[None, :]
    out_q[:] = m[None, :]
    out_u[:] = bu[None, :]
    out_v[:] = bv[None, :]
    out_nvis[:] = nvis[None, :]


@partial(jax.jit, static_argnames=("cam", "tile_t", "interpret"))
def score_pass_pallas(
    cells: jax.Array,  # [T, 3] (easting, northing, elevation)
    R_cw: jax.Array,  # [N, 3, 3] world->camera
    t_G_C: jax.Array,  # [N, 3] camera positions in world
    cam: Camera,
    tile_t: int = 512,
    interpret: bool = False,
):
    """Fused best-angle pass.

    Returns (best [T] int32, best_q [T], u [T], v [T], n_vis [T]) — a
    drop-in for the tuple produced by ``backward_grid._score_pass`` for
    undistorted cameras.
    """
    if cam.dist_kind != DIST_NONE:
        raise ValueError(
            "score_pass_pallas supports undistorted (pinhole) cameras only; "
            f"got dist_kind={cam.dist_kind!r}"
        )
    num_cells = cells.shape[0]
    n = R_cw.shape[0]
    n_pad = -(-n // _LANES) * _LANES
    pad_t = (-num_cells) % tile_t
    n_tiles = (num_cells + pad_t) // tile_t

    # camera bank: rows 0..8 R_cw row-major, rows 9..11 offs = R_cw @ t;
    # zero-padded cameras give z == 0 -> invisible inside the kernel
    offs = jnp.einsum("nij,nj->ni", R_cw, t_G_C)  # [N, 3]
    bank = jnp.concatenate(
        [R_cw.reshape(n, 9), offs], axis=1
    ).T  # [12, N]
    bank = jnp.pad(bank, ((0, 4), (0, n_pad - n)))  # [16, n_pad]

    cells_p = jnp.pad(cells, ((0, pad_t), (0, 5)))  # [T + pad, 8]

    kernel = partial(
        _score_kernel, tile_t=tile_t, n_pad=n_pad,
        fx=float(cam.fx), fy=float(cam.fy), cx=float(cam.cx),
        cy=float(cam.cy), width=float(cam.width), height=float(cam.height),
    )
    best_f, best_q, bu, bv, nvis = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_t, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_t), jnp.float32)
            for _ in range(5)
        ],
        interpret=interpret,
    )(cells_p, bank)

    def unpad(x):
        return x.reshape(-1)[:num_cells]

    return (unpad(best_f).astype(jnp.int32), unpad(best_q), unpad(bu),
            unpad(bv), unpad(nvis))
