"""Ortho backend A: backward-grid projective texturing with best-angle reduce.

TPU-native rendition of ``ortho::OrthoBackwardGrid``
(``aerial_mapper_ortho/src/ortho-backward-grid.cc:42-239``) — the dominant
cost of the reference system (SURVEY.md §3.3: O(cells x images) nested scalar
loops). Here each chunk of map cells is projected into *all* cameras at once
(one batched rotate+project), the observation-angle score

    alpha = asin(|z_c| / ||p_c||)        (ortho-backward-grid.cc:83-87)

is computed for every (cell, camera), and a masked argmax over the camera
axis picks the most-nadir visible observation. ``argmax`` takes the first
maximum, matching the reference's sequential strict-``>`` update order
(ortho-backward-grid.cc:90), which is what makes incremental updates
idempotent and order-independent.

Cells are processed in ``cfg.cell_chunk``-sized chunks via ``lax.map`` so the
[num_images x chunk] intermediates stay HBM-resident and bounded regardless
of map size; the chunk dimension is a natural tile-shard axis for multi-chip
runs (see aerial_mapper_tpu.parallel).

Deliberate deviations (SURVEY.md "parity quirks"):
- ``num_observations`` counts actual visible observations; the reference's
  ``x += x`` no-op (ortho-backward-grid.cc:93) stays 0 forever.
- pixel lookup is nearest-neighbor with clamp like the reference
  (ortho-backward-grid.cc:100-103).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aerial_mapper_tpu.camera.models import Camera, project
from aerial_mapper_tpu.config import OrthoBackwardGridConfig
from aerial_mapper_tpu.geo.se3 import quat_rotate
from aerial_mapper_tpu.image.color import pack_rgb_to_float
from aerial_mapper_tpu.mapgrid.grid import MapGeometry


def _project_cells_all_cameras(cells, quats, ts, cam: Camera):
    """cells [T, 3], quats [N, 4] (camera-to-world), ts [N, 3] ->
    (uv [N, T, 2], visible [N, T], alpha [N, T])."""
    # p_c = R^T (p - t) = rotate by conjugate quaternion
    conj = quats * jnp.array([1.0, -1.0, -1.0, -1.0], quats.dtype)
    rel = cells[None, :, :] - ts[:, None, :]  # [N, T, 3]
    p_c = quat_rotate(conj[:, None, :], rel)  # [N, T, 3]
    uv, visible = project(cam, p_c)
    norm = jnp.linalg.norm(p_c, axis=-1)
    alpha = jnp.arcsin(
        jnp.abs(p_c[..., 2]) / jnp.maximum(norm, 1e-9)
    )
    return uv, visible, alpha, p_c


@partial(jax.jit, static_argnames=("geom", "cam", "cfg"))
def backward_grid_update(
    layers: dict,
    quats_G_C: jax.Array,  # [N, 4] wxyz camera-to-world
    t_G_C: jax.Array,  # [N, 3]
    images: jax.Array,  # [N, H, W] gray or [N, H, W, 3] rgb (0..255)
    geom: MapGeometry,
    cam: Camera,
    cfg: OrthoBackwardGridConfig,
    row_offset=0,
) -> dict:
    """One batch/incremental backward-grid pass over all map cells.

    Updates ``ortho``/``colored_ortho``, ``elevation_angle``,
    ``observation_index``, ``num_observations`` exactly where a strictly
    better (more nadir) observation exists — replaying
    ``updateOrthomosaicLayer`` (ortho-backward-grid.cc:56-121) semantics, so
    calling it again with another image batch implements the incremental mode
    (main-ortho-backward-grid-incremental.cc:143-166).
    """
    h, w = layers["elevation_angle"].shape
    colored = cfg.colored_ortho
    num_cells = h * w
    chunk = min(cfg.cell_chunk, num_cells)
    # pad cells to a multiple of chunk
    num_chunks = -(-num_cells // chunk)
    pad = num_chunks * chunk - num_cells

    # cell centers for this (possibly row-band-sharded) slab: the layer
    # arrays may be a row band starting at global row ``row_offset``
    # (aerial_mapper_tpu.parallel tile sharding)
    i = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + row_offset
    j = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ce = geom.west + (j + 0.5) * geom.resolution
    cn = geom.north - (i + 0.5) * geom.resolution
    if cfg.use_digital_elevation_map:
        elev = layers["elevation"]
    else:
        elev = jnp.full((h, w), cfg.orthomosaic_elevation_m,
                        layers["elevation"].dtype)
    cells = jnp.stack([ce.ravel(), cn.ravel(), elev.ravel()], axis=-1)
    prev_angle = layers["elevation_angle"].ravel()

    cells_p = jnp.pad(cells, ((0, pad), (0, 0)))
    prev_angle_p = jnp.pad(prev_angle, (0, pad))
    cells_c = cells_p.reshape(num_chunks, chunk, 3)
    prev_c = prev_angle_p.reshape(num_chunks, chunk)

    img_h, img_w = images.shape[1], images.shape[2]

    def process_chunk(args):
        cell_chunk, prev_alpha = args
        uv, visible, alpha, _ = _project_cells_all_cameras(
            cell_chunk, quats_G_C, t_G_C, cam
        )
        # NaN elevation cells never project validly (isfinite in `project`)
        alpha_m = jnp.where(visible, alpha, -jnp.inf)
        best = jnp.argmax(alpha_m, axis=0)  # [T] first-max index
        t_idx = jnp.arange(cell_chunk.shape[0])
        best_alpha = alpha_m[best, t_idx]
        best_uv = uv[best, t_idx]  # [T, 2]

        kp_x = jnp.clip(jnp.round(best_uv[..., 0]).astype(jnp.int32), 0,
                        img_w - 1)
        kp_y = jnp.clip(jnp.round(best_uv[..., 1]).astype(jnp.int32), 0,
                        img_h - 1)
        texel = images[best, kp_y, kp_x]  # [T] or [T, 3]
        if colored:
            value = pack_rgb_to_float(texel.astype(jnp.float32) / 255.0)
        else:
            value = texel.astype(jnp.float32)

        improved = (best_alpha > prev_alpha) & jnp.isfinite(best_alpha)
        n_obs = jnp.sum(visible, axis=0).astype(jnp.float32)
        return (
            value,
            best_alpha,
            best.astype(jnp.float32),
            improved,
            n_obs,
        )

    value, best_alpha, best_idx, improved, n_obs = jax.lax.map(
        process_chunk, (cells_c, prev_c)
    )

    def unpad(x):
        return x.reshape(num_chunks * chunk)[:num_cells].reshape(h, w)

    value = unpad(value)
    best_alpha = unpad(best_alpha)
    best_idx = unpad(best_idx)
    improved = unpad(improved)
    n_obs = unpad(n_obs)

    new = dict(layers)
    target = "colored_ortho" if colored else "ortho"
    new[target] = jnp.where(improved, value, layers[target])
    new["elevation_angle"] = jnp.where(
        improved, best_alpha, layers["elevation_angle"]
    )
    new["observation_index"] = jnp.where(
        improved, best_idx, layers["observation_index"]
    )
    new["num_observations"] = layers["num_observations"] + n_obs
    return new
