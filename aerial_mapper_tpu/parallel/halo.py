"""Halo exchange for row-band-sharded rasters.

The DSM's IDW window reads up to ``halo`` rows beyond a tile boundary
(SURVEY.md §7.3 "Halo correctness"); when map row-bands live on different
devices those rows come from the neighbors. This is the ``ppermute``
neighbor exchange the scaling plan calls for (SURVEY.md §2.3): each device
sends its top ``halo`` rows to the previous device and its bottom ``halo``
rows to the next, so every local band becomes [halo + band + halo].

Used inside ``shard_map`` bodies where the named axis is in scope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange_rows(local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """[band, W, ...] -> [halo + band + halo, W, ...] with neighbor rows.

    Edge devices receive zero padding on the outer side (map boundary).
    General LAYER-halo utility; the production routed map step uses
    ``halo_exchange_extended`` below, which overwrites the strips of an
    already-extended band (needed because edge tiles bin their own
    out-of-map halo content that must NOT be zeroed).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    # send top rows to previous neighbor -> received as bottom halo there
    top = local[:halo]
    bottom = local[-halo:]
    # perm: device i sends to i-1 (top rows) / i+1 (bottom rows)
    send_up = [(i, i - 1) for i in range(1, n)]
    send_down = [(i, i + 1) for i in range(n - 1)]
    from_below = jax.lax.ppermute(top, axis_name, send_up)  # rows below my band
    from_above = jax.lax.ppermute(bottom, axis_name, send_down)

    zeros = jnp.zeros_like(local[:halo])
    upper = jnp.where(idx > 0, from_above, zeros)
    lower = jnp.where(idx < n - 1, from_below, zeros)
    return jnp.concatenate([upper, local, lower], axis=0)


def halo_exchange_extended(ext: jax.Array, halo: int, axis_name: str,
                           axis: int = 0) -> jax.Array:
    """Overwrite the halo strips of an ALREADY-extended array with the
    neighbors' adjacent band rows.

    ``ext`` has ``halo + band + halo`` rows along ``axis``; rows
    [halo, halo+band) are this tile's own band content, and the outer
    strips are only meaningful on edge tiles (e.g. the out-of-map halo an
    edge tile binned itself). Interior strips are replaced by the
    neighbor's adjacent BAND rows: the top strip becomes the previous
    tile's last ``halo`` band rows, the bottom strip the next tile's
    first ``halo`` band rows; edge tiles keep their own strips.

    This is how the owner-tile-routed map step (parallel/sharded.py)
    completes each band's binned-point structure: each tile bins only the
    points routed to it, then trades [K, halo, W]-strip slices of the bin
    arrays over ICI instead of re-binning a replicated cloud.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    x = jnp.moveaxis(ext, axis, 0)
    band = x.shape[0] - 2 * halo

    top_band = x[halo: 2 * halo]  # my first band rows
    bottom_band = x[band: band + halo]  # my last band rows
    send_up = [(i, i - 1) for i in range(1, n)]
    send_down = [(i, i + 1) for i in range(n - 1)]
    from_below = jax.lax.ppermute(top_band, axis_name, send_up)
    from_above = jax.lax.ppermute(bottom_band, axis_name, send_down)

    upper = jnp.where(idx > 0, from_above, x[:halo])
    lower = jnp.where(idx < n - 1, from_below, x[band + halo:])
    out = jnp.concatenate([upper, x[halo: band + halo], lower], axis=0)
    return jnp.moveaxis(out, 0, axis)
