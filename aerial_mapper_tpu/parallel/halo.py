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
