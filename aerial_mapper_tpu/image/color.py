"""Color conversions and grid_map-style packed-RGB encoding.

``pack_rgb_to_float`` replicates ``grid_map::colorVectorToValue`` (used by
the colored backward-grid ortho, ``ortho-backward-grid.cc:104-112``): RGB in
[0, 1] is packed into the low 24 bits of an int and bit-cast to float32 so a
color fits in one raster layer cell.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ITU-R BT.601 luma weights — what cv::cvtColor(RGB2GRAY) uses
# (reference converts RGB inputs to gray at stereo.cpp:117-125).
_LUMA = (0.299, 0.587, 0.114)


def rgb_to_gray(image: jax.Array) -> jax.Array:
    """[..., 3] RGB -> [...] gray, BT.601 weights, dtype preserved as float."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    return _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b


def pack_rgb_to_float(rgb01: jax.Array) -> jax.Array:
    """[..., 3] RGB in [0,1] -> [...] float32 with RGB packed in 24 bits."""
    rgb255 = jnp.clip(jnp.round(rgb01 * 255.0), 0, 255).astype(jnp.uint32)
    packed = (
        (rgb255[..., 0] << 16) | (rgb255[..., 1] << 8) | rgb255[..., 2]
    )
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def unpack_float_to_rgb(value: jax.Array) -> jax.Array:
    """Inverse of pack_rgb_to_float -> [..., 3] RGB in [0,1]."""
    packed = jax.lax.bitcast_convert_type(value, jnp.uint32)
    r = (packed >> 16) & 0xFF
    g = (packed >> 8) & 0xFF
    b = packed & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.float32) / 255.0
