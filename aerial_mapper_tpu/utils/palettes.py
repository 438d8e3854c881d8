"""Color palettes for elevation-map / layer visualization.

Replaces ``aerial_mapper_utils/include/aerial-mapper-utils/
utils-color-palette.h`` (10 palette types, 256-entry LUTs). Implemented as
vectorized LUT builders; ``apply_palette`` maps a float layer to RGB for
PNG dumps (the framework's substitute for the reference's rviz coloring).
"""

from __future__ import annotations

import numpy as np

PALETTES = (
    "gray",
    "inverted_gray",
    "gamma_log",
    "inverted_gamma_log",
    "false_color_jet",
    "false_color_hot",
    "blue_red",
    "terrain",
    "viridis_like",
    "red_green",
)


def get_palette(name: str = "false_color_jet") -> np.ndarray:
    """Return a [256, 3] uint8 LUT."""
    x = np.linspace(0.0, 1.0, 256)
    if name == "gray":
        r = g = b = x
    elif name == "inverted_gray":
        r = g = b = 1.0 - x
    elif name == "gamma_log":
        v = np.log1p(9.0 * x) / np.log(10.0)
        r = g = b = v
    elif name == "inverted_gamma_log":
        v = 1.0 - np.log1p(9.0 * x) / np.log(10.0)
        r = g = b = v
    elif name == "false_color_jet":
        r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
        g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
        b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    elif name == "false_color_hot":
        r = np.clip(3.0 * x, 0, 1)
        g = np.clip(3.0 * x - 1.0, 0, 1)
        b = np.clip(3.0 * x - 2.0, 0, 1)
    elif name == "blue_red":
        r, g, b = x, np.zeros_like(x), 1.0 - x
    elif name == "terrain":
        r = np.clip(0.2 + 1.2 * x, 0, 1)
        g = np.clip(0.5 + 0.5 * np.sin(3.1415 * x), 0, 1)
        b = np.clip(0.3 - 0.2 * x + 0.7 * np.maximum(x - 0.8, 0) * 5, 0, 1)
    elif name == "viridis_like":
        r = np.clip(-0.3 + 1.5 * x * x, 0, 1) + 0.27 * (1 - x)
        g = np.clip(0.004 + 0.9 * x, 0, 1)
        b = np.clip(0.33 + 0.5 * np.sin(3.1415 * (1 - x) * 0.75), 0, 1)
        r = np.clip(r, 0, 1)
    elif name == "red_green":
        r, g, b = 1.0 - x, x, np.zeros_like(x)
    else:
        raise ValueError(f"Unknown palette {name!r}; options: {PALETTES}")
    return (np.stack([r, g, b], axis=1) * 255).astype(np.uint8)


def apply_palette(layer: np.ndarray, name: str = "false_color_jet",
                  vmin=None, vmax=None, nan_color=(0, 0, 0)) -> np.ndarray:
    """Map a float [H, W] layer to [H, W, 3] uint8 RGB (NaN -> nan_color)."""
    lut = get_palette(name)
    arr = np.asarray(layer, dtype=np.float64)
    finite = np.isfinite(arr)
    lo = np.nanmin(arr) if vmin is None else vmin
    hi = np.nanmax(arr) if vmax is None else vmax
    span = max(hi - lo, 1e-12)
    scaled = np.where(finite, (arr - lo) / span * 255.0, 0.0)
    idx = np.clip(scaled, 0, 255).astype(np.int32)
    rgb = lut[idx]
    rgb[~finite] = np.asarray(nan_color, np.uint8)
    return rgb
