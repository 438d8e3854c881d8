"""Self-contained HTML run reports — the rviz-replacement visual surface.

The reference's observability is ROS topics rendered by rviz
(aerial-mapper-grid-map.cc:51-72, ortho-forward-homography.cc:210-228,
demos/rviz/*.rviz). This framework replaces that with file artifacts; the
HTML report bundles them into one shareable page: every populated map layer
rendered to an embedded PNG (orthomosaic in gray/RGB, elevation with a
false-color palette plus a Lambertian hillshade, angle/count/index layers
false-colored), per-layer statistics, the map geometry, the config banner,
and the stage timing table.

Host-side only (NumPy + PIL); never on the compute path.
"""

from __future__ import annotations

import base64
import html
import io as _io
from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from aerial_mapper_tpu.mapgrid.grid import MapGeometry
from aerial_mapper_tpu.utils.palettes import apply_palette

# Rendering recipe per known layer name (mapgrid.grid's 9 reference layers,
# aerial-mapper-grid-map.cc:25-28). Unknown layers fall back to false color.
_LAYER_KIND = {
    "ortho": "gray",
    "colored_ortho": "packed_rgb",
    "elevation": "elevation",
    "elevation_angle": "false",
    "elevation_angle_first_view": "false",
    "num_observations": "false",
    "observation_index": "false",
    "observation_index_first": "false",
    "delta": "false",
}


def _png_bytes(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


def _data_uri(rgb: np.ndarray) -> str:
    return "data:image/png;base64," + base64.b64encode(
        _png_bytes(rgb)
    ).decode("ascii")


def hillshade(elevation: np.ndarray, resolution: float,
              azimuth_deg: float = 315.0,
              altitude_deg: float = 45.0) -> np.ndarray:
    """Lambertian hillshade of an elevation raster, [H, W] in [0, 1].

    NaN cells shade flat (0.5). Standard GIS convention: light from the
    north-west, 45 degrees up.
    """
    elev = np.asarray(elevation, np.float64)
    filled = np.where(np.isfinite(elev), elev,
                      np.nanmean(elev) if np.isfinite(elev).any() else 0.0)
    # rows run north->south: d/dnorthing = -d/drow
    dz_dn, dz_de = np.gradient(filled, -resolution, resolution)
    az = np.deg2rad(azimuth_deg)
    alt = np.deg2rad(altitude_deg)
    # surface normal (-dz/de, -dz/dn, 1)/|.|  dotted with the sun direction
    sun = np.array([np.cos(alt) * np.sin(az), np.cos(alt) * np.cos(az),
                    np.sin(alt)])
    norm = np.sqrt(dz_de**2 + dz_dn**2 + 1.0)
    shade = (-dz_de * sun[0] - dz_dn * sun[1] + sun[2]) / norm
    shade = np.clip(shade, 0.0, 1.0)
    shade[~np.isfinite(elev)] = 0.5
    return shade


def render_layer(name: str, layer: np.ndarray,
                 geom: MapGeometry) -> Optional[np.ndarray]:
    """Render one layer to [H, W, 3] uint8 RGB, or None if empty/constant."""
    arr = np.asarray(layer)
    finite = np.isfinite(arr)
    if not finite.any():
        return None
    kind = _LAYER_KIND.get(name, "false")
    if kind == "gray":
        rgb8 = np.clip(np.where(finite, arr, 255.0), 0, 255).astype(np.uint8)
        return np.repeat(rgb8[..., None], 3, axis=-1)
    if kind == "packed_rgb":
        from aerial_mapper_tpu.image.color import unpack_float_to_rgb

        rgb01 = np.asarray(unpack_float_to_rgb(arr.astype(np.float32)))
        rgb8 = np.round(rgb01 * 255.0).astype(np.uint8)
        return np.where(finite[..., None], rgb8, np.uint8(255))
    if kind == "elevation":
        color = apply_palette(arr, "false_color_jet",
                              nan_color=(255, 255, 255)).astype(np.float64)
        shade = hillshade(arr, geom.resolution)[..., None]
        return np.clip(color * (0.35 + 0.65 * shade), 0,
                       255).astype(np.uint8)
    lo, hi = np.nanmin(arr), np.nanmax(arr)
    if not np.isfinite(lo) or hi - lo < 1e-12:
        return None  # constant layer — nothing to show
    return apply_palette(arr, "false_color_jet", nan_color=(255, 255, 255))


def _stats_row(name: str, layer: np.ndarray) -> str:
    arr = np.asarray(layer, np.float64)
    finite = np.isfinite(arr)
    cov = float(finite.mean())
    if finite.any():
        lo, hi = float(np.nanmin(arr)), float(np.nanmax(arr))
        mean = float(np.nanmean(arr))
        vals = f"{lo:.3g}</td><td>{hi:.3g}</td><td>{mean:.3g}"
    else:
        vals = "—</td><td>—</td><td>—"
    return (f"<tr><td>{html.escape(name)}</td><td>{cov:.1%}</td>"
            f"<td>{vals}</td></tr>")


_STYLE = """
body { font-family: system-ui, sans-serif; margin: 2em; color: #222; }
h1 { font-size: 1.4em; } h2 { font-size: 1.1em; margin-top: 1.6em; }
table { border-collapse: collapse; margin: 0.5em 0; }
td, th { border: 1px solid #ccc; padding: 0.25em 0.7em; text-align: left;
         font-size: 0.9em; }
th { background: #f2f2f2; }
.layers { display: flex; flex-wrap: wrap; gap: 1.2em; }
.layer { max-width: 460px; }
.layer img { width: 100%; image-rendering: pixelated; border: 1px solid #999; }
.layer figcaption { font-size: 0.85em; color: #555; margin-top: 0.2em; }
pre { background: #f7f7f7; padding: 0.6em; font-size: 0.85em; }
"""


def write_html_report(
    path: str,
    layers: Mapping[str, np.ndarray],
    geom: MapGeometry,
    title: str = "aerial_mapper_tpu run report",
    config_banner: Optional[str] = None,
    timings: Optional[Mapping[str, float]] = None,
    extra_images: Optional[Sequence[Tuple[str, np.ndarray]]] = None,
) -> None:
    """Write a single self-contained HTML page for this run.

    ``layers``: the MapState layer dict (device or NumPy arrays).
    ``extra_images``: optional (caption, [H, W] gray or [H, W, 3] RGB uint8ish)
    panels, e.g. a homography mosaic or rectification debug panel.
    """
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>{html.escape(title)}</title>",
        f"<style>{_STYLE}</style></head><body>",
        f"<h1>{html.escape(title)}</h1>",
        "<h2>Map geometry</h2><table>",
        "<tr><th>center E, N</th><th>resolution</th><th>cells (H×W)</th>"
        "<th>extent</th><th>west</th><th>north</th></tr>",
        f"<tr><td>{geom.center_easting:.2f}, {geom.center_northing:.2f}</td>"
        f"<td>{geom.resolution} m</td><td>{geom.height}×{geom.width}</td>"
        f"<td>{geom.height * geom.resolution:.0f}×"
        f"{geom.width * geom.resolution:.0f} m</td>"
        f"<td>{geom.west:.2f}</td><td>{geom.north:.2f}</td></tr></table>",
    ]

    stats: Dict[str, str] = {}
    figures = []
    for name, layer in layers.items():
        arr = np.asarray(layer)
        stats[name] = _stats_row(name, arr)
        rgb = render_layer(name, arr, geom)
        if rgb is not None:
            figures.append(
                f"<figure class='layer'><img src='{_data_uri(rgb)}'>"
                f"<figcaption>{html.escape(name)}</figcaption></figure>"
            )
    for caption, img in extra_images or ():
        arr = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        figures.append(
            f"<figure class='layer'><img src='{_data_uri(arr)}'>"
            f"<figcaption>{html.escape(caption)}</figcaption></figure>"
        )

    parts.append("<h2>Layers</h2><div class='layers'>")
    parts.extend(figures)
    parts.append("</div>")

    parts.append(
        "<h2>Layer statistics</h2><table><tr><th>layer</th>"
        "<th>coverage</th><th>min</th><th>max</th><th>mean</th></tr>"
    )
    parts.extend(stats.values())
    parts.append("</table>")

    if timings:
        parts.append("<h2>Stage timings</h2><table>"
                     "<tr><th>stage</th><th>seconds</th></tr>")
        for name, dt in timings.items():
            parts.append(f"<tr><td>{html.escape(name)}</td>"
                         f"<td>{dt:.4f}</td></tr>")
        parts.append("</table>")

    if config_banner:
        parts.append("<h2>Configuration</h2><pre>"
                     f"{html.escape(config_banner)}</pre>")

    parts.append("</body></html>")
    with open(path, "w") as f:
        f.write("\n".join(parts))
