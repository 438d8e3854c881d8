"""Google static-maps client: satellite tile fetch + UTM/pixel transforms.

Replaces ``aerial_mapper_google_maps_api`` (``google-maps-api.cc:26-96``):
builds the static-map URL, fetches the tile (``requests`` instead of curl —
optional: construction works offline, only ``fetch_tile`` needs egress), and
provides the web-mercator meters-per-pixel and UTM<->tile-pixel transforms
used to overlay reconstruction output on a basemap.
"""

from __future__ import annotations

import io
import math
from typing import Optional, Tuple

import numpy as np

from aerial_mapper_tpu.geo import utm as utm_mod

_EARTH_RADIUS_M = 6378137.0
_BASE_URL = "https://maps.googleapis.com/maps/api/staticmap"


class GoogleMapsClient:
    def __init__(
        self,
        center_lat: float,
        center_lon: float,
        zoom: int = 18,
        width_px: int = 640,
        height_px: int = 640,
        maptype: str = "satellite",
        api_key: str = "",
    ):
        self.center_lat = center_lat
        self.center_lon = center_lon
        self.zoom = zoom
        self.width_px = width_px
        self.height_px = height_px
        self.maptype = maptype
        self.api_key = api_key

    # -- URL / fetch (google-maps-api.cc:26-48) ----------------------------
    def tile_url(self) -> str:
        url = (
            f"{_BASE_URL}?center={self.center_lat},{self.center_lon}"
            f"&zoom={self.zoom}&size={self.width_px}x{self.height_px}"
            f"&maptype={self.maptype}"
        )
        if self.api_key:
            url += f"&key={self.api_key}"
        return url

    def fetch_tile(self) -> Optional[np.ndarray]:
        """Download + decode the tile; returns [H, W, 3] uint8 or None when
        the network/key is unavailable (feature is optional, like the
        standalone reference demo)."""
        try:
            import requests
            from PIL import Image

            resp = requests.get(self.tile_url(), timeout=10)
            resp.raise_for_status()
            with Image.open(io.BytesIO(resp.content)) as img:
                return np.asarray(img.convert("RGB"))
        except Exception:
            return None

    # -- geometry (google-maps-api.cc:50-96) -------------------------------
    @property
    def meters_per_pixel(self) -> float:
        """Web-mercator ground resolution at the tile center."""
        return (
            2.0 * math.pi * _EARTH_RADIUS_M
            * math.cos(math.radians(self.center_lat))
            / (256.0 * 2.0 ** self.zoom)
        )

    def latlon_to_pixel(self, lat: float, lon: float) -> Tuple[float, float]:
        """Lat/lon -> (col, row) in the fetched tile via local UTM offsets."""
        e0, n0, zone, _ = utm_mod.ll_to_utm(self.center_lat, self.center_lon)
        e, n, _, _ = utm_mod.ll_to_utm(lat, lon, force_zone=zone)
        mpp = self.meters_per_pixel
        col = self.width_px / 2.0 + (float(e) - float(e0)) / mpp
        row = self.height_px / 2.0 - (float(n) - float(n0)) / mpp
        return col, row

    def pixel_to_utm(self, col: float, row: float) -> Tuple[float, float, int]:
        e0, n0, zone, _ = utm_mod.ll_to_utm(self.center_lat, self.center_lon)
        mpp = self.meters_per_pixel
        e = float(e0) + (col - self.width_px / 2.0) * mpp
        n = float(n0) - (row - self.height_px / 2.0) * mpp
        return e, n, zone
