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


# -- camera-ray ground intersections (google-maps-api.cc:65-96) -------------


def camera_pixel_to_utm(
    col: float,
    row: float,
    camera_northing: float,
    camera_easting: float,
    cruise_altitude: float,
    pixel_direction_pre: np.ndarray,
) -> Tuple[float, float]:
    """CAMERA-image pixel -> ground UTM by ray/ground-plane intersection
    (``GoogleMapsApi::pixelToUtm``, google-maps-api.cc:65-81).

    ``pixel_direction_pre`` is the 3x3 pixel-to-direction matrix (the
    reference precomposes K^-1 with the camera attitude). Reference
    conventions reproduced exactly: direction components map to
    (northing, -easting, down); a ray that does not descend toward the
    ground (lambda <= 0) returns (0, 0) like cc:76-80.
    Returns (northing, easting)."""
    direction = np.asarray(pixel_direction_pre, float) @ np.array(
        [col, row, 1.0]
    )
    if direction[2] == 0.0:
        raise ValueError("GPS coordinates indeterminant (direction z = 0)")
    lam = (-cruise_altitude) / direction[2]
    northing = lam * direction[0] + camera_northing
    easting = -lam * direction[1] + camera_easting
    if lam > 0:
        return northing, easting
    return 0.0, 0.0


def camera_utm_to_pixel(
    northing: float,
    easting: float,
    camera_northing: float,
    camera_easting: float,
    cruise_altitude: float,
    pixel_direction_pre_inverse: np.ndarray,
) -> Tuple[int, int]:
    """Ground UTM -> CAMERA-image pixel, the inverse projective map
    (``GoogleMapsApi::utmToPixel``, google-maps-api.cc:83-96): the
    homogeneous pre-image of the scaled direction (n - n_cam,
    e_cam - e, -altitude), truncated to int like the reference."""
    lambda_d = np.array(
        [northing - camera_northing, camera_easting - easting,
         -cruise_altitude]
    )
    pixel = np.asarray(pixel_direction_pre_inverse, float) @ lambda_d
    if pixel[2] == 0.0:
        raise ValueError("Pixel coordinates indeterminant (w = 0)")
    return int(pixel[0] / pixel[2]), int(pixel[1] / pixel[2])
