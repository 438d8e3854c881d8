"""Google static-maps client: URL building + UTM/pixel transforms.

Mirrors the reference demo's usage (main-test-google-maps-api.cc over
google-maps-api.cc:26-96); the tile fetch itself is optional/offline-safe
and returns None without egress, which is also asserted.
"""

import math

from aerial_mapper_tpu.google_maps.client import GoogleMapsClient


def make_client():
    # Rafz dataset origin (flags/1-real-rafz-ortho-from-homography.ff is at
    # UTM 32 / ~47.6N 8.5E)
    return GoogleMapsClient(center_lat=47.60, center_lon=8.53, zoom=18,
                            width_px=640, height_px=480)


def test_tile_url_contents():
    c = make_client()
    url = c.tile_url()
    assert url.startswith("https://maps.googleapis.com/maps/api/staticmap?")
    assert "center=47.6,8.53" in url
    assert "zoom=18" in url and "size=640x480" in url
    assert "maptype=satellite" in url
    assert "key=" not in url  # no key -> no key param
    assert "key=abc" in make_client().__class__(
        47.6, 8.53, api_key="abc").tile_url()


def test_meters_per_pixel_web_mercator():
    c = make_client()
    # ground resolution = cos(lat) * earth circumference / 2^(zoom+8)
    expected = (math.cos(math.radians(47.60)) * 2 * math.pi * 6378137.0
                / 2 ** (18 + 8))
    assert abs(c.meters_per_pixel - expected) < 1e-9


def test_pixel_utm_roundtrip():
    c = make_client()
    e, n, zone = c.pixel_to_utm(100.0, 50.0)
    assert zone == 32
    # inverse via latlon_to_pixel after converting back to lat/lon
    from aerial_mapper_tpu.geo.utm import utm_to_ll
    lat, lon = utm_to_ll(e, n, zone, northern_hemisphere=True)
    col, row = c.latlon_to_pixel(float(lat), float(lon))
    assert abs(col - 100.0) < 0.5 and abs(row - 50.0) < 0.5


def test_center_maps_to_tile_center():
    c = make_client()
    col, row = c.latlon_to_pixel(47.60, 8.53)
    assert abs(col - 320.0) < 1e-6 and abs(row - 240.0) < 1e-6


def test_fetch_tile_offline_safe():
    assert make_client().fetch_tile() is None  # zero-egress environment
