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


def test_camera_ray_pixel_utm_roundtrip():
    """Camera-ray ground intersections (google-maps-api.cc:65-96): forward
    then inverse must return the original pixel; a non-descending ray
    yields (0, 0) like the reference's lambda gate."""
    import numpy as np

    from aerial_mapper_tpu.google_maps.client import (
        camera_pixel_to_utm,
        camera_utm_to_pixel,
    )

    rng = np.random.default_rng(4)
    # nadir-ish pixel->direction matrix: K^-1 composed with a small tilt
    K = np.array([[400.0, 0.0, 320.0], [0.0, 400.0, 240.0], [0.0, 0.0, 1.0]])
    tilt = 0.05
    R = np.array([
        [1.0, 0.0, 0.0],
        [0.0, np.cos(tilt), -np.sin(tilt)],
        [0.0, np.sin(tilt), np.cos(tilt)],
    ])
    pre = R @ np.linalg.inv(K)
    pre = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, -1.0]]) @ pre
    pre_inv = np.linalg.inv(pre)
    cam_n, cam_e, alt = 5272260.0, 464980.0, 100.0

    for _ in range(20):
        col, row = rng.uniform(0, 640), rng.uniform(0, 480)
        n, e = camera_pixel_to_utm(col, row, cam_n, cam_e, alt, pre)
        assert n != 0.0 or e != 0.0
        # ground point within a plausible footprint of the camera
        assert abs(n - cam_n) < 500 and abs(e - cam_e) < 500
        col2, row2 = camera_utm_to_pixel(n, e, cam_n, cam_e, alt, pre_inv)
        # reference truncates to int
        assert abs(col2 - col) <= 1 and abs(row2 - row) <= 1

    # ray pointing AWAY from the ground: reference returns (0, 0)
    pre_up = -pre
    n, e = camera_pixel_to_utm(320.0, 240.0, cam_n, cam_e, alt, pre_up)
    assert (n, e) == (0.0, 0.0)


def test_meters_per_pixel_matches_reference_constant():
    """The reference hardcodes 156543.03392 m/px at zoom 0 (google-maps-
    api.cc:53); our closed form must reproduce it."""
    c = make_client()
    ref = 156543.03392 * math.cos(math.radians(c.center_lat)) / 2 ** c.zoom
    assert abs(c.meters_per_pixel - ref) < 1e-4
