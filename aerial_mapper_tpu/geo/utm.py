"""WGS84 lat/long <-> UTM conversions (host-side, float64, vectorized numpy).

Replaces the reference's vendored ``gps-conversions.h`` (``UTM::LLtoUTM``
at ``aerial_mapper_thirdparty/.../gps-conversions.h:171-250`` and
``UTM::UTMtoLL`` at ``:269-335``), which implements the standard USGS
transverse-Mercator series expansion. Georeferenced coordinates are ~5e6 m,
so this stays in float64 on the host; device code only ever sees
origin-subtracted coordinates (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np

# WGS-84 ellipsoid.
_A = 6378137.0  # semi-major axis [m]
_ECC_SQ = 0.00669438  # first eccentricity squared
_K0 = 0.9996  # UTM scale factor


def utm_letter_designator(lat: float) -> str:
    """MGRS latitude band letter (reference gps-conversions.h:113-166)."""
    bands = "CDEFGHJKLMNPQRSTUVWX"
    if -80.0 <= lat <= 84.0:
        idx = int(np.floor((min(lat, 83.999999) + 80.0) / 8.0))
        return bands[min(idx, len(bands) - 1)]
    return "Z"  # outside UTM limits


def ll_to_utm(lat, lon, force_zone: int | None = None):
    """Lat/long (degrees) -> (easting, northing, zone, band).

    Vectorized over numpy arrays; `zone` is computed from the (first)
    longitude unless ``force_zone`` is given.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    # Normalize longitude to [-180, 180).
    lon_n = (lon + 180.0) - np.floor((lon + 180.0) / 360.0) * 360.0 - 180.0

    if force_zone is not None:
        zone = int(force_zone)
    else:
        lon0_ref = float(np.atleast_1d(lon_n)[0])
        lat0_ref = float(np.atleast_1d(lat)[0])
        zone = int((lon0_ref + 180.0) / 6.0) + 1
        # Special zones (Norway / Svalbard), as in gps-conversions.h:189-203.
        if 56.0 <= lat0_ref < 64.0 and 3.0 <= lon0_ref < 12.0:
            zone = 32
        if 72.0 <= lat0_ref < 84.0:
            if 0.0 <= lon0_ref < 9.0:
                zone = 31
            elif 9.0 <= lon0_ref < 21.0:
                zone = 33
            elif 21.0 <= lon0_ref < 33.0:
                zone = 35
            elif 33.0 <= lon0_ref < 42.0:
                zone = 37

    lon_origin = (zone - 1) * 6 - 180 + 3  # central meridian [deg]
    ecc_prime_sq = _ECC_SQ / (1.0 - _ECC_SQ)

    lat_r = np.deg2rad(lat)
    lon_r = np.deg2rad(lon_n)
    lon_origin_r = np.deg2rad(lon_origin)

    n = _A / np.sqrt(1.0 - _ECC_SQ * np.sin(lat_r) ** 2)
    t = np.tan(lat_r) ** 2
    c = ecc_prime_sq * np.cos(lat_r) ** 2
    a = np.cos(lat_r) * (lon_r - lon_origin_r)

    m = _A * (
        (1.0 - _ECC_SQ / 4 - 3 * _ECC_SQ**2 / 64 - 5 * _ECC_SQ**3 / 256) * lat_r
        - (3 * _ECC_SQ / 8 + 3 * _ECC_SQ**2 / 32 + 45 * _ECC_SQ**3 / 1024)
        * np.sin(2 * lat_r)
        + (15 * _ECC_SQ**2 / 256 + 45 * _ECC_SQ**3 / 1024) * np.sin(4 * lat_r)
        - (35 * _ECC_SQ**3 / 3072) * np.sin(6 * lat_r)
    )

    easting = (
        _K0
        * n
        * (
            a
            + (1 - t + c) * a**3 / 6
            + (5 - 18 * t + t**2 + 72 * c - 58 * ecc_prime_sq) * a**5 / 120
        )
        + 500000.0
    )
    northing = _K0 * (
        m
        + n
        * np.tan(lat_r)
        * (
            a**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ecc_prime_sq) * a**6 / 720
        )
    )
    northing = np.where(lat < 0, northing + 10000000.0, northing)

    band = utm_letter_designator(float(np.atleast_1d(lat)[0]))
    return easting, northing, zone, band


def utm_to_ll(easting, northing, zone: int, northern_hemisphere: bool = True):
    """(easting, northing, zone) -> lat/long in degrees (vectorized)."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)

    x = easting - 500000.0
    y = np.where(northern_hemisphere, northing, northing - 10000000.0)

    ecc_prime_sq = _ECC_SQ / (1.0 - _ECC_SQ)
    e1 = (1.0 - np.sqrt(1.0 - _ECC_SQ)) / (1.0 + np.sqrt(1.0 - _ECC_SQ))
    lon_origin = (zone - 1) * 6 - 180 + 3

    m = y / _K0
    mu = m / (
        _A * (1.0 - _ECC_SQ / 4 - 3 * _ECC_SQ**2 / 64 - 5 * _ECC_SQ**3 / 256)
    )

    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
    )

    n1 = _A / np.sqrt(1.0 - _ECC_SQ * np.sin(phi1) ** 2)
    t1 = np.tan(phi1) ** 2
    c1 = ecc_prime_sq * np.cos(phi1) ** 2
    r1 = _A * (1.0 - _ECC_SQ) / (1.0 - _ECC_SQ * np.sin(phi1) ** 2) ** 1.5
    d = x / (n1 * _K0)

    lat = phi1 - (n1 * np.tan(phi1) / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * ecc_prime_sq) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * ecc_prime_sq - 3 * c1**2)
        * d**6
        / 720
    )
    lon = (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * ecc_prime_sq + 24 * t1**2)
        * d**5
        / 120
    ) / np.cos(phi1)

    return np.rad2deg(lat), lon_origin + np.rad2deg(lon)
