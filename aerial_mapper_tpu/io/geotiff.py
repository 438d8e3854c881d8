"""Pure-Python GeoTiff writer/reader (no GDAL dependency).

Replaces the reference's GDAL export paths ``toGeoTiff`` (1-band byte,
``aerial_mapper_io/src/aerial-mapper-io.cc:349-431``) and
``writeDataToDEMGeoTiffColor`` (3-band byte, cc:433-509), plus a float32
band for real DEM values (the reference quantizes elevation to bytes). The
reference hardcodes UTM zone 32 north (cc:391-393, 466-471); here the zone
and hemisphere are parameters, as SURVEY.md's quirk list prescribes.

Files are plain baseline TIFF (little-endian, single strip, uncompressed)
carrying the three GeoTIFF tags consumed by GIS tools:
ModelPixelScaleTag (33550), ModelTiepointTag (33922) and
GeoKeyDirectoryTag (34735) with an EPSG 326xx/327xx projected CRS.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12

_TAG_SIZES = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8}


def _pack_values(ttype: int, values) -> bytes:
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[ttype]
    return struct.pack("<" + fmt * len(values), *values)


def write_geotiff(
    filename: str,
    array: np.ndarray,
    west: float,
    north: float,
    resolution: float,
    utm_zone: int = 32,
    northern_hemisphere: bool = True,
) -> None:
    """Write [H, W] (gray/float) or [H, W, 3] (color) as GeoTiff.

    dtype uint8 -> byte bands; anything float with a [H, W] shape ->
    float32 band (DEM). Geotransform: pixel (0, 0) upper-left corner at
    (west, north), square pixels of ``resolution`` meters.
    """
    arr = np.asarray(array)
    if arr.ndim == 2:
        samples = 1
        if arr.dtype == np.uint8:
            data = arr.tobytes()
            bits, sample_format = (8,), (1,)
            photometric = 1
        else:
            data = arr.astype("<f4").tobytes()
            bits, sample_format = (32,), (3,)
            photometric = 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        samples = 3
        data = np.clip(arr, 0, 255).astype(np.uint8).tobytes()
        bits, sample_format = (8, 8, 8), (1, 1, 1)
        photometric = 2
    else:
        raise ValueError(f"Unsupported array shape {arr.shape}")

    h, w = arr.shape[:2]
    epsg = (32600 if northern_hemisphere else 32700) + utm_zone
    geokeys = (
        1, 1, 0, 3,  # version, revision, minor, number of keys
        1024, 0, 1, 1,  # GTModelTypeGeoKey = Projected
        1025, 0, 1, 1,  # GTRasterTypeGeoKey = PixelIsArea
        3072, 0, 1, epsg,  # ProjectedCSTypeGeoKey
    )
    pixel_scale = (float(resolution), float(resolution), 0.0)
    tiepoint = (0.0, 0.0, 0.0, float(west), float(north), 0.0)

    # tag id -> (type, values)
    tags = {
        256: (_TYPE_LONG, (w,)),
        257: (_TYPE_LONG, (h,)),
        258: (_TYPE_SHORT, bits),
        259: (_TYPE_SHORT, (1,)),  # no compression
        262: (_TYPE_SHORT, (photometric,)),
        273: (_TYPE_LONG, None),  # strip offset, patched below
        277: (_TYPE_SHORT, (samples,)),
        278: (_TYPE_LONG, (h,)),
        279: (_TYPE_LONG, (len(data),)),
        284: (_TYPE_SHORT, (1,)),
        339: (_TYPE_SHORT, sample_format),
        33550: (_TYPE_DOUBLE, pixel_scale),
        33922: (_TYPE_DOUBLE, tiepoint),
        34735: (_TYPE_SHORT, geokeys),
    }

    num_tags = len(tags)
    ifd_offset = 8
    ifd_size = 2 + num_tags * 12 + 4
    extra_offset = ifd_offset + ifd_size

    # lay out out-of-line tag payloads
    extra_blobs = []
    extra_pos = {}
    pos = extra_offset
    for tag_id, (ttype, values) in sorted(tags.items()):
        if values is None:
            continue
        size = _TAG_SIZES[ttype] * len(values)
        if size > 4:
            blob = _pack_values(ttype, values)
            extra_pos[tag_id] = pos
            extra_blobs.append(blob)
            pos += len(blob)
    if pos % 2:
        pos += 1
    strip_offset = pos
    tags[273] = (_TYPE_LONG, (strip_offset,))

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", num_tags)
    for tag_id, (ttype, values) in sorted(tags.items()):
        count = len(values)
        size = _TAG_SIZES[ttype] * count
        if size <= 4:
            payload = _pack_values(ttype, values).ljust(4, b"\x00")
            out += struct.pack("<HHI", tag_id, ttype, count) + payload
        else:
            out += struct.pack("<HHII", tag_id, ttype, count,
                               extra_pos[tag_id])
    out += struct.pack("<I", 0)  # next IFD
    for blob in extra_blobs:
        out += blob
    while len(out) < strip_offset:
        out += b"\x00"
    out += data
    with open(filename, "wb") as f:
        f.write(bytes(out))


def read_geotiff(
    filename: str,
) -> Tuple[np.ndarray, Tuple[float, float, float], Optional[int]]:
    """Read a (baseline, single-strip) GeoTiff written by write_geotiff.

    Returns (array, (west, north, resolution), epsg or None).
    """
    with open(filename, "rb") as f:
        buf = f.read()
    order, magic, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    if order != b"II" or magic != 42:
        raise ValueError("Not a little-endian TIFF")
    (num_tags,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    for i in range(num_tags):
        tag_id, ttype, count = struct.unpack_from(
            "<HHI", buf, ifd_off + 2 + i * 12
        )
        size = _TAG_SIZES.get(ttype, 1) * count
        value_off = ifd_off + 2 + i * 12 + 8
        if size > 4:
            (value_off,) = struct.unpack_from("<I", buf, value_off)
        fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}.get(ttype)
        if fmt is None:
            continue
        tags[tag_id] = struct.unpack_from("<" + fmt * count, buf, value_off)

    w, h = tags[256][0], tags[257][0]
    samples = tags.get(277, (1,))[0]
    bits = tags[258][0]
    sample_format = tags.get(339, (1,))[0]
    strip_off = tags[273][0]
    nbytes = tags[279][0]
    raw = buf[strip_off: strip_off + nbytes]
    if bits == 8:
        arr = np.frombuffer(raw, np.uint8)
        arr = arr.reshape(h, w, samples) if samples > 1 else arr.reshape(h, w)
    elif bits == 32 and sample_format == 3:
        arr = np.frombuffer(raw, "<f4").reshape(h, w)
    else:
        raise ValueError(f"Unsupported bits/sample_format: {bits}/{sample_format}")

    scale = tags.get(33550, (1.0, 1.0, 0.0))
    tie = tags.get(33922, (0.0,) * 6)
    west, north, res = tie[3], tie[4], scale[0]

    epsg = None
    geokeys = tags.get(34735)
    if geokeys:
        for k in range(4, len(geokeys), 4):
            if geokeys[k] == 3072:
                epsg = geokeys[k + 3]
    return arr, (west, north, res), epsg
