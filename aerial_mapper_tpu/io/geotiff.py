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


def write_dem_geotiff_color(
    filename: str,
    elevation: np.ndarray,
    west: float,
    north: float,
    resolution: float,
    palette: str = "terrain",
    utm_zone: int = 32,
    northern_hemisphere: bool = True,
    nan_color: Tuple[int, int, int] = (255, 255, 255),
) -> np.ndarray:
    """Palette-colored 3-band DEM GeoTiff — ``writeDataToDEMGeoTiffColor``
    parity (aerial-mapper-io.cc:433-509).

    The elevation layer is normalized over its finite range, mapped
    through a 256-entry palette LUT (utils/palettes.py, the reference's
    utils-color-palette.h), and written as an RGB byte GeoTiff with the
    same UTM geo tags as ``write_geotiff``. Cells with NaN elevation get
    ``nan_color``. Deviation (documented): the reference writes the bands
    in a scrambled (R, B, G) order behind a "TODO(hitimo): Fix color
    bands" (cc:488-497); we write true RGB. Returns the [H, W, 3] array
    that was written.
    """
    from aerial_mapper_tpu.utils.palettes import apply_palette

    elev = np.asarray(elevation, np.float64)
    rgb = apply_palette(elev, palette)
    rgb = np.where(np.isnan(elev)[..., None],
                   np.asarray(nan_color, np.uint8), rgb)
    write_geotiff(filename, rgb.astype(np.uint8), west=west, north=north,
                  resolution=resolution, utm_zone=utm_zone,
                  northern_hemisphere=northern_hemisphere)
    return rgb


_TYPE_BYTE = 1


def read_geotiff(
    filename: str,
) -> Tuple[np.ndarray, Tuple[float, float, float], Optional[int]]:
    """Read an uncompressed GeoTiff/TIFF: either byte order, stripped
    (single or multi-strip, any RowsPerStrip) or tiled layout, chunky
    planar config, 8/16-bit unsigned or 32-bit float samples — enough to
    ingest GDAL/PIL-produced uncompressed tiles, not just this module's
    own dialect (VERDICT r1 #7; validated against PIL-written files and
    handcrafted big-endian/tiled fixtures in tests/test_io.py).

    Returns (array, (west, north, resolution), epsg or None).
    """
    with open(filename, "rb") as f:
        buf = f.read()
    order = buf[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("Not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(bo + "HI", buf, 2)
    if magic != 42:
        raise ValueError("Not a TIFF (bad magic)")
    (num_tags,) = struct.unpack_from(bo + "H", buf, ifd_off)
    tags = {}
    fmts = {_TYPE_BYTE: "B", _TYPE_SHORT: "H", _TYPE_LONG: "I",
            _TYPE_DOUBLE: "d"}
    sizes = dict(_TAG_SIZES)
    sizes[_TYPE_BYTE] = 1
    for i in range(num_tags):
        tag_id, ttype, count = struct.unpack_from(
            bo + "HHI", buf, ifd_off + 2 + i * 12
        )
        fmt = fmts.get(ttype)
        if fmt is None:
            continue
        size = sizes[ttype] * count
        value_off = ifd_off + 2 + i * 12 + 8
        if size > 4:
            (value_off,) = struct.unpack_from(bo + "I", buf, value_off)
        tags[tag_id] = struct.unpack_from(bo + fmt * count, buf, value_off)

    w, h = tags[256][0], tags[257][0]
    samples = tags.get(277, (1,))[0]
    bits = tags[258][0]
    sample_format = tags.get(339, (1,))[0]
    if tags.get(259, (1,))[0] != 1:
        raise ValueError("Compressed TIFFs are not supported")
    if tags.get(284, (1,))[0] != 1:
        raise ValueError("Planar (non-chunky) TIFFs are not supported")
    if bits == 8 and sample_format in (1, 4):
        dtype, bpp = np.dtype(bo + "u1"), 1
    elif bits == 16 and sample_format in (1, 4):
        dtype, bpp = np.dtype(bo + "u2"), 2
    elif bits == 32 and sample_format == 3:
        dtype, bpp = np.dtype(bo + "f4"), 4
    else:
        raise ValueError(
            f"Unsupported bits/sample_format: {bits}/{sample_format}"
        )

    if 322 in tags:  # tiled layout
        tw, tl = tags[322][0], tags[323][0]
        offsets, counts = tags[324], tags[325]
        tiles_across = -(-w // tw)
        out = np.zeros((-(-h // tl) * tl, tiles_across * tw, samples), dtype)
        for t, (off, cnt) in enumerate(zip(offsets, counts)):
            tile = np.frombuffer(buf, dtype, count=tw * tl * samples,
                                 offset=off).reshape(tl, tw, samples)
            r, c = (t // tiles_across) * tl, (t % tiles_across) * tw
            out[r: r + tl, c: c + tw] = tile
            del cnt
        arr = out[:h, :w]
    else:  # stripped layout
        rows_per_strip = tags.get(278, (h,))[0]
        offsets, counts = tags[273], tags[279]
        rows = []
        for off, cnt in zip(offsets, counts):
            n_el = cnt // bpp
            rows.append(np.frombuffer(buf, dtype, count=n_el, offset=off))
        flat = np.concatenate(rows)
        # Writers in the wild pad the FINAL strip to full RowsPerStrip
        # (the spec says truncate, but padded files exist — ADVICE r2);
        # crop to the image size like the tiled path's out[:h, :w], and
        # only reject files that are genuinely short.
        need = h * w * samples
        if flat.size < need:
            raise ValueError(
                f"TIFF strip data short: {flat.size} elements < {need}"
            )
        arr = flat[:need].reshape(h, w, samples)
        del rows_per_strip
    arr = arr[..., 0] if samples == 1 else arr
    if bo == ">":
        arr = arr.astype(arr.dtype.newbyteorder("<"))

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
