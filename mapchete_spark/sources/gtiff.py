"""Pure-python GeoTIFF codec — real .tif bytes without GDAL.

The reference's default raster output driver is GTiff
(mapchete/formats/default/gtiff.py:341-509 writes via rasterio); this
sandbox has no GDAL, which previously left S5/S6 as "parquet tile
table + PNG" partials. A baseline GeoTIFF, however, is a plain TIFF
6.0 file with three GeoTIFF tags — fully writable with struct:

- classic little-endian TIFF, one IFD, a single strip, uncompressed,
  contiguous planar (band-interleaved-by-pixel);
- ModelPixelScaleTag (33550) + ModelTiepointTag (33922) carry the
  affine georeferencing (north-up grids — exactly what the tile
  pyramid produces);
- GeoKeyDirectoryTag (34735) declares the CRS: geographic 4326 or a
  projected EPSG code (GTModelType/GTRasterType/Geographic|
  ProjectedCSType keys);
- GDAL_NODATA (42113, ASCII) when a nodata value is set.

Any GDAL/QGIS build reads these files. The decoder handles the same
subset (plus multi-strip) for round-trip tests and the tile-directory
read path.

Supported dtypes: uint8, uint16, int16, int32, uint32, float32,
float64.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from mapchete_spark.tilegrid.grid import Bounds

_SAMPLE_FORMAT = {  # TIFF SampleFormat: 1 unsigned, 2 signed, 3 float
    np.dtype("uint8"): 1,
    np.dtype("uint16"): 1,
    np.dtype("uint32"): 1,
    np.dtype("int16"): 2,
    np.dtype("int32"): 2,
    np.dtype("float32"): 3,
    np.dtype("float64"): 3,
}

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE, _TYPE_ASCII = 3, 4, 12, 2


def _epsg_code(crs: str) -> int:
    if crs.upper().startswith("EPSG:"):
        return int(crs.split(":")[1])
    raise ValueError(f"gtiff writer needs an EPSG code, got {crs!r}")


def _ifd_block(
    arr: np.ndarray,
    bounds: Bounds,
    epsg: int,
    nodata: Optional[float],
    base: int,
    next_ifd: int,
    reduced: bool = False,
) -> bytes:
    """One complete IFD block (entry table + next-IFD pointer + out-of-
    line values + pixel data) with all offsets ABSOLUTE assuming the
    block starts at file offset ``base``. Chaining blocks via
    ``next_ifd`` yields a multi-IFD file (the COG overview layout)."""
    bands, h, w = arr.shape
    dt = arr.dtype
    if dt not in _SAMPLE_FORMAT:
        raise ValueError(f"unsupported gtiff dtype {dt}")
    bits = dt.itemsize * 8
    fmt = _SAMPLE_FORMAT[dt]

    pixels = np.ascontiguousarray(
        np.moveaxis(arr, 0, 2), dtype=dt.newbyteorder("<")
    ).tobytes()
    sx = (bounds.right - bounds.left) / w
    sy = (bounds.top - bounds.bottom) / h

    geo_keys = [
        (1, 1, 0, 3),
        (1024, 0, 1, 2 if epsg == 4326 else 1),
        (1025, 0, 1, 1),
        (2048 if epsg == 4326 else 3072, 0, 1, epsg),
    ]
    geo_shorts = [v for row in geo_keys for v in row]

    entries = []

    def entry(tag, typ, count, value):
        entries.append((tag, typ, count, value))

    if reduced:
        entry(254, _TYPE_LONG, 1, 1)  # NewSubfileType: reduced-resolution
    entry(256, _TYPE_LONG, 1, w)
    entry(257, _TYPE_LONG, 1, h)
    entry(258, _TYPE_SHORT, bands, [bits] * bands)
    entry(259, _TYPE_SHORT, 1, 1)
    entry(262, _TYPE_SHORT, 1, 1)
    entry(273, _TYPE_LONG, 1, None)  # patched after layout
    entry(277, _TYPE_SHORT, 1, bands)
    entry(278, _TYPE_LONG, 1, h)
    entry(279, _TYPE_LONG, 1, len(pixels))
    entry(284, _TYPE_SHORT, 1, 1)
    entry(339, _TYPE_SHORT, bands, [fmt] * bands)
    entry(33550, _TYPE_DOUBLE, 3, [sx, sy, 0.0])
    entry(33922, _TYPE_DOUBLE, 6, [0.0, 0.0, 0.0, bounds.left, bounds.top, 0.0])
    entry(34735, _TYPE_SHORT, len(geo_shorts), geo_shorts)
    if nodata is not None:
        nod_ascii = (repr(float(nodata)).rstrip("0").rstrip(".") or "0") + "\x00"
        entry(42113, _TYPE_ASCII, len(nod_ascii), nod_ascii)

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    data_start = base + 2 + n * 12 + 4

    def _pack_value(typ, count, value) -> bytes:
        if typ == _TYPE_SHORT:
            vals = value if isinstance(value, (list, tuple)) else [value]
            return struct.pack(f"<{count}H", *vals)
        if typ == _TYPE_LONG:
            vals = value if isinstance(value, (list, tuple)) else [value]
            return struct.pack(f"<{count}I", *vals)
        if typ == _TYPE_DOUBLE:
            return struct.pack(f"<{count}d", *value)
        if typ == _TYPE_ASCII:
            return value.encode("ascii")
        raise AssertionError(typ)

    type_size = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8, _TYPE_ASCII: 1}
    blobs, offsets, cursor = [], {}, data_start
    for tag, typ, count, value in entries:
        if tag == 273:
            continue
        nbytes = type_size[typ] * count
        if nbytes > 4:
            packed = _pack_value(typ, count, value)
            if cursor % 2:
                blobs.append(b"\x00")
                cursor += 1
            offsets[tag] = cursor
            blobs.append(packed)
            cursor += len(packed)
    if cursor % 2:
        blobs.append(b"\x00")
        cursor += 1
    pixel_offset = cursor

    out = bytearray()
    out += struct.pack("<H", n)
    for tag, typ, count, value in entries:
        if tag == 273:
            value_bytes = struct.pack("<I", pixel_offset)
        else:
            nbytes = type_size[typ] * count
            if nbytes > 4:
                value_bytes = struct.pack("<I", offsets[tag])
            else:
                value_bytes = _pack_value(typ, count, value).ljust(4, b"\x00")
        out += struct.pack("<HHI", tag, typ, count) + value_bytes
    out += struct.pack("<I", next_ifd)
    for b in blobs:
        out += b
    out += pixels
    return bytes(out)


def encode_gtiff(
    arr: np.ndarray,
    bounds: Bounds,
    crs: str = "EPSG:4326",
    nodata: Optional[float] = None,
) -> bytes:
    """(bands, h, w) array + bounds + EPSG -> baseline GeoTIFF bytes."""
    if arr.ndim == 2:
        arr = arr[None, :, :]
    epsg = _epsg_code(crs)
    return (
        struct.pack("<2sHI", b"II", 42, 8)
        + _ifd_block(arr, bounds, epsg, nodata, base=8, next_ifd=0)
    )


def encode_gtiff_overviews(
    arrs,
    bounds: Bounds,
    crs: str = "EPSG:4326",
    nodata: Optional[float] = None,
) -> bytes:
    """Full-resolution array + reduced-resolution overview arrays ->
    one multi-IFD GeoTIFF (the Cloud-Optimized-GeoTIFF overview
    layout: IFD 0 is the full image, chained IFDs carry
    NewSubfileType=1 reduced-resolution levels over the SAME bounds —
    reference single-file COG output, formats/default/gtiff.py
    overviews path)."""
    arrs = [a[None, :, :] if a.ndim == 2 else a for a in arrs]
    epsg = _epsg_code(crs)
    head = 8
    blocks = []
    base = head
    for i, a in enumerate(arrs):
        # two passes: sizes depend only on content, so build once with
        # next_ifd=0 to learn the length, then rebuild with the real
        # pointer (lengths are pointer-independent)
        probe = _ifd_block(
            a, bounds, epsg, nodata, base=base, next_ifd=0, reduced=i > 0
        )
        blocks.append((base, len(probe), a, i))
        base += len(probe)
    out = bytearray(struct.pack("<2sHI", b"II", 42, head))
    for j, (b0, blen, a, i) in enumerate(blocks):
        next_ifd = blocks[j + 1][0] if j + 1 < len(blocks) else 0
        out += _ifd_block(
            a, bounds, epsg, nodata, base=b0, next_ifd=next_ifd, reduced=i > 0
        )
    return bytes(out)


def decode_gtiff(
    buf: bytes,
) -> Tuple[np.ndarray, Bounds, Optional[int], Optional[float]]:
    """GeoTIFF bytes -> ((bands, h, w) array, bounds, epsg, nodata).

    Reads the baseline subset this module writes (little-endian classic
    TIFF, uncompressed, contiguous planar, one or more strips)."""
    if buf[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    return _decode_ifd(buf, ifd_off)[0]


def decode_gtiff_all(buf: bytes):
    """Every IFD of a (possibly multi-IFD / COG-overview) GeoTIFF:
    list of (array, bounds, epsg, nodata) from IFD 0 downward."""
    if buf[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    out = []
    while ifd_off:
        level, ifd_off = _decode_ifd(buf, ifd_off)
        out.append(level)
    return out


def _decode_ifd(buf: bytes, ifd_off: int):
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags = {}
    type_size = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8, _TYPE_ASCII: 1}
    fmt_char = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}
    for i in range(n):
        tag, typ, count = struct.unpack_from("<HHI", buf, ifd_off + 2 + i * 12)
        voff = ifd_off + 2 + i * 12 + 8
        nbytes = type_size.get(typ, 1) * count
        if nbytes > 4:
            (voff,) = struct.unpack_from("<I", buf, voff)
        if typ == _TYPE_ASCII:
            vals = buf[voff : voff + count].rstrip(b"\x00").decode("ascii")
        else:
            vals = list(struct.unpack_from(f"<{count}{fmt_char[typ]}", buf, voff))
        tags[tag] = vals

    w, h = tags[256][0], tags[257][0]
    bands = tags.get(277, [1])[0]
    bits = tags[258][0]
    fmt = tags.get(339, [1])[0]
    if tags.get(259, [1])[0] != 1:
        raise ValueError("compressed TIFF not supported")
    kind = {1: "u", 2: "i", 3: "f"}[fmt]
    dt = np.dtype(f"<{kind}{bits // 8}")
    offsets, counts = tags[273], tags[279]
    raw = b"".join(buf[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype=dt, count=h * w * bands).reshape(h, w, bands)
    arr = np.moveaxis(arr, 2, 0)

    bounds = None
    if 33550 in tags and 33922 in tags:
        sx, sy = tags[33550][0], tags[33550][1]
        left, top = tags[33922][3], tags[33922][4]
        bounds = Bounds(left, top - sy * h, left + sx * w, top)
    epsg = None
    if 34735 in tags:
        gk = tags[34735]
        for j in range(4, len(gk), 4):
            if gk[j] in (2048, 3072):
                epsg = gk[j + 3]
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(tags[42113])
        except ValueError:
            pass
    (next_ifd,) = struct.unpack_from("<I", buf, ifd_off + 2 + n * 12)
    return (arr, bounds, epsg, nodata), next_ifd
