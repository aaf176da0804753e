"""Tiny WKB codec for Point / LineString / MultiLineString / Polygon /
MultiPolygon.

The engine's vector payload is a ``geometry:binary`` (WKB) column
(SURVEY.md §1.1); with shapely unavailable we read/write the ISO WKB
byte layout directly (little-endian).
"""

from __future__ import annotations

import struct
from typing import Union

import numpy as np

from mapchete_spark.geometry.core import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)

_POINT = 1
_LINESTRING = 2
_POLYGON = 3
_MULTILINESTRING = 5
_MULTIPOLYGON = 6

Geometry = Union[Point, LineString, MultiLineString, Polygon, MultiPolygon]


def _ring_bytes(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    if not np.allclose(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return struct.pack("<I", len(ring)) + ring.tobytes()


def _polygon_body(poly: Polygon) -> bytes:
    out = struct.pack("<I", 1 + len(poly.interiors))
    out += _ring_bytes(poly.exterior)
    for hole in poly.interiors:
        out += _ring_bytes(hole)
    return out


def to_wkb(geom: Geometry) -> bytes:
    if isinstance(geom, Point):
        return struct.pack("<bIdd", 1, _POINT, geom.x, geom.y)
    if isinstance(geom, LineString):
        coords = np.asarray(geom.coords, dtype="<f8")
        return (
            struct.pack("<bII", 1, _LINESTRING, len(coords)) + coords.tobytes()
        )
    if isinstance(geom, MultiLineString):
        out = struct.pack("<bII", 1, _MULTILINESTRING, len(geom.lines))
        for ln in geom.lines:
            coords = np.asarray(ln.coords, dtype="<f8")
            out += struct.pack("<bII", 1, _LINESTRING, len(coords)) + coords.tobytes()
        return out
    if isinstance(geom, Polygon):
        return struct.pack("<bI", 1, _POLYGON) + _polygon_body(geom)
    if isinstance(geom, MultiPolygon):
        out = struct.pack("<bII", 1, _MULTIPOLYGON, len(geom.polygons))
        for p in geom.polygons:
            out += struct.pack("<bI", 1, _POLYGON) + _polygon_body(p)
        return out
    raise TypeError(f"cannot encode {type(geom)}")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, fmt: str):
        vals = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals

    def coords(self, n: int) -> np.ndarray:
        arr = np.frombuffer(self.buf, dtype="<f8", count=2 * n, offset=self.pos)
        self.pos += 16 * n
        return arr.reshape(n, 2).copy()


def _read_polygon_body(r: _Reader) -> Polygon:
    (nrings,) = r.take("<I")
    rings = []
    for _ in range(nrings):
        (npts,) = r.take("<I")
        rings.append(r.coords(npts))
    return Polygon(rings[0], tuple(rings[1:]))


def from_wkb(buf: bytes) -> Geometry:
    r = _Reader(bytes(buf))
    byteorder, gtype = r.take("<bI")
    if byteorder != 1:
        raise ValueError("only little-endian WKB supported")
    gtype &= 0xFF  # strip SRID/dimension flags
    if gtype == _POINT:
        x, y = r.take("<dd")
        return Point(x, y)
    if gtype == _LINESTRING:
        (n,) = r.take("<I")
        return LineString(r.coords(n))
    if gtype == _MULTILINESTRING:
        (n,) = r.take("<I")
        lines = []
        for _ in range(n):
            r.take("<bI")
            (npts,) = r.take("<I")
            lines.append(LineString(r.coords(npts)))
        return MultiLineString(tuple(lines))
    if gtype == _POLYGON:
        return _read_polygon_body(r)
    if gtype == _MULTIPOLYGON:
        (n,) = r.take("<I")
        polys = []
        for _ in range(n):
            r.take("<bI")
            polys.append(_read_polygon_body(r))
        return MultiPolygon(tuple(polys))
    raise ValueError(f"unsupported WKB geometry type {gtype}")
