"""WKT read/write + geometry coercion (V12).

The reference coerces geometry inputs from WKT strings, dicts with
GeoJSON structure, objects exposing ``__geo_interface__``, WKB bytes,
and bounds tuples (mapchete/config/parse.py:198-251,
mapchete/geometry/shape.py:7-33 via shapely). This is the shapely-free
equivalent over the engine's numpy geometry classes: ``to_wkt`` emits
full-precision ``repr`` coordinates so ``from_wkt(to_wkt(g))`` is a
bit-exact round trip.
"""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np

from mapchete_spark.geometry.core import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)
from mapchete_spark.tilegrid.grid import Bounds


def _fmt_coords(arr: np.ndarray) -> str:
    return ", ".join(f"{x!r} {y!r}" for x, y in np.asarray(arr, dtype=np.float64))


def to_wkt(geom) -> str:
    t = geom.geom_type
    if t == "Point":
        return f"POINT ({geom.x!r} {geom.y!r})"
    if t == "LineString":
        return f"LINESTRING ({_fmt_coords(geom.coords)})"
    if t == "MultiLineString":
        bodies = ", ".join(f"({_fmt_coords(ln.coords)})" for ln in geom.lines)
        return f"MULTILINESTRING ({bodies})"
    if t == "Polygon":
        rings = [geom.exterior, *geom.interiors]
        bodies = ", ".join(f"({_fmt_coords(r)})" for r in rings)
        return f"POLYGON ({bodies})"
    if t == "MultiPolygon":
        polys = []
        for p in geom.polygons:
            rings = [p.exterior, *p.interiors]
            polys.append("(" + ", ".join(f"({_fmt_coords(r)})" for r in rings) + ")")
        return f"MULTIPOLYGON ({', '.join(polys)})"
    raise ValueError(f"unsupported geometry type: {t}")


def _parse_coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        xy = pair.split()
        if len(xy) < 2:
            raise ValueError(f"bad WKT coordinate: {pair!r}")
        pts.append((float(xy[0]), float(xy[1])))
    return np.array(pts, dtype=np.float64)


def _split_groups(body: str) -> list:
    """Split '(...), (...)' at depth-0 commas, stripping one paren level."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                groups.append(body[start:i])
    return groups


def from_wkt(text: str):
    s = text.strip()
    m = re.match(r"^([A-Za-z]+)\s*\((.*)\)\s*$", s, re.S)
    if not m:
        raise ValueError(f"cannot parse WKT: {text[:80]!r}")
    typ = m.group(1).upper()
    body = m.group(2)
    if typ == "POINT":
        arr = _parse_coords(body)
        return Point(float(arr[0, 0]), float(arr[0, 1]))
    if typ == "LINESTRING":
        return LineString(_parse_coords(body))
    if typ == "MULTILINESTRING":
        return MultiLineString(
            tuple(LineString(_parse_coords(g)) for g in _split_groups(body))
        )
    if typ == "POLYGON":
        rings = [_parse_coords(g) for g in _split_groups(body)]
        return Polygon(rings[0], tuple(rings[1:]))
    if typ == "MULTIPOLYGON":
        polys = []
        for g in _split_groups(body):
            rings = [_parse_coords(r) for r in _split_groups(g)]
            polys.append(Polygon(rings[0], tuple(rings[1:])))
        return MultiPolygon(tuple(polys))
    raise ValueError(f"unsupported WKT type: {typ}")


def _from_geo_interface(gi: dict):
    t = gi.get("type")
    coords = gi.get("coordinates")
    if t == "Point":
        return Point(float(coords[0]), float(coords[1]))
    if t == "LineString":
        return LineString(np.asarray(coords, dtype=np.float64))
    if t == "MultiLineString":
        return MultiLineString(
            tuple(LineString(np.asarray(c, dtype=np.float64)) for c in coords)
        )
    if t == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in coords]
        return Polygon(rings[0], tuple(rings[1:]))
    if t == "MultiPolygon":
        polys = []
        for p in coords:
            rings = [np.asarray(r, dtype=np.float64) for r in p]
            polys.append(Polygon(rings[0], tuple(rings[1:])))
        return MultiPolygon(tuple(polys))
    if t == "Feature":
        return _from_geo_interface(gi["geometry"])
    raise ValueError(f"unsupported __geo_interface__ type: {t}")


def to_geo_interface(geom) -> dict:
    """GeoJSON-structured dict from an engine geometry — the exact
    inverse of :func:`_from_geo_interface` (the reference gets this as
    shapely's ``mapping()``/``__geo_interface__``). Coordinates emit as
    plain float lists so ``json.dumps`` round-trips bit-exact float64
    via repr."""
    t = geom.geom_type
    if t == "Point":
        return {"type": t, "coordinates": [float(geom.x), float(geom.y)]}
    if t == "LineString":
        return {
            "type": t,
            "coordinates": np.asarray(geom.coords, dtype=np.float64).tolist(),
        }
    if t == "MultiLineString":
        return {
            "type": t,
            "coordinates": [
                np.asarray(l.coords, dtype=np.float64).tolist()
                for l in geom.lines
            ],
        }
    if t == "Polygon":
        return {
            "type": t,
            "coordinates": [
                np.asarray(geom.exterior, dtype=np.float64).tolist()
            ]
            + [np.asarray(h, dtype=np.float64).tolist() for h in geom.interiors],
        }
    if t == "MultiPolygon":
        return {
            "type": t,
            "coordinates": [
                [np.asarray(p.exterior, dtype=np.float64).tolist()]
                + [np.asarray(h, dtype=np.float64).tolist()
                   for h in p.interiors]
                for p in geom.polygons
            ],
        }
    raise ValueError(f"unsupported geometry type: {t}")


def guess_geometry(obj) -> Tuple[object, None]:
    """Coerce WKT strings, WKB bytes, GeoJSON-structured dicts, objects
    with ``__geo_interface__``, bounds 4-tuples/Bounds, and native
    geometry objects into an engine geometry
    (mapchete/config/parse.py:198-251 semantics). Returns (geometry,
    crs) — crs is always None here (config-level CRS handling is the
    caller's job), keeping the reference's 2-tuple shape."""
    from mapchete_spark.geometry.wkb import from_wkb

    if hasattr(obj, "geom_type"):
        return obj, None
    if isinstance(obj, str):
        return from_wkt(obj), None
    if isinstance(obj, (bytes, bytearray)):
        return from_wkb(bytes(obj)), None
    if isinstance(obj, dict):
        return _from_geo_interface(obj), None
    if hasattr(obj, "__geo_interface__"):
        return _from_geo_interface(obj.__geo_interface__), None
    if isinstance(obj, Bounds):
        return Polygon.from_bounds(obj), None
    if isinstance(obj, (list, tuple)) and len(obj) == 4:
        return Polygon.from_bounds(Bounds(*[float(v) for v in obj])), None
    raise ValueError(f"cannot coerce {type(obj).__name__} to a geometry")
