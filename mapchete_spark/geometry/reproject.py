"""Geodetic <-> spherical-mercator reprojection (pure numpy).

Replaces the reference's pyproj transformer usage
(mapchete/geometry/reproject.py:75-229) for the two built-in grids.
Spherical mercator (EPSG:3857) forward/inverse are closed-form, so no
proj database is needed. Vectorized over coordinate arrays, matching
the reference's 'reproject via coords-array function' pattern
(mapchete/geometry/transform.py:18-60).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
MERCATOR_MAX_LAT = 85.0511287798066  # atan(sinh(pi)) in degrees


def geodetic_to_mercator(lon: np.ndarray, lat: np.ndarray):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERCATOR_MAX_LAT, MERCATOR_MAX_LAT)
    x = np.radians(lon) * EARTH_RADIUS
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * EARTH_RADIUS
    return x, y


def mercator_to_geodetic(x: np.ndarray, y: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): geodetic_to_mercator,
    ("EPSG:3857", "EPSG:4326"): mercator_to_geodetic,
}

# ---- UTM (spherical transverse Mercator) ---------------------------------------
#
# The reference reprojects through pyproj to ANY CRS; without pyproj the
# engine covers the CRS family its own operators need: the two built-in
# grids plus the UTM zones (EPSG:326xx north / 327xx south), which the
# reference's antimeridian-safe buffering depends on
# (mapchete/geometry/footprints.py:20-110). Formulas are the closed-form
# SPHERICAL transverse Mercator (Snyder 1987 eq. 8-5/8-6, 8-7/8-8) with
# k0 = 0.9996 and the UTM false easting/northing — a documented
# approximation of the ellipsoidal UTM (relative error <= ~1e-3), exact
# enough for footprint buffering and fully SQL-expressible for oracles.

UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500000.0
UTM_FALSE_NORTHING_SOUTH = 10000000.0


def utm_zone(lon: float, lat: float) -> str:
    """EPSG code of the UTM zone containing (lon, lat)."""
    zone = int((float(lon) + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    return f"EPSG:{32600 + zone}" if lat >= 0 else f"EPSG:{32700 + zone}"


def _utm_params(crs: str):
    code = int(crs.split(":")[1])
    if 32601 <= code <= 32660:
        zone, south = code - 32600, False
    elif 32701 <= code <= 32760:
        zone, south = code - 32700, True
    else:
        raise ValueError(f"not a UTM CRS: {crs}")
    lon0 = -183.0 + 6.0 * zone  # central meridian
    return lon0, south


def geodetic_to_utm_factory(crs: str):
    lon0, south = _utm_params(crs)

    def fwd(lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lam = np.radians(lon - lon0)
        phi = np.radians(lat)
        b = np.cos(phi) * np.sin(lam)
        # atanh(b) written out so the SQL twin mirrors it exactly
        x = (
            UTM_K0 * EARTH_RADIUS * (0.5 * np.log((1.0 + b) / (1.0 - b)))
            + UTM_FALSE_EASTING
        )
        y = UTM_K0 * EARTH_RADIUS * np.arctan2(np.tan(phi), np.cos(lam))
        if south:
            y = y + UTM_FALSE_NORTHING_SOUTH
        return x, y

    return fwd


def utm_to_geodetic_factory(crs: str):
    lon0, south = _utm_params(crs)

    def inv(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if south:
            y = y - UTM_FALSE_NORTHING_SOUTH
        xn = (x - UTM_FALSE_EASTING) / (UTM_K0 * EARTH_RADIUS)
        d = y / (UTM_K0 * EARTH_RADIUS)
        lat = np.degrees(np.arcsin(np.sin(d) / np.cosh(xn)))
        lon = lon0 + np.degrees(np.arctan2(np.sinh(xn), np.cos(d)))
        return lon, lat

    return inv


def get_transform(src: str, dst: str):
    """Coordinate transform function (x, y) -> (x, y) between supported
    CRS (built-in grids + UTM zones). Identity when src == dst."""
    if src == dst:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    if (src, dst) in _TRANSFORMS:
        return _TRANSFORMS[(src, dst)]
    if src == "EPSG:4326" and dst.startswith("EPSG:32"):
        return geodetic_to_utm_factory(dst)
    if dst == "EPSG:4326" and src.startswith("EPSG:32"):
        return utm_to_geodetic_factory(src)
    if src.startswith("EPSG:32") and dst.startswith("EPSG:32"):
        inv, fwd = utm_to_geodetic_factory(src), geodetic_to_utm_factory(dst)
        return lambda x, y: fwd(*inv(x, y))
    if src == "EPSG:3857" and dst.startswith("EPSG:32"):
        fwd = geodetic_to_utm_factory(dst)
        return lambda x, y: fwd(*mercator_to_geodetic(x, y))
    if src.startswith("EPSG:32") and dst == "EPSG:3857":
        inv = utm_to_geodetic_factory(src)
        return lambda x, y: geodetic_to_mercator(*inv(x, y))
    raise ValueError(f"unsupported CRS pair {src} -> {dst}")


def reproject_ring(ring: np.ndarray, src: str, dst: str, segmentize_at=None):
    """Reproject a coordinate ring, optionally densifying first
    (mapchete/geometry/reproject.py segmentize-before-warp behavior)."""
    from mapchete_spark.geometry.core import segmentize_ring

    r = np.asarray(ring, dtype=np.float64)
    if segmentize_at:
        r = segmentize_ring(r, segmentize_at)
    f = get_transform(src, dst)
    x, y = f(r[:, 0], r[:, 1])
    return np.column_stack([x, y])
