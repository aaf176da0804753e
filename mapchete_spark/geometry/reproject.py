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


def get_transform(src: str, dst: str):
    """Coordinate transform function (x, y) -> (x, y) between supported CRS.
    Identity when src == dst."""
    if src == dst:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    try:
        return _TRANSFORMS[(src, dst)]
    except KeyError:
        raise ValueError(f"unsupported CRS pair {src} -> {dst}") from None


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
