"""Footprint buffering, antimeridian-safe via the local UTM zone.

Reference: mapchete/geometry/footprints.py:20-110 — dataset footprints
that cross the antimeridian are shifted into a continuous frame,
buffered in a METRIC CRS (the centroid's UTM zone, so 'buffer by N
pixels' means meters, not degrees that collapse near the poles), then
transformed back and re-split at the antimeridian.

The buffer itself is a miter vertex-offset (each vertex moves along the
averaged outward normal of its adjacent edges) — exact for convex
rings, a tight approximation for the engine's near-convex synthetic
footprints; shapely's arc-segment buffer needs GEOS.
"""

from __future__ import annotations

import numpy as np

from mapchete_spark.geometry.antimeridian import repair_antimeridian_polygon
from mapchete_spark.geometry.core import Polygon
from mapchete_spark.geometry.reproject import get_transform, utm_zone


def _signed_area(ring: np.ndarray) -> float:
    """Signed shoelace (positive = CCW); core.ring_area is unsigned."""
    x, y = ring[:, 0], ring[:, 1]
    return float((np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def _continuous_ring(ring: np.ndarray) -> np.ndarray:
    """Shift western coordinates +360 when the ring wraps the
    antimeridian, so downstream math sees one continuous shape
    (mapchete/geometry/latlon.py:14-30 heuristic: a lon span > 180
    means the shape wraps)."""
    r = np.array(ring, dtype=np.float64)
    lon = r[:, 0]
    if lon.max() - lon.min() > 180.0:
        r[:, 0] = np.where(lon < 0.0, lon + 360.0, lon)
    return r


def offset_ring(ring: np.ndarray, distance: float) -> np.ndarray:
    """Move each vertex outward by ``distance`` along the miter normal.
    The ring is normalized to CCW first so 'outward' is well-defined."""
    r = np.asarray(ring, dtype=np.float64)
    closed = np.allclose(r[0], r[-1])
    if closed:
        r = r[:-1]
    if _signed_area(np.vstack([r, r[:1]])) < 0:
        r = r[::-1]
    prev = np.roll(r, 1, axis=0)
    nxt = np.roll(r, -1, axis=0)
    e_in = r - prev
    e_out = nxt - r
    # outward normal of a CCW ring edge (dx, dy) is (dy, -dx)
    def norm(e):
        n = np.column_stack([e[:, 1], -e[:, 0]])
        ln = np.hypot(n[:, 0], n[:, 1])
        ln[ln == 0] = 1.0
        return n / ln[:, None]

    n_avg = norm(e_in) + norm(e_out)
    ln = np.hypot(n_avg[:, 0], n_avg[:, 1])
    ln[ln == 0] = 1.0
    n_avg = n_avg / ln[:, None]
    # miter length: d / cos(theta/2); cos(theta/2) = n_avg . n_edge
    cos_half = np.einsum("ij,ij->i", n_avg, norm(e_in))
    cos_half = np.clip(cos_half, 0.2, 1.0)  # cap spikes (miter limit 5)
    out = r + n_avg * (distance / cos_half)[:, None]
    return np.vstack([out, out[:1]])


def buffer_antimeridian_safe(poly: Polygon, distance_m: float):
    """Buffer a lon/lat polygon by meters in its local UTM zone,
    surviving the antimeridian (footprints.py:20-110 semantics).
    Returns Polygon or MultiPolygon (re-split at the antimeridian)."""
    ring = np.asarray(poly.exterior, dtype=np.float64)
    # continuous frame: shift west-side coordinates past +180 when the
    # ring wraps
    shifted = _continuous_ring(ring)
    cx = float(np.mean(shifted[:, 0]))
    cy = float(np.mean(shifted[:, 1]))
    # the shifted frame may exceed +180: normalize the zone pick
    zone_lon = cx - 360.0 if cx > 180.0 else cx
    crs = utm_zone(zone_lon, cy)
    fwd = get_transform("EPSG:4326", crs)
    inv = get_transform(crs, "EPSG:4326")
    # transform in the normalized frame, keep track of the shift
    lon_in = np.where(shifted[:, 0] > 180.0, shifted[:, 0] - 360.0, shifted[:, 0])
    x, y = fwd(lon_in, shifted[:, 1])
    buffered = offset_ring(np.column_stack([x, y]), float(distance_m))
    lon_out, lat_out = inv(buffered[:, 0], buffered[:, 1])
    # back to the shifted frame: UTM zones near the antimeridian return
    # lon near +/-180; restore continuity by unwrapping against cx
    ref = zone_lon
    lon_cont = np.where(lon_out - ref > 180.0, lon_out - 360.0, lon_out)
    lon_cont = np.where(ref - lon_cont > 180.0, lon_cont + 360.0, lon_cont)
    if cx > 180.0:
        lon_cont = lon_cont + 360.0
    out_ring = np.column_stack([lon_cont, np.clip(lat_out, -90.0, 90.0)])
    return repair_antimeridian_polygon(Polygon(out_ring), -180.0, 180.0)
