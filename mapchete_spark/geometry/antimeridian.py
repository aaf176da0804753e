"""Antimeridian handling (mapchete/geometry/latlon.py:14-85 and
mapchete/geometry/clip.py:12-89 semantics, numpy edition)."""

from __future__ import annotations

from typing import List

import numpy as np

from mapchete_spark.geometry.core import MultiPolygon, Polygon, clip_ring_to_rect
from mapchete_spark.tilegrid.grid import Bounds


def longitudinal_shift(ring: np.ndarray, by: float = 360.0) -> np.ndarray:
    """Shift all x coordinates by ``by`` degrees
    (mapchete/geometry/latlon.py:14-30: +360 on negative coords)."""
    out = np.array(ring, dtype=np.float64)
    out[:, 0] += by
    return out


def crosses_antimeridian(bounds: Bounds, grid_left=-180.0, grid_right=180.0) -> bool:
    return bounds.left < grid_left or bounds.right > grid_right


def split_ring_at_antimeridian(
    ring: np.ndarray, grid_left=-180.0, grid_right=180.0
) -> List[np.ndarray]:
    """Split a ring whose coordinates overflow the pyramid's x bounds into
    in-bounds parts, shifting the overflow back by a full revolution
    (mapchete/geometry/clip.py:12-89)."""
    width = grid_right - grid_left
    parts = []
    inside = clip_ring_to_rect(ring, grid_left, -1e18, grid_right, 1e18)
    if len(inside) >= 3:
        parts.append(inside)
    left_overflow = clip_ring_to_rect(
        ring, grid_left - width, -1e18, grid_left, 1e18
    )
    if len(left_overflow) >= 3:
        parts.append(longitudinal_shift(left_overflow, width))
    right_overflow = clip_ring_to_rect(
        ring, grid_right, -1e18, grid_right + width, 1e18
    )
    if len(right_overflow) >= 3:
        parts.append(longitudinal_shift(right_overflow, -width))
    return parts


def repair_antimeridian_polygon(poly: Polygon, grid_left=-180.0, grid_right=180.0):
    """Return a Polygon or MultiPolygon fully inside the pyramid x-range
    (mapchete/geometry/footprints.py:20-110 semantics)."""
    parts = split_ring_at_antimeridian(poly.exterior, grid_left, grid_right)
    if not parts:
        return poly
    if len(parts) == 1:
        return Polygon(parts[0], poly.interiors)
    return MultiPolygon(tuple(Polygon(p) for p in parts))
