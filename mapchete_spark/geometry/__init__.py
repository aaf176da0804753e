"""Minimal vectorized geometry kernel (no shapely/GEOS available).

Implements exactly the geometry operations the engine needs, in numpy:
point-in-polygon, polygon<->rect clipping and intersection area,
segmentize, WKB encode/decode, antimeridian split/shift, and a
geodetic<->spherical-mercator reprojection pair.
"""

from mapchete_spark.geometry.core import (
    Polygon,
    MultiPolygon,
    Point,
    LineString,
    clip_ring_to_rect,
    point_in_ring,
    ring_area,
    segmentize_ring,
)
from mapchete_spark.geometry.wkb import from_wkb, to_wkb

__all__ = [
    "Polygon",
    "MultiPolygon",
    "Point",
    "LineString",
    "clip_ring_to_rect",
    "point_in_ring",
    "ring_area",
    "segmentize_ring",
    "from_wkb",
    "to_wkb",
]
