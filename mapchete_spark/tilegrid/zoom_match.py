"""Foreign-pyramid zoom matching (S3 TileDirectory input).

``tile_to_zoom_level`` picks the source zoom of a foreign pyramid whose
resolution best matches a tile — the reference's two methods
(mapchete/io/_misc.py:89-185):

- gdal: GDAL SuggestedWarpOutput resolution = transformed-extent
  diagonal distance / source diagonal pixel count (closed-form
  reprojection here instead of GDAL).
- min: minimum transformed width/height of the four corner pixels
  (best quality, more math).

Both round resolutions to ``precision`` digits and then walk zooms
upward until dst_pyramid.pixel_x_size(zoom) <= resolution.
Golden values: test/test_io.py:88-190.
"""

from __future__ import annotations

import math

from mapchete_spark.geometry.reproject import get_transform
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid


class TopologicalError(ValueError):
    pass


def _transformed_bounds(bounds, src_crs: str, dst_crs: str):
    f = get_transform(src_crs, dst_crs)
    xs, ys = f([bounds.left, bounds.right], [bounds.bottom, bounds.top])
    left, right = sorted([float(xs[0]), float(xs[1])])
    bottom, top = sorted([float(ys[0]), float(ys[1])])
    if right - left <= 0 or top - bottom <= 0:
        raise TopologicalError("bounds cannot be translated into target CRS")
    return left, bottom, right, top


def tile_to_zoom_level(
    tile: Tile,
    dst_pyramid: TilePyramid,
    matching_method: str = "gdal",
    precision: int = 8,
) -> int:
    src_crs = tile.pyramid.crs
    dst_crs = dst_pyramid.crs
    if src_crs == dst_crs:
        return tile.zoom

    pb = tile.pyramid.pixelbuffer
    bounds = tile.bounds(pixelbuffer=pb)
    height, width = tile.shape(pixelbuffer=pb)

    if matching_method == "gdal":
        left, bottom, right, top = _transformed_bounds(bounds, src_crs, dst_crs)
        diagonal = math.hypot(right - left, top - bottom)
        tile_resolution = round(diagonal / math.hypot(width, height), precision)
    elif matching_method == "min":
        x_size = tile.pixel_x_size
        y_size = tile.pixel_y_size
        res = []
        for b in [
            (bounds.left, bounds.top - y_size, bounds.left + x_size, bounds.top),
            (bounds.left, bounds.bottom, bounds.left + x_size, bounds.bottom + y_size),
            (bounds.right - x_size, bounds.bottom, bounds.right, bounds.bottom + y_size),
            (bounds.right - x_size, bounds.top - y_size, bounds.right, bounds.top),
        ]:
            from mapchete_spark.tilegrid.grid import Bounds

            try:
                left, bottom, right, top = _transformed_bounds(
                    Bounds(*b), src_crs, dst_crs
                )
                res.extend([right - left, top - bottom])
            except TopologicalError:
                continue
        if not res:
            raise TopologicalError("tile outside of destination pyramid")
        tile_resolution = round(min(res), precision)
    else:
        raise ValueError(f"invalid matching method: {matching_method}")

    zoom = 0
    while True:
        td_resolution = round(dst_pyramid.pixel_x_size(zoom), precision)
        if td_resolution <= tile_resolution:
            return zoom
        zoom += 1
