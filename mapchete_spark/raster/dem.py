"""Synthetic analytic DEM (FIXTURES.md F2).

elev(lon, lat) = 500 + 400*sin(lon*pi/30)*cos(lat*pi/20)
                     + 120*sin(lon*pi/3.7)*sin(lat*pi/2.9)

Any tile window at any zoom is computable without IO, which replaces
the reference's GeoTIFF fixtures (cleantopo_*.tif) with a reproducible
source.  A nodata hole is punched where elev < 150 to exercise
masked-array semantics (mapchete/io/raster/array.py:215-266).
"""

from __future__ import annotations

import numpy as np

from mapchete_spark.tilegrid.grid import Bounds
from mapchete_spark.tilegrid.pyramid import Tile

DEM_NODATA = -9999.0
DEM_HOLE_BELOW = 150.0


def elevation(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return (
        500.0
        + 400.0 * np.sin(lon * np.pi / 30.0) * np.cos(lat * np.pi / 20.0)
        + 120.0 * np.sin(lon * np.pi / 3.7) * np.sin(lat * np.pi / 2.9)
    )


def dem_window(bounds: Bounds, shape: tuple, hole: bool = True) -> np.ma.MaskedArray:
    """(1, h, w) masked float32 elevation sampled at pixel centers."""
    h, w = shape
    px = bounds.width / w
    py = bounds.height / h
    xs = bounds.left + (np.arange(w) + 0.5) * px
    ys = bounds.top - (np.arange(h) + 0.5) * py
    gx, gy = np.meshgrid(xs, ys)
    elev = elevation(gx, gy).astype(np.float32)
    mask = (elev < DEM_HOLE_BELOW) if hole else np.zeros_like(elev, dtype=bool)
    out = np.ma.MaskedArray(
        np.where(mask, DEM_NODATA, elev)[np.newaxis],
        mask=mask[np.newaxis],
        fill_value=DEM_NODATA,
    )
    return out


def dem_tile(tile: Tile, pixelbuffer: int = 0, hole: bool = True) -> np.ma.MaskedArray:
    """DEM window for a (possibly buffered) tile."""
    return dem_window(
        tile.bounds(pixelbuffer=pixelbuffer), tile.shape(pixelbuffer=pixelbuffer), hole
    )
