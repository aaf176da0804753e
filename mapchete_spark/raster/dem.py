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

# analytic-field constants — shared with the DuckDB SQL twins
# (functions/rastersql.py), so the oracle cannot drift
DEM_BASE = 500.0
DEM_AMP1 = 400.0
DEM_LON_P1 = 30.0
DEM_LAT_P1 = 20.0
DEM_AMP2 = 120.0
DEM_LON_P2 = 3.7
DEM_LAT_P2 = 2.9


def elevation(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return (
        DEM_BASE
        + DEM_AMP1 * np.sin(lon * np.pi / DEM_LON_P1) * np.cos(lat * np.pi / DEM_LAT_P1)
        + DEM_AMP2 * np.sin(lon * np.pi / DEM_LON_P2) * np.sin(lat * np.pi / DEM_LAT_P2)
    )


def elevation_grid(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """elevation() evaluated on the separable grid xs (lon) x ys (lat):
    the field is a sum of lon-term x lat-term products, so the trig runs
    over O(h + w) samples and the grid is two outer products — ~20x
    cheaper than evaluating the full meshgrid."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return (
        DEM_BASE
        + DEM_AMP1 * np.outer(np.cos(ys * np.pi / DEM_LAT_P1), np.sin(xs * np.pi / DEM_LON_P1))
        + DEM_AMP2 * np.outer(np.sin(ys * np.pi / DEM_LAT_P2), np.sin(xs * np.pi / DEM_LON_P2))
    )


def dem_window(
    bounds: Bounds, shape: tuple, hole: bool = True, crs: str = "EPSG:4326"
) -> np.ma.MaskedArray:
    """(1, h, w) masked float32 elevation sampled at pixel centers.

    The analytic field is defined in lon/lat; windows on other grids
    (e.g. the mercator F4 fixture) sample the SAME field through the
    closed-form inverse transform, so cross-pyramid reads agree."""
    h, w = shape
    px = bounds.width / w
    py = bounds.height / h
    xs = bounds.left + (np.arange(w) + 0.5) * px
    ys = bounds.top - (np.arange(h) + 0.5) * py
    if crs != "EPSG:4326":
        from mapchete_spark.geometry.reproject import get_transform

        # mercator<->geodetic is axis-separable, so the 1D axes stay 1D
        f = get_transform(crs, "EPSG:4326")
        xs, _ = f(xs, np.zeros_like(xs))
        _, ys = f(np.zeros_like(ys), ys)
    elev = elevation_grid(xs, ys).astype(np.float32)
    if hole:
        mask = elev < DEM_HOLE_BELOW
        data = np.where(mask, DEM_NODATA, elev)[np.newaxis]
        return np.ma.MaskedArray(data, mask=mask[np.newaxis], fill_value=DEM_NODATA)
    return np.ma.MaskedArray(
        elev[np.newaxis], mask=np.ma.nomask, fill_value=DEM_NODATA
    )


def dem_tile(tile: Tile, pixelbuffer: int = 0, hole: bool = True) -> np.ma.MaskedArray:
    """DEM window for a (possibly buffered) tile, in the tile's CRS."""
    return dem_window(
        tile.bounds(pixelbuffer=pixelbuffer),
        tile.shape(pixelbuffer=pixelbuffer),
        hole,
        crs=tile.pyramid.crs,
    )
