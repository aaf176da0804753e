"""Mosaic: stitch N same-zoom tiles into one referenced array
(mapchete/io/raster/mosaic.py:18-143), including the antimeridian shift
detection (:167-207): if the tiles' column sequence has a gap wider
than the wrap-around distance, the mosaic is assembled in a shifted
frame crossing the antimeridian.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from mapchete_spark.tilegrid.grid import Bounds
from mapchete_spark.tilegrid.pyramid import Tile


def _shift_necessary(tiles: Sequence[Tile]) -> bool:
    """Reference heuristic (mosaic.py:167-207): on a global pyramid,
    compare the direct col-span against the wrapped span; shift when
    wrapping is narrower."""
    pyramid = tiles[0].pyramid
    if not pyramid.is_global:
        return False
    zoom = tiles[0].zoom
    mw = pyramid.matrix_width(zoom)
    cols = sorted({t.col for t in tiles})
    if len(cols) < 2:
        return False
    direct = cols[-1] - cols[0]
    # largest gap in the sorted sequence; wrapping through the gap
    gaps = [(cols[i + 1] - cols[i]) for i in range(len(cols) - 1)]
    max_gap = max(gaps)
    wrapped = mw - max_gap
    return wrapped < direct


def create_mosaic(
    tiles_arrays: Sequence[Tuple[Tile, np.ma.MaskedArray]], nodata: float = 0
) -> Tuple[np.ma.MaskedArray, Bounds]:
    """Place per-tile arrays into one canvas (pure numpy placement,
    mosaic.py:103-117). Returns (mosaic, bounds); bounds may overflow
    the antimeridian when the input tiles wrap."""
    if not tiles_arrays:
        raise ValueError("no tiles given")
    tiles = [t for t, _ in tiles_arrays]
    zoom = tiles[0].zoom
    if any(t.zoom != zoom for t in tiles):
        raise ValueError("all tiles must be of the same zoom level")
    pyramid = tiles[0].pyramid
    mw = pyramid.matrix_width(zoom)
    shift = _shift_necessary(tiles)

    def col_x(t: Tile) -> int:
        # shift low columns past the right edge when wrapping
        if shift and t.col < mw // 2:
            return t.col + mw
        return t.col

    sample_arr = tiles_arrays[0][1]
    bands = sample_arr.shape[0] if sample_arr.ndim == 3 else 1
    dtype = sample_arr.dtype
    th, tw = tiles[0].shape(pixelbuffer=0)

    rows = [t.row for t in tiles]
    xcols = [col_x(t) for t in tiles]
    r0, r1 = min(rows), max(rows)
    c0, c1 = min(xcols), max(xcols)
    height = (r1 - r0 + 1) * th
    width = (c1 - c0 + 1) * tw
    canvas = np.ma.MaskedArray(
        np.full((bands, height, width), nodata, dtype=dtype),
        mask=np.ones((bands, height, width), dtype=bool),
        fill_value=nodata,
    )
    for tile, arr in tiles_arrays:
        a = arr if arr.ndim == 3 else arr[np.newaxis]
        # crop any pixelbuffer down to the unbuffered tile window
        if a.shape[-2:] != (th, tw):
            bh, bw = a.shape[-2:]
            ob = (bh - th) // 2, (bw - tw) // 2
            a = a[:, ob[0] : ob[0] + th, ob[1] : ob[1] + tw]
        ro = (tile.row - r0) * th
        co = (col_x(tile) - c0) * tw
        canvas[:, ro : ro + th, co : co + tw] = a

    # mosaic bounds from corner tiles (x from shifted frame)
    tx = pyramid.tile_x_size(zoom)
    ty = pyramid.tile_y_size(zoom)
    left = pyramid.left + c0 * tx
    right = pyramid.left + (c1 + 1) * tx
    top = pyramid.top - r0 * ty
    bottom = pyramid.top - (r1 + 1) * ty
    return canvas, Bounds(left, bottom, right, top)
