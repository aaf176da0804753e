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
    px = pyramid.pixel_x_size(zoom)
    py = pyramid.pixel_y_size(zoom)

    # mosaic bounds from the corner tiles' FULL (uncropped) lattice
    # positions; edge metatiles may be cropped smaller than (th, tw),
    # so each array is placed by its own tile bounds instead of assuming
    # a uniform shape (the reference places via bounds,
    # mapchete/io/raster/mosaic.py:103-117)
    tx = pyramid.tile_x_size(zoom)
    ty = pyramid.tile_y_size(zoom)
    rows = [t.row for t in tiles]
    xcols = [col_x(t) for t in tiles]
    r0, r1 = min(rows), max(rows)
    c0, c1 = min(xcols), max(xcols)
    left = pyramid.left + c0 * tx
    top = pyramid.top - r0 * ty
    right = pyramid.left + (c1 + 1) * tx
    bottom = pyramid.top - (r1 + 1) * ty
    # clip the canvas to the pyramid bounds on the y axis (cropped edge
    # metatiles never extend below pyramid.bottom)
    bottom = max(bottom, pyramid.bottom)
    height = int(round((top - bottom) / py))
    width = int(round((right - left) / px))
    bounds = Bounds(left, bottom, right, top)
    canvas = np.ma.MaskedArray(
        np.full((bands, height, width), nodata, dtype=dtype),
        mask=np.ones((bands, height, width), dtype=bool),
        fill_value=nodata,
    )
    for tile, arr in tiles_arrays:
        a = arr if arr.ndim == 3 else arr[np.newaxis]
        th_i, tw_i = tile.shape(pixelbuffer=0)
        # crop any pixelbuffer down to the unbuffered tile window (the
        # y offset is derived from bounds: the buffer may be clipped at
        # the north pyramid edge)
        if a.shape[-2:] != (th_i, tw_i):
            bh, bw = a.shape[-2:]
            pb = (bw - tw_i) // 2
            bb = tile.bounds(pixelbuffer=pb)
            tb = tile.bounds(pixelbuffer=0)
            up = int(round((bb.top - tb.top) / py))
            a = a[:, up : up + th_i, pb : pb + tw_i]
        tb = tile.bounds(pixelbuffer=0)
        shift_x = pyramid.grid.x_size if (shift and tile.col < mw // 2) else 0.0
        ro = int(round((top - tb.top) / py))
        co = int(round((tb.left + shift_x - left) / px))
        canvas[:, ro : ro + th_i, co : co + tw_i] = a

    return canvas, bounds
