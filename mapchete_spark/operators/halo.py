"""Pixelbuffer halo exchange — buffered reads as an 8-neighbor self-join.

The reference reads each buffered tile window directly from the source
raster (mapchete/io/raster/read.py:58-206, buffer semantics
tile.py:260-272).  In the engine the raster lives as a tile table, so a
buffered read becomes a shuffle: every tile mails the <= pixelbuffer-wide
edge strips its neighbors need (keyed by the NEIGHBOR's tile key), and a
groupBy(target) assembles the buffered array — shuffling only
O(pixelbuffer * tile_edge) bytes per neighbor instead of whole tiles
(SURVEY.md §7 step 6).

Antimeridian: strips wrap across the x edge on global grids (the
reference splits such reads into up to 3 parts and stitches,
io/raster/read.py:168-183,209-258 — here the wrap is just modular key
arithmetic).  North/south: no neighbors beyond the pole rows; the
buffered window is clipped there exactly like Tile.bounds/shape.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapchete_spark.operators.rastertable import (
    RASTER_SCHEMA,
    decode_array,
    encode_array,
)
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid

_PART_SCHEMA = (
    "target_key long, zoom int, tile_row long, tile_col long, "
    "src_dr int, src_dc int, bands int, height int, width int, "
    "dtype string, nodata double, data binary"
)


def add_buffers(
    tiles: DataFrame, pyramid: TilePyramid, pixelbuffer: int
) -> DataFrame:
    """Tile raster table -> same table with each tile's array replaced by
    its pixel-buffered window (shape per Tile.shape(pixelbuffer))."""
    if pixelbuffer <= 0:
        return tiles
    pyr_dict = pyramid.to_dict()
    pb = int(pixelbuffer)

    def emit_parts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = TilePyramid(**pyr_dict)
        for pdf in batches:
            rows = {k: [] for k in (
                "target_key", "zoom", "tile_row", "tile_col", "src_dr", "src_dc",
                "bands", "height", "width", "dtype", "nodata", "data",
            )}
            for _, r in pdf.iterrows():
                z, row, col = int(r["zoom"]), int(r["tile_row"]), int(r["tile_col"])
                me = Tile(p, z, row, col)
                arr = decode_array(
                    r["data"], r["dtype"], int(r["bands"]), int(r["height"]),
                    int(r["width"]), float(r["nodata"]),
                )
                mh = p.matrix_height(z)
                mw = p.matrix_width(z)
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        tr = row + dr
                        tc = col + dc
                        if tr < 0 or tr >= mh:
                            continue
                        if tc < 0 or tc >= mw:
                            if p.is_global:
                                tc %= mw
                            else:
                                continue
                        # strip of MY array the target needs:
                        # target is at offset (dr, dc); it needs my side
                        # facing it: dr=+1 -> my bottom rows, etc.
                        rs = slice(None) if dr == 0 else (
                            slice(-pb, None) if dr == 1 else slice(0, pb)
                        )
                        cs = slice(None) if dc == 0 else (
                            slice(-pb, None) if dc == 1 else slice(0, pb)
                        )
                        piece = arr[:, rs, cs] if (dr or dc) else arr
                        data, dtype, bands, h, w = encode_array(
                            piece, float(r["nodata"])
                        )
                        rows["target_key"].append((z << 54) | (tr << 27) | tc)
                        rows["zoom"].append(z)
                        rows["tile_row"].append(row)
                        rows["tile_col"].append(col)
                        rows["src_dr"].append(dr)
                        rows["src_dc"].append(dc)
                        rows["bands"].append(bands)
                        rows["height"].append(h)
                        rows["width"].append(w)
                        rows["dtype"].append(dtype)
                        rows["nodata"].append(float(r["nodata"]))
                        rows["data"].append(data)
            yield pd.DataFrame(rows)

    parts = tiles.mapInPandas(emit_parts, schema=_PART_SCHEMA)

    def assemble(key: Tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        p = TilePyramid(**pyr_dict)
        target_key = int(key[0])
        z = target_key >> 54
        trow = (target_key >> 27) & ((1 << 27) - 1)
        tcol = target_key & ((1 << 27) - 1)
        me = Tile(p, int(z), int(trow), int(tcol))
        bh, bw = me.shape(pixelbuffer=pb)
        th, tw = me.shape(pixelbuffer=0)
        # rows added above = pb unless clipped at the north pyramid edge;
        # derive from the buffered vs unbuffered bounds
        bb = me.bounds(pixelbuffer=pb)
        tb = me.bounds(pixelbuffer=0)
        py_sz = me.pixel_y_size
        up = int(round((bb.top - tb.top) / py_sz))
        sample = pdf.iloc[0]
        nodata = float(sample["nodata"])
        bands = int(sample["bands"])
        dtype = sample["dtype"]
        canvas = np.full((bands, bh, bw), nodata, dtype=dtype)
        for _, r in pdf.iterrows():
            piece = np.frombuffer(r["data"], dtype=r["dtype"]).reshape(
                int(r["bands"]), int(r["height"]), int(r["width"])
            )
            dr, dc = -int(r["src_dr"]), -int(r["src_dc"])
            # piece from neighbor at relative position (dr, dc) of me
            if dr == 0:
                r0 = up
            elif dr == -1:  # neighbor above: goes into the top strip
                r0 = up - piece.shape[1]
            else:  # neighbor below
                r0 = up + th
            if dc == 0:
                c0 = pb
            elif dc == -1:
                c0 = pb - piece.shape[2]
            else:
                c0 = pb + tw
            r0c = max(r0, 0)
            c0c = max(c0, 0)
            r1c = min(r0 + piece.shape[1], bh)
            c1c = min(c0 + piece.shape[2], bw)
            if r1c <= r0c or c1c <= c0c:
                continue
            canvas[:, r0c:r1c, c0c:c1c] = piece[
                :, r0c - r0 : r1c - r0, c0c - c0 : c1c - c0
            ]
        data = canvas.tobytes()
        return pd.DataFrame(
            {
                "zoom": [int(z)],
                "tile_row": [int(trow)],
                "tile_col": [int(tcol)],
                "tile_key": [target_key],
                "bands": [bands],
                "height": [bh],
                "width": [bw],
                "dtype": [dtype],
                "nodata": [nodata],
                "data": [data],
            }
        )

    return parts.groupBy("target_key").applyInPandas(assemble, schema=RASTER_SCHEMA)
