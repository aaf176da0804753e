"""Process-tile -> output-tile split (Z4 / S5 semantics).

The reference allows output metatiling < process metatiling: one
process (meta)tile's array is cut into the intersecting smaller output
tiles at write time (mapchete/formats/default/gtiff.py:370-382 via
extract_subset, formats/base.py:236-265).

Spark shape: a narrow mapInPandas explode — each process-tile row
emits its output-tile windows by pure numpy slicing; no shuffle at all
(output tiles nest exactly inside process tiles on the dyadic grid).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from mapchete_spark.operators.rastertable import (
    RASTER_SCHEMA,
    decode_array,
    encode_array,
)
from mapchete_spark.raster.array import extract_from_array
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid
from mapchete_spark.tilegrid.keys import linear_tile_key


def split_to_output_tiles(
    process_tiles: DataFrame,
    process_pyramid: TilePyramid,
    output_pyramid: TilePyramid,
) -> DataFrame:
    """Cut process-tile arrays into the output pyramid's tiles.

    Requires output metatiling <= process metatiling (validated by the
    config layer, mapchete/config/base.py:171-174) and both pyramids on
    the same grid. Input arrays must be unbuffered.
    """
    if output_pyramid.metatiling > process_pyramid.metatiling:
        raise ValueError("output metatiling must be <= process metatiling")
    if output_pyramid.grid != process_pyramid.grid:
        raise ValueError("process and output pyramids must share a grid")
    p_dict = process_pyramid.to_dict()
    o_dict = output_pyramid.to_dict()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pp = TilePyramid(**p_dict)
        op = TilePyramid(**o_dict)
        for pdf in batches:
            out = {k: [] for k in (
                "zoom", "tile_row", "tile_col", "tile_key", "bands",
                "height", "width", "dtype", "nodata", "data",
            )}
            for z, trow, tcol, rdata, rdtype, rbands, rh, rw, rnodata in zip(
                pdf["zoom"].values, pdf["tile_row"].values, pdf["tile_col"].values,
                pdf["data"].values, pdf["dtype"].values, pdf["bands"].values,
                pdf["height"].values, pdf["width"].values, pdf["nodata"].values,
            ):
                ptile = Tile(pp, int(z), int(trow), int(tcol))
                arr = decode_array(
                    rdata, rdtype, int(rbands), int(rh), int(rw), float(rnodata)
                )
                pbounds = ptile.bounds(pixelbuffer=0)
                for otile in op.tiles_from_bounds(pbounds, int(z)):
                    window = extract_from_array(arr, pbounds, otile.bounds())
                    if isinstance(window, np.ma.MaskedArray) and window.mask.all():
                        continue  # write-skip on empty output tile
                    data, dtype, bands, h, w = encode_array(window, float(rnodata))
                    out["zoom"].append(otile.zoom)
                    out["tile_row"].append(otile.row)
                    out["tile_col"].append(otile.col)
                    out["tile_key"].append(
                        linear_tile_key(otile.zoom, otile.row, otile.col)
                    )
                    out["bands"].append(bands)
                    out["height"].append(h)
                    out["width"].append(w)
                    out["dtype"].append(dtype)
                    out["nodata"].append(float(rnodata))
                    out["data"].append(data)
            yield pd.DataFrame(out)

    return process_tiles.mapInPandas(gen, schema=RASTER_SCHEMA)
