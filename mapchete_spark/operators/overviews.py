"""Array-payload pyramid reduction (Z1 'baselevels/overviews').

Lower-zoom overview tiles are interpolated from their 4 children:
mosaic the child arrays and resample onto the parent grid
(mapchete/processing/tasks.py:378-450, lower path :408-448; default
resampling 'nearest', config/base.py:535-536).  Spark shape: one
``groupBy(parent_key).applyInPandas`` per zoom step, iterating
max -> min (the reference's zoom-descending batches,
processing/base.py:799-845); each step shuffles only the previous
level's tiles.

The higher-zoom path (children from parent, tasks.py:398-406) is
``overview_upsample`` — a per-row mapInPandas explode (parent ->
4 children), no shuffle at all.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapchete_spark.operators.rastertable import (
    RASTER_SCHEMA,
    decode_array,
    encode_array,
)
from mapchete_spark.raster.array import resample_from_array
from mapchete_spark.raster.mosaic import create_mosaic
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid
from mapchete_spark.tilegrid.keys import linear_tile_key, split_linear_tile_key
from mapchete_spark.functions.geo import parent_tile_key_col


def overview_reduce_once(
    tiles: DataFrame, pyramid: TilePyramid, resampling: str = "nearest"
) -> DataFrame:
    """One pyramid step: children at zoom z -> parents at zoom z-1."""
    pyr_dict = pyramid.to_dict()

    with_parent = tiles.withColumn(
        "parent_key",
        parent_tile_key_col(
            F.col("zoom"), F.col("tile_row"), F.col("tile_col")
        ),
    )

    def reduce_group(key: Tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        p = TilePyramid(**pyr_dict)
        parent_key = int(key[0])
        z, prow, pcol = split_linear_tile_key(parent_key)
        parent = Tile(p, int(z), int(prow), int(pcol))
        children_arrays = []
        for cz, crow, ccol, rdata, rdtype, rbands, rh, rw, rnodata in zip(
            pdf["zoom"].values, pdf["tile_row"].values, pdf["tile_col"].values,
            pdf["data"].values, pdf["dtype"].values, pdf["bands"].values,
            pdf["height"].values, pdf["width"].values, pdf["nodata"].values,
        ):
            t = Tile(p, int(cz), int(crow), int(ccol))
            arr = decode_array(
                rdata, rdtype, int(rbands), int(rh), int(rw), float(rnodata)
            )
            children_arrays.append((t, arr))
        nodata = float(pdf.iloc[0]["nodata"])
        mosaic, mbounds = create_mosaic(children_arrays, nodata=nodata)
        out = resample_from_array(
            mosaic,
            mbounds,
            parent.bounds(pixelbuffer=0),
            parent.shape(pixelbuffer=0),
            resampling=resampling,
            nodata=nodata,
        )
        data, dtype, bands, h, w = encode_array(out, nodata)
        return pd.DataFrame(
            {
                "zoom": [int(z)],
                "tile_row": [int(prow)],
                "tile_col": [int(pcol)],
                "tile_key": [parent_key],
                "bands": [bands],
                "height": [h],
                "width": [w],
                "dtype": [dtype],
                "nodata": [nodata],
                "data": [data],
            }
        )

    return with_parent.groupBy("parent_key").applyInPandas(
        reduce_group, schema=RASTER_SCHEMA
    )


def build_overviews(
    base_tiles: DataFrame,
    pyramid: TilePyramid,
    base_zoom: int,
    min_zoom: int,
    resampling: str = "nearest",
) -> List[Tuple[int, DataFrame]]:
    """All overview levels from base_zoom-1 down to min_zoom.
    Returns [(zoom, DataFrame), ...]; caller persists/writes each level
    (one Spark action per zoom = the reference's batch order)."""
    out: List[Tuple[int, DataFrame]] = []
    cur = base_tiles
    for z in range(base_zoom - 1, min_zoom - 1, -1):
        cur = overview_reduce_once(cur, pyramid, resampling=resampling)
        out.append((z, cur))
    return out


def overview_upsample(
    parents: DataFrame, pyramid: TilePyramid, resampling: str = "nearest"
) -> DataFrame:
    """Higher-zoom interpolation: each parent tile emits its 4 children
    resampled from the parent window (tasks.py:398-406). Narrow
    (no-shuffle) explode."""
    pyr_dict = pyramid.to_dict()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = TilePyramid(**pyr_dict)
        for pdf in batches:
            out = {k: [] for k in (
                "zoom", "tile_row", "tile_col", "tile_key", "bands",
                "height", "width", "dtype", "nodata", "data",
            )}
            for pz, prow, pcol, rdata, rdtype, rbands, rh, rw, rnodata in zip(
                pdf["zoom"].values, pdf["tile_row"].values, pdf["tile_col"].values,
                pdf["data"].values, pdf["dtype"].values, pdf["bands"].values,
                pdf["height"].values, pdf["width"].values, pdf["nodata"].values,
            ):
                parent = Tile(p, int(pz), int(prow), int(pcol))
                arr = decode_array(
                    rdata, rdtype, int(rbands), int(rh), int(rw), float(rnodata)
                )
                nodata = float(rnodata)
                for child in parent.get_children():
                    sub = resample_from_array(
                        arr,
                        parent.bounds(pixelbuffer=0),
                        child.bounds(pixelbuffer=0),
                        child.shape(pixelbuffer=0),
                        resampling=resampling,
                        nodata=nodata,
                    )
                    data, dtype, bands, h, w = encode_array(sub, nodata)
                    out["zoom"].append(child.zoom)
                    out["tile_row"].append(child.row)
                    out["tile_col"].append(child.col)
                    out["tile_key"].append(
                        linear_tile_key(child.zoom, child.row, child.col)
                    )
                    out["bands"].append(bands)
                    out["height"].append(h)
                    out["width"].append(w)
                    out["dtype"].append(dtype)
                    out["nodata"].append(nodata)
                    out["data"].append(data)
            yield pd.DataFrame(out)

    return parents.mapInPandas(gen, schema=RASTER_SCHEMA)
