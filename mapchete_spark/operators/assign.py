"""Tile assignment — the engine's first real Spark operator.

Replaces the reference's IndexedFeatures rtree + tiles_from_geom scan
planning (mapchete/tile.py:139-147, io/vector/indexed_features.py:49-253)
with declarative DataFrame ops: the tile id IS the partitioning, so the
'spatial index' is an equi-join key (SURVEY.md §1.1 IndexedFeatures row).

Three paths, fastest first:

- ``assign_point_tiles``: pure Column arithmetic (codegen, no shuffle
  until the consumer aggregates).
- ``assign_bbox_tiles``: bbox -> inclusive tile ranges -> explode of a
  ``sequence()`` cross product; still pure built-ins.
- ``assign_geom_tiles_exact``: arbitrary WKB polygons -> covering tiles
  with an exact intersects test, vectorized numpy inside mapInPandas
  (the only Python path, reserved for true polygon inputs).

Skew: low-zoom tiles cover nearly the whole corpus (geodetic zoom 0 has
two tiles).  ``with_salt`` adds a deterministic salt column sized by
zoom so two-phase aggregations can spread hot tiles (SURVEY.md §4
'Skew / shuffle control'; north rule 'salting hot tiles').
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapchete_spark.functions.geo import (
    tile_col_expr,
    tile_key_col,
    tile_row_expr,
)
from mapchete_spark.tilegrid.keys import linear_tile_key


def assign_point_tiles(
    df: DataFrame,
    zooms: Sequence[int],
    lon: str = "lon",
    lat: str = "lat",
    key: bool = True,
) -> DataFrame:
    """One output row per (input row x zoom) with tile (zoom,row,col).

    The zoom fan-out is an ``explode(sequence(...))`` — Catalyst keeps it
    inside one stage; no shuffle is introduced here.
    """
    zmin, zmax = min(zooms), max(zooms)
    out = df.withColumn(
        "zoom", F.explode(F.sequence(F.lit(zmin), F.lit(zmax)))
    )
    if list(zooms) != list(range(zmin, zmax + 1)):
        out = out.where(F.col("zoom").isin(list(zooms)))
    out = out.withColumns(
        {
            "tile_row": tile_row_expr(F.col(lat), F.col("zoom")),
            "tile_col": tile_col_expr(F.col(lon), F.col("zoom")),
        }
    )
    if key:
        out = out.withColumn(
            "tile_key",
            tile_key_col(F.col("zoom"), F.col("tile_row"), F.col("tile_col")),
        )
    return out


def assign_bbox_tiles(
    df: DataFrame,
    zoom: int,
    lon: str = "lon",
    lat: str = "lat",
    radius: str = "radius",
) -> DataFrame:
    """Square-footprint (bbox) cover: explode all tiles whose bounds the
    bbox [lon-r, lat-r, lon+r, lat+r] intersects (clamped to the grid;
    the antimeridian-wrapping variant lives in the exact-geometry path).

    Rows with NULL radius are treated as points (single tile).
    """
    ts = 180.0 / 2**zoom
    mw = 2 ** (zoom + 1)
    mh = 2**zoom
    r = F.coalesce(F.col(radius), F.lit(0.0))
    left = F.greatest(F.col(lon) - r, F.lit(-180.0))
    right = F.least(F.col(lon) + r, F.lit(180.0))
    bottom = F.greatest(F.col(lat) - r, F.lit(-90.0))
    top = F.least(F.col(lat) + r, F.lit(90.0))

    c0 = F.least(
        F.greatest(F.floor((left + 180.0) / ts).cast("long"), F.lit(0).cast("long")),
        F.lit(mw - 1).cast("long"),
    )
    c1 = F.least(
        F.greatest(
            (F.ceil((right + 180.0) / ts) - 1).cast("long"), F.lit(0).cast("long")
        ),
        F.lit(mw - 1).cast("long"),
    )
    r0 = F.least(
        F.greatest(F.floor((90.0 - top) / ts).cast("long"), F.lit(0).cast("long")),
        F.lit(mh - 1).cast("long"),
    )
    r1 = F.least(
        F.greatest(
            (F.ceil((90.0 - bottom) / ts) - 1).cast("long"), F.lit(0).cast("long")
        ),
        F.lit(mh - 1).cast("long"),
    )
    # degenerate ranges (ceil-1 < floor on zero-width bbox) collapse to
    # the containing tile
    c1 = F.greatest(c1, c0)
    r1 = F.greatest(r1, r0)
    return (
        df.withColumn("zoom", F.lit(zoom))
        .withColumn("tile_row", F.explode(F.sequence(r0, r1)))
        .withColumn("tile_col", F.explode(F.sequence(c0, c1)))
        .withColumn(
            "tile_key",
            tile_key_col(F.col("zoom"), F.col("tile_row"), F.col("tile_col")),
        )
    )


def assign_geom_tiles_exact(
    df: DataFrame,
    zoom: int,
    wkb_col: str = "geometry",
    pyramid=None,
    id_cols: Iterable[str] = ("doc_id",),
) -> DataFrame:
    """Exact polygon cover via mapInPandas: per Arrow batch, decode WKB,
    enumerate bbox candidate tiles (numpy), keep tiles passing the true
    geometry intersects test (mapchete tiles_from_geom(exact=True),
    tile.py:139-147). Python path — only for real polygon inputs."""
    from mapchete_spark.tilegrid import TilePyramid
    from mapchete_spark.tilegrid.cover import tiles_from_geom
    from mapchete_spark.geometry.wkb import from_wkb

    pyr = pyramid or TilePyramid("geodetic")
    id_cols = list(id_cols)
    schema_fields = df.select(*id_cols).schema.fields
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_fields)
        + ", zoom int, tile_row long, tile_col long, tile_key long"
    )

    def gen(batches):
        for pdf in batches:
            rows = {c: [] for c in id_cols}
            zs, rs, cs = [], [], []
            for i in range(len(pdf)):
                geom = from_wkb(pdf[wkb_col].iloc[i])
                for t in tiles_from_geom(pyr, geom, zoom, exact=True):
                    for c in id_cols:
                        rows[c].append(pdf[c].iloc[i])
                    zs.append(t.zoom)
                    rs.append(t.row)
                    cs.append(t.col)
            out = pd.DataFrame(rows)
            out["zoom"] = pd.Series(zs, dtype="int32")
            out["tile_row"] = pd.Series(rs, dtype="int64")
            out["tile_col"] = pd.Series(cs, dtype="int64")
            out["tile_key"] = linear_tile_key(
                np.asarray(zs, dtype=np.int64),
                np.asarray(rs, dtype=np.int64),
                np.asarray(cs, dtype=np.int64),
            )
            yield out

    return df.select(*id_cols, wkb_col).mapInPandas(gen, schema=out_schema)


# ---- skew control ------------------------------------------------------------

DEFAULT_SALT_ZOOM_THRESHOLD = 6
DEFAULT_SALT_BUCKETS = 32


def salt_buckets_for_zoom(zoom_col: Column, buckets: int = DEFAULT_SALT_BUCKETS,
                          threshold: int = DEFAULT_SALT_ZOOM_THRESHOLD) -> Column:
    """Salt bucket count per zoom: low zooms (few, huge tiles) get the
    full bucket fan-out, high zooms get 1 (no salting needed)."""
    return F.when(zoom_col <= threshold, F.lit(buckets)).otherwise(F.lit(1))


def with_salt(
    df: DataFrame,
    salt_source: str = "doc_id",
    zoom_col: str = "zoom",
    buckets: int = DEFAULT_SALT_BUCKETS,
    threshold: int = DEFAULT_SALT_ZOOM_THRESHOLD,
) -> DataFrame:
    """Deterministic salt in [0, buckets) for low zooms, 0 above the
    threshold. Two-phase aggregations group by (tile_key, salt) first,
    then by tile_key."""
    n = salt_buckets_for_zoom(F.col(zoom_col), buckets, threshold)
    return df.withColumn(
        "salt", (F.abs(F.hash(F.col(salt_source))) % n).cast("int")
    )
