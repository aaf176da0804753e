"""Spatial kNN via tile-ring expansion — the north star's 'kNN
neighbor-tile lookups' as a first-class operator.

The tile grid IS the spatial index: candidates for a query point are
the documents in the tiles within Chebyshev ring r of the query's
tile, found by an equi-join on neighbor tile keys (the same key
arithmetic as the halo exchange, mapchete tile.py:297-320 neighbors).
Rings expand per round — driver-side iteration over the (shrinking)
set of unfinished queries, like the tiledir fallback loop — until the
k-th candidate provably beats anything outside the covered box:

    done(q)  iff  kth_dist(q) <= d_safe(q)

where d_safe is the distance from the query point to the boundary of
the box covered by ring r around its tile. The result is the EXACT
kNN (verified against a brute-force oracle), with per-round cost
O(|remaining| * ring_tiles * docs_per_tile) instead of O(Q * N).

Distances are plain lon/lat Euclidean (no antimeridian wrap), matching
the SQL twin operation-for-operation.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapchete_spark.functions.geo import tile_col_expr, tile_row_expr
from mapchete_spark.tilegrid.pyramid import TilePyramid


def _with_tiles(df: DataFrame, zoom: int, prefix: str = "") -> DataFrame:
    return df.withColumn(
        f"{prefix}tile_row", tile_row_expr(F.col("lat"), zoom)
    ).withColumn(f"{prefix}tile_col", tile_col_expr(F.col("lon"), zoom))


# largest Chebyshev ring expanded via the offsets-table path; above it
# the residual queries fall back to a global broadcast against all
# docs. (2*cap+1)^2 = 4225 offset rows max — at z12 geodetic the old
# unbounded doubling reached a ~2.7e8-row broadcast (driver OOM).
RING_OFFSET_CAP = 32


def _ring_schedule(matrix_height: int, matrix_width: int, cap: int = RING_OFFSET_CAP):
    """Geometric ring growth 1, 2, 4, ... capped at ``cap``.

    Returns (rings, use_global): ``rings`` are the offsets-table
    rounds; ``use_global`` is True when a final brute-force round over
    the residual query set is needed because the grid is wider than
    the largest capped ring covers."""
    full = max(matrix_height, matrix_width)
    rings = []
    ring = 1
    while ring < full and ring <= cap:
        rings.append(ring)
        ring *= 2
    if full <= cap:
        rings.append(full)
        return rings, False
    return rings, True


def spatial_knn_join(
    docs_geo: DataFrame,
    queries: DataFrame,
    k: int = 5,
    zoom: int = 5,
    pyramid: Optional[TilePyramid] = None,
) -> DataFrame:
    """Exact k nearest documents per query point.

    docs_geo: (doc_id, lon, lat); queries: (query_id, lon, lat).
    Returns (query_id, rank, doc_id, dist) with rank 1..k ordered by
    (dist, doc_id); a query matching a doc id does not pair with
    itself."""
    pyr = pyramid or TilePyramid("geodetic")
    ts = pyr.tile_x_size(zoom)
    mh, mw = pyr.matrix_height(zoom), pyr.matrix_width(zoom)
    spark = docs_geo.sparkSession

    docs = _with_tiles(
        docs_geo.select("doc_id", "lon", "lat"), zoom
    ).withColumnRenamed("lon", "d_lon").withColumnRenamed("lat", "d_lat")
    remaining = _with_tiles(
        queries.select("query_id", F.col("lon").alias("q_lon"), F.col("lat").alias("q_lat"))
               .withColumn("lon", F.col("q_lon")).withColumn("lat", F.col("q_lat")),
        zoom, prefix="q_",
    ).select("query_id", "q_lon", "q_lat", "q_tile_row", "q_tile_col")

    dist = (
        (F.col("q_lon") - F.col("d_lon")) * (F.col("q_lon") - F.col("d_lon"))
        + (F.col("q_lat") - F.col("d_lat")) * (F.col("q_lat") - F.col("d_lat"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("doc_id"))

    def rank_topk(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("dist", dist)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

    # geometric ring growth 1, 2, 4, ... capped at RING_OFFSET_CAP;
    # residual queries past the cap go through one global brute-force
    # round (broadcast of the by-then tiny query set against all docs)
    # instead of a grid-sized offsets broadcast.
    rings, use_global = _ring_schedule(mh, mw)

    results = []
    for i, ring in enumerate(rings):
        last = (i == len(rings) - 1) and not use_global
        if remaining.isEmpty():
            break
        offsets = spark.range((2 * ring + 1) ** 2).select(
            (F.col("id") % (2 * ring + 1) - ring).cast("long").alias("dr"),
            (F.col("id") / (2 * ring + 1)).cast("long").alias("dc_raw"),
        ).select("dr", (F.col("dc_raw") - ring).alias("dc"))
        cand = (
            remaining.crossJoin(F.broadcast(offsets))
            .select(
                "query_id", "q_lon", "q_lat", "q_tile_row", "q_tile_col",
                (F.col("q_tile_row") + F.col("dr")).alias("tile_row"),
                # pmod: dc can exceed mw in magnitude on portrait grids
                # (mh > mw), where (x + mw) % mw would go negative and
                # silently drop candidates
                F.pmod(F.col("q_tile_col") + F.col("dc"), F.lit(mw)).alias("tile_col"),
            )
            .where(F.col("tile_row").between(0, mh - 1))
            .join(docs, ["tile_row", "tile_col"])
            .where(F.col("doc_id") != F.col("query_id"))
        )
        if 2 * ring + 1 > mw:
            # the wrapped column range laps the grid: same tile reached
            # twice -> dedup candidates (only possible on the last rings)
            cand = cand.dropDuplicates(["query_id", "doc_id"])
        topk = rank_topk(cand)
        # exactness bound: the k-th distance must beat the distance to
        # the nearest boundary of the ring-covered box (squared metric);
        # topk already carries the query's coords and tile id
        status = topk.groupBy(
            "query_id", "q_tile_row", "q_tile_col", "q_lon", "q_lat"
        ).agg(F.count(F.lit(1)).alias("n_found"), F.max("dist").alias("kth_dist"))
        lb = F.lit(pyr.left) + (F.col("q_tile_col") - ring) * F.lit(ts)
        rb = F.lit(pyr.left) + (F.col("q_tile_col") + ring + 1) * F.lit(ts)
        tb = F.lit(pyr.top) - (F.col("q_tile_row") - ring) * F.lit(ts)
        bb = F.lit(pyr.top) - (F.col("q_tile_row") + ring + 1) * F.lit(ts)
        safe = F.least(
            F.col("q_lon") - lb, rb - F.col("q_lon"),
            tb - F.col("q_lat"), F.col("q_lat") - bb,
        )
        done_q = status.where(
            (F.col("n_found") >= k) & (F.col("kth_dist") <= safe * safe)
        ).select("query_id")
        if last:
            done_q = remaining.select("query_id")
        results.append(topk.join(done_q, "query_id").select(
            "query_id", "rank", "doc_id", "dist"
        ))
        remaining = remaining.join(done_q, "query_id", "left_anti").localCheckpoint()
    if use_global and not remaining.isEmpty():
        # residual round: every query here already searched a
        # (2*cap+1)^2-tile box without settling — brute force the
        # leftovers exactly (broadcast the small query side)
        cand = docs.join(
            F.broadcast(remaining), F.col("doc_id") != F.col("query_id")
        )
        results.append(rank_topk(cand).select("query_id", "rank", "doc_id", "dist"))
    if not results:
        # empty queries input: return an empty frame with the output
        # schema (query_id/doc_id keep their input types)
        from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

        schema = StructType(
            [
                StructField("query_id", remaining.schema["query_id"].dataType),
                StructField("rank", IntegerType()),
                StructField("doc_id", docs.schema["doc_id"].dataType),
                StructField("dist", DoubleType()),
            ]
        )
        return spark.createDataFrame([], schema)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
