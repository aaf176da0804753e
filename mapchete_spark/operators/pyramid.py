"""Pyramid reduction — hierarchical groupBy on parent tile ids.

The reference's baselevels/overviews operator (Z1, SURVEY.md §2.6):
zooms outside the baselevel range are interpolated from the 4 children
(mapchete/processing/tasks.py:378-450).  For aggregate payloads
(counts, sums, sketches) the Spark-native form is an iterative
`groupBy(parent_key)` per zoom, max -> min, each step a single shuffle
of the (already reduced) previous level — NOT a re-scan of the corpus.

Skew note: by the time the rollup reaches the hot low zooms the rows
are already one-per-tile, so the shuffle is tiny; salting is needed in
the FIRST reduction from the corpus (see reduce_docs_to_tiles).
"""

from __future__ import annotations

import re
from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapchete_spark.functions.geo import parent_col, parent_row, tile_key_col
from mapchete_spark.operators.assign import with_salt


def reduce_docs_to_tiles(
    assigned: DataFrame,
    aggs: Dict[str, Column],
    salted: bool = False,
    salt_source: str = "doc_id",
) -> DataFrame:
    """First (widest) reduction: doc-level rows -> one row per tile.

    Default is a plain groupBy: for ALGEBRAIC aggs (count/sum/min/max)
    Spark's map-side partial aggregation already reduces each task's
    output to one row per tile, so a hot tile costs nothing extra and
    salting would only add a shuffle (verified via .explain: the salted
    plan has 3 exchanges vs 2).

    ``salted=True`` enables the two-phase (tile, salt) -> tile pattern
    for HOLISTIC aggs whose partial state is per-row sized
    (collect_list, approx distinct over huge groups) — there the salt
    genuinely spreads a hot tile over many reducers.  All aggs must
    then be mergeable by SUM in the final phase.
    """
    group = ["zoom", "tile_row", "tile_col", "tile_key"]
    if not salted:
        return assigned.groupBy(*group).agg(
            *[v.alias(k) for k, v in aggs.items()]
        )
    partial = (
        with_salt(assigned, salt_source=salt_source)
        .groupBy(*group, "salt")
        .agg(*[v.alias(k) for k, v in aggs.items()])
    )
    # final merge: sums of partials (count -> sum, sum -> sum, min/max ok)
    finals = []
    for k in aggs:
        finals.append(F.sum(F.col(k)).alias(k))
    return partial.groupBy(*group).agg(*finals)


def collect_tile_payloads_salted(
    assigned: DataFrame,
    payload_col: str = "doc_id",
    buckets: int = 32,
    threshold: int = 6,
) -> DataFrame:
    """Salted two-phase HOLISTIC aggregation: per-tile ordered payload
    digest. This is where salting genuinely matters (unlike algebraic
    counts): collect_list state is per-row sized, so a hot low-zoom
    tile would funnel its whole payload through one reducer. Phase 1
    collects per (tile, salt) bucket; phase 2 merges the (few) bucket
    lists per tile, sorts, and digests.

    Output: (zoom, tile_row, tile_col, n_docs, docs_md5) where docs_md5
    = md5 of the comma-joined ascending payload values — matching the
    DuckDB oracle's string_agg(... ORDER BY) digest exactly."""
    phase1 = (
        with_salt(assigned, salt_source=payload_col, buckets=buckets, threshold=threshold)
        .groupBy("zoom", "tile_row", "tile_col", "salt")
        .agg(
            F.sort_array(F.collect_list(F.col(payload_col))).alias("bucket_vals"),
            F.count(F.lit(1)).alias("bucket_n"),
        )
    )
    return (
        phase1.groupBy("zoom", "tile_row", "tile_col")
        .agg(
            F.sum("bucket_n").alias("n_docs"),
            F.md5(
                F.array_join(
                    F.array_sort(F.flatten(F.collect_list("bucket_vals"))), ","
                )
            ).alias("docs_md5"),
        )
    )


def rollup_once(
    tiles: DataFrame, merge_aggs: Dict[str, Column]
) -> DataFrame:
    """Reduce one zoom level to its parents: groupBy(parent id)."""
    z = F.col("zoom") - 1
    return (
        tiles.withColumns(
            {
                "zoom": z,
                "tile_row": parent_row(F.col("tile_row")),
                "tile_col": parent_col(F.col("tile_col")),
            }
        )
        .withColumn(
            "tile_key",
            tile_key_col(F.col("zoom"), F.col("tile_row"), F.col("tile_col")),
        )
        .groupBy("zoom", "tile_row", "tile_col", "tile_key")
        .agg(*[v.alias(k) for k, v in merge_aggs.items()])
    )


#: fully-associative merge aggregates whose chained per-level reduction
#: equals one direct reduction at the target zoom (sum of sums = sum,
#: min of mins = min, max of maxes = max — count is NOT in this set)
_ASSOC_AGG_RE = re.compile(r"^(?:sum|min|max)\(([A-Za-z_][A-Za-z0-9_]*)\)$")


def _collapsible_merge_aggs(merge_aggs: Dict[str, Column]) -> bool:
    """True when every merge agg is sum/min/max of the column it
    aliases back to — the chained-rollup invariant (level k+1 reads the
    column level k wrote), which is exactly the case where the whole
    chain collapses into one groupBy at the target zoom."""
    for name, col in merge_aggs.items():
        m = re.match(r"^Column<'(.*)'>$", str(col))
        expr = m.group(1) if m else str(col)
        m2 = _ASSOC_AGG_RE.match(expr)
        if not m2 or m2.group(1) != name:
            return False
    return True


def rollup_to_zoom(
    base: DataFrame,
    from_zoom: int,
    to_zoom: int,
    merge_aggs: Dict[str, Column],
) -> DataFrame:
    """Single-level result: when every merge agg is a fully associative
    sum/min/max of its own output column, the per-level chain collapses
    into ONE groupBy at the target zoom — ⌊⌊r/2⌋/2⌋ = ⌊r/4⌋ (floor-div
    composition), every intermediate group maps whole into one target
    group, and sum/min/max are associative, so the values, types and
    rows are identical while dz shuffles become one (measured: the
    bench's 12->0 rollup chain spent ~1.3s in 12 tiny sequential
    exchange stages that one groupBy does in one).

    Non-collapsible aggs chain rollup_once without unioning the
    intermediate levels (a union would make Catalyst recompute the
    shared chain prefix once per branch — quadratic work)."""
    assert from_zoom >= to_zoom
    dz = from_zoom - to_zoom
    if dz > 1 and _collapsible_merge_aggs(merge_aggs):
        div = F.lit(2**dz)
        out = base.withColumns(
            {
                "zoom": F.col("zoom") - F.lit(dz),
                "tile_row": F.floor(F.col("tile_row") / div).cast("long"),
                "tile_col": F.floor(F.col("tile_col") / div).cast("long"),
            }
        ).withColumn(
            "tile_key",
            tile_key_col(F.col("zoom"), F.col("tile_row"), F.col("tile_col")),
        )
        return out.groupBy("zoom", "tile_row", "tile_col", "tile_key").agg(
            *[v.alias(k) for k, v in merge_aggs.items()]
        )
    cur = base
    for _ in range(from_zoom, to_zoom, -1):
        cur = rollup_once(cur, merge_aggs)
    return cur


def rollup_pyramid(
    base: DataFrame,
    from_zoom: int,
    to_zoom: int,
    merge_aggs: Dict[str, Column],
    include_base: bool = True,
) -> DataFrame:
    """Roll a single-zoom tile table up from ``from_zoom`` down to
    ``to_zoom`` (inclusive), unioning all levels.

    Mirrors the reference's zoom-descending batch order
    (mapchete/processing/base.py:799-845): each level is computed from
    the previous one (4 children -> 1 parent), one narrow shuffle per
    level over already-reduced data.
    """
    assert from_zoom >= to_zoom
    levels: List[DataFrame] = [base] if include_base else []
    cur = base
    for _ in range(from_zoom, to_zoom, -1):
        cur = rollup_once(cur, merge_aggs)
        levels.append(cur)
    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out
