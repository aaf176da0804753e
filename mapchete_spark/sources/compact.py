"""Tile-table compaction — the small-files maintenance rewrite.

Incremental jobs (continue-mode appends, streaming micro-batches,
overview refreshes) each append their own parquet files; at 100-TB
scale a tile table accumulates orders of magnitude more files than
optimal and every scan pays the per-file open cost (the problem
Iceberg's rewrite-data-files action exists for). ``compact_tile_table``
rewrites the table with a bounded target of rows per file while
PRESERVING the physical layout contract (partitioned by zoom, rows in
z-order inside each file — the layout `plans/job.py` writes and
`sources/serve.py` point-lookups depend on), then swaps the rewrite in
crash-safely (the jobs/rm.py aside-rename pattern: at any instant
either the old or the new table is intact on disk).

Shuffle shape: one range-exchange on the z-order key per zoom —
repartitionByRange both bounds the output file count and keeps each
file a contiguous morton range, so parquet row-group min/max pruning
works across files as well as within them.
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Optional

from pyspark.sql import SparkSession, functions as F

from mapchete_spark.functions.geo import zorder_key_col

DEFAULT_TARGET_ROWS = 4096


def parquet_file_count(tiles_path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(tiles_path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_tile_table(
    spark: SparkSession,
    tiles_path: str,
    target_rows_per_file: int = DEFAULT_TARGET_ROWS,
    zooms: Optional[list] = None,
) -> dict:
    """Rewrite ``tiles_path`` with ~``target_rows_per_file`` rows per
    parquet file (per zoom), z-order-contiguous files, atomic swap.
    Returns {"files_before", "files_after", "rows"}."""
    tiles = spark.read.parquet(tiles_path)
    if zooms is not None:
        tiles = tiles.where(F.col("zoom").isin([int(z) for z in zooms]))
    files_before = parquet_file_count(tiles_path)
    zkey = zorder_key_col(F.col("zoom"), F.col("tile_row"), F.col("tile_col"))
    counts = {
        int(r["zoom"]): int(r["n"])
        for r in tiles.groupBy("zoom").agg(F.count("*").alias("n")).collect()
    }
    tmp = tiles_path + "__compact"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    total = 0
    for zoom, n in sorted(counts.items()):
        total += n
        n_files = max(1, math.ceil(n / target_rows_per_file))
        zdf = tiles.where(F.col("zoom") == zoom)
        (
            zdf.repartitionByRange(n_files, zkey)
            .sortWithinPartitions(zkey)
            .write.mode("append")
            .partitionBy("zoom")
            .parquet(tmp)
        )
    if zooms is None:
        # Full rewrite: swap the whole table root.
        old = tiles_path + "__old"
        if os.path.exists(old):
            shutil.rmtree(old)
        shutil.move(tiles_path, old)
        shutil.move(tmp, tiles_path)
        shutil.rmtree(old)
    else:
        # Partial rewrite: only the requested zoom partitions were
        # written to tmp — swap each zoom=<z> subdirectory in place and
        # leave every other zoom's partition untouched (a whole-root
        # swap here would silently delete the unlisted zooms).
        #
        # The displaced partition is staged under an UNDERSCORE-prefixed
        # name WITHOUT '=' (`_old_zoom_<z>`): Spark/Hive partition
        # discovery hides `_`-prefixed entries ONLY when the name has
        # no '=' (names containing '=' are parsed as partition dirs
        # regardless — a stranded `zoom=<z>__old` or `_old_zoom=<z>`
        # raises CONFLICTING_PARTITION_COLUMN_NAMES for the whole
        # table). With this name, dying inside the swap window leaves
        # the table readable: the crash window is per-zoom (between
        # the two moves that zoom's rows live only in the staged dir);
        # recovery is moving the staged dir back — data is never
        # deleted until the new partition is in place.
        for zoom in sorted(counts.items()):
            zdir = f"zoom={zoom[0]}"
            src = os.path.join(tmp, zdir)
            dst = os.path.join(tiles_path, zdir)
            old = os.path.join(tiles_path, f"_old_zoom_{zoom[0]}")
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(dst):
                shutil.move(dst, old)
            shutil.move(src, dst)
            if os.path.exists(old):
                shutil.rmtree(old)
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(tiles_path),
        "rows": total,
    }
