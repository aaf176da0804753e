#!/usr/bin/env python
"""Compact a tile table's parquet files (small-files maintenance).

Rewrites the table to a bounded rows-per-file target per zoom with
z-order-contiguous files and a crash-safe directory swap (see
mapchete_spark/sources/compact.py).

    spark-submit jobs/compact.py OUTPUT [--target-rows N] [--zoom Z ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--target-rows", type=int, default=None)
    ap.add_argument("--zoom", type=int, nargs="*", default=None)
    args = ap.parse_args()

    from mapchete_spark.session import get_spark, stop_unless_kept
    from mapchete_spark.sources.compact import (
        DEFAULT_TARGET_ROWS,
        compact_tile_table,
    )

    spark = get_spark("mapchete_spark:compact")
    tiles_path = os.path.join(args.output, "tiles")
    old_path = tiles_path + "__old"
    if not os.path.exists(tiles_path) and os.path.exists(old_path):
        # crash recovery: the pre-rewrite table is intact under __old
        shutil.move(old_path, tiles_path)
    stats = compact_tile_table(
        spark,
        tiles_path,
        target_rows_per_file=args.target_rows or DEFAULT_TARGET_ROWS,
        zooms=args.zoom,
    )
    print(json.dumps({"status": "done", **stats}))
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
