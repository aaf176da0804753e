#!/usr/bin/env python
"""Copy a tile subset between outputs ('mapchete cp' analog).

    spark-submit jobs/cp.py SRC DST [--zoom Z ...] [--bounds L B R T]
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
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--zoom", type=int, nargs="*", default=None)
    ap.add_argument("--bounds", type=float, nargs=4, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapchete_spark.session import get_spark, stop_unless_kept
    from mapchete_spark.tilegrid.grid import Bounds
    from mapchete_spark.tilegrid.pyramid import TilePyramid

    spark = get_spark("mapchete_spark:cp")
    tiles = spark.read.parquet(os.path.join(args.src, "tiles"))
    if args.zoom:
        tiles = tiles.where(F.col("zoom").isin(args.zoom))
    if args.bounds:
        with open(os.path.join(args.src, "metadata.json")) as f:
            meta = json.load(f)
        pyr = TilePyramid(**meta["pyramid"])
        b = Bounds(*args.bounds)
        cond = None
        zooms = args.zoom or [
            r["zoom"] for r in tiles.select("zoom").distinct().collect()
        ]
        for z in zooms:
            for (r0, r1, c0, c1) in pyr.tile_ranges_from_bounds(b, z):
                c = ((F.col("zoom") == z)
                     & F.col("tile_row").between(r0, r1)
                     & F.col("tile_col").between(c0, c1))
                cond = c if cond is None else (cond | c)
        tiles = tiles.where(cond if cond is not None else F.lit(False))
    n = tiles.count()
    tiles.write.mode("append").partitionBy("zoom").parquet(
        os.path.join(args.dst, "tiles")
    )
    os.makedirs(args.dst, exist_ok=True)
    shutil.copy(
        os.path.join(args.src, "metadata.json"),
        os.path.join(args.dst, "metadata.json"),
    )
    print(json.dumps({"status": "done", "tiles_copied": n}))
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
