#!/usr/bin/env python
"""Delete a tile subset from an output ('mapchete rm' analog).

Parquet tables have no in-place delete: the kept subset is rewritten
atomically (write new table, swap directories).

    spark-submit jobs/rm.py OUTPUT --zoom Z [--bounds L B R T] [--force]
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
    ap.add_argument("--zoom", type=int, nargs="*", required=True)
    ap.add_argument("--bounds", type=float, nargs=4, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapchete_spark.session import get_spark, stop_unless_kept
    from mapchete_spark.tilegrid.grid import Bounds
    from mapchete_spark.tilegrid.pyramid import TilePyramid

    spark = get_spark("mapchete_spark:rm")
    tiles_path = os.path.join(args.output, "tiles")
    old_path = tiles_path + "__old"
    if not os.path.exists(tiles_path) and os.path.exists(old_path):
        # recover from a crash between the aside-rename and the final
        # move: the pre-rewrite table is intact under tiles__old
        shutil.move(old_path, tiles_path)
    tiles = spark.read.parquet(tiles_path)

    drop = F.col("zoom").isin(args.zoom)
    if args.bounds:
        with open(os.path.join(args.output, "metadata.json")) as f:
            meta = json.load(f)
        pyr = TilePyramid(**meta["pyramid"])
        b = Bounds(*args.bounds)
        cond = None
        for z in args.zoom:
            for (r0, r1, c0, c1) in pyr.tile_ranges_from_bounds(b, z):
                c = ((F.col("zoom") == z)
                     & F.col("tile_row").between(r0, r1)
                     & F.col("tile_col").between(c0, c1))
                cond = c if cond is None else (cond | c)
        drop = cond if cond is not None else F.lit(False)

    keep = tiles.where(~drop).cache()
    n_keep = keep.count()
    n_dropped = tiles.count() - n_keep
    tmp = tiles_path + "__rewrite"
    keep.write.mode("overwrite").partitionBy("zoom").parquet(tmp)
    keep.unpersist()
    # never leave a window with NO tiles directory: rename the old
    # table aside, move the rewrite into place, only then delete the
    # old copy (a crash at any point leaves either the old or the new
    # table recoverable; see the startup recovery above)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    shutil.move(tiles_path, old_path)
    shutil.move(tmp, tiles_path)
    shutil.rmtree(old_path)
    print(json.dumps({"status": "done", "tiles_removed": n_dropped, "tiles_kept": n_keep}))
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
