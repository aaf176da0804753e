#!/usr/bin/env python
"""spark-submit entry point: per-zoom tile index of a job output
(the 'mapchete index' analog, SURVEY.md §2.7 J8)."""

from __future__ import annotations

import argparse
import os
import sys

# allow running directly / via spark-submit without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_path")
    ap.add_argument("--zoom", type=int, required=True)
    ap.add_argument("--dest", default=None, help="write index parquet here")
    args = ap.parse_args()

    from mapchete_spark.plans.job import tile_index
    from mapchete_spark.session import get_spark, stop_unless_kept

    spark = get_spark("mapchete_spark:index")
    idx = tile_index(spark, args.out_path, args.zoom)
    if args.dest:
        idx.write.mode("overwrite").parquet(args.dest)
        print(f"wrote {idx.count()} index rows to {args.dest}")
    else:
        idx.show(50, truncate=False)
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
