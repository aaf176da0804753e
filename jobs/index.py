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
    ap.add_argument(
        "--geojson", action="store_true",
        help="also write a {zoom}.geojson footprint index (reference: "
        "mapchete index --geojson)",
    )
    ap.add_argument(
        "--gpkg", action="store_true",
        help="also write a {zoom}.gpkg footprint index (reference: "
        "mapchete index --gpkg, index.py:60-100)",
    )
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
    if args.geojson or args.gpkg:
        idx_rows = idx.collect()
        out_dir = args.dest or args.out_path
        os.makedirs(out_dir, exist_ok=True)
        if args.geojson:
            from mapchete_spark.sources.tiledir_export import tile_index_geojson

            gj = os.path.join(out_dir, f"{args.zoom}.geojson")
            tile_index_geojson(idx, gj)
            print(f"wrote {gj}")
        if args.gpkg:
            from mapchete_spark.sources.gpkg import write_gpkg_tile_index

            path = write_gpkg_tile_index(
                [r.asDict() for r in idx_rows], out_dir, args.zoom
            )
            print(f"wrote {path}")
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
