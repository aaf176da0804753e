#!/usr/bin/env python
"""spark-submit entry point: retile/copy an existing tile-table output
('mapchete convert' analog, SURVEY.md §2.7 J9).

    spark-submit --py-files mapchete_spark.zip jobs/convert.py \
        /path/to/src_output /path/to/dst_output \
        [--grid geodetic|mercator] [--metatiling N] [--zoom Z ...] \
        [--scale-ratio R] [--scale-offset O] [--dtype uint8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--grid", default=None)
    ap.add_argument("--metatiling", type=int, default=None)
    ap.add_argument("--zoom", type=int, nargs="*", default=None)
    ap.add_argument("--scale-ratio", type=float, default=1.0)
    ap.add_argument("--scale-offset", type=float, default=0.0)
    ap.add_argument("--dtype", default=None)
    args = ap.parse_args()

    from mapchete_spark.plans.convert import convert
    from mapchete_spark.session import get_spark, stop_unless_kept
    from mapchete_spark.tilegrid.pyramid import TilePyramid

    dst_pyr = None
    if args.grid or args.metatiling:
        with open(os.path.join(args.src, "metadata.json")) as f:
            src_meta = json.load(f)
        base = src_meta["pyramid"]
        dst_pyr = TilePyramid(
            grid=args.grid or base["grid"],
            metatiling=args.metatiling or base.get("metatiling", 1),
            tile_size=base.get("tile_size", 256),
        )

    spark = get_spark("mapchete_spark:convert")
    counts = convert(
        spark, args.src, args.dst, dst_pyramid=dst_pyr,
        zoom_levels=args.zoom, scale_ratio=args.scale_ratio,
        scale_offset=args.scale_offset, dtype=args.dtype,
    )
    print(json.dumps({"status": "done", "stages": counts}))
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
