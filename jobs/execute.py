#!/usr/bin/env python
"""spark-submit entry point: run a .mapchete job config.

    spark-submit --py-files mapchete_spark.zip jobs/execute.py \
        configs/hillshade.mapchete [--mode continue|overwrite|readonly] \
        [--zoom Z] [--bounds L B R T]

(the 'mapchete execute' analog, SURVEY.md §2.7 J9)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# allow running directly / via spark-submit without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--mode", default="continue",
                    choices=["continue", "overwrite", "readonly"])
    ap.add_argument("--zoom", type=int, default=None)
    ap.add_argument("--bounds", type=float, nargs=4, default=None)
    ap.add_argument(
        "--tile", type=int, nargs=3, metavar=("Z", "R", "C"), default=None,
        help="process ONE tile and print its output row count — the "
             "reference's 'mapchete execute --tile' "
             "(cli/options.py opt_tile); no writes, no state",
    )
    ap.add_argument("--out", default=None, help="override output path")
    args = ap.parse_args()

    from mapchete_spark.plans.config import JobConfig
    from mapchete_spark.plans.job import execute, execute_tile
    from mapchete_spark.session import get_spark, stop_unless_kept
    from mapchete_spark.tilegrid.grid import Bounds

    cfg = JobConfig.from_file(args.config)
    if args.zoom is not None:
        cfg.zoom_levels = [args.zoom]
    if args.bounds:
        cfg.bounds = Bounds(*args.bounds)
    if args.out:
        cfg.output["path"] = args.out

    spark = get_spark(f"mapchete_spark:{cfg.process}")
    if args.tile:
        z, r, c = args.tile
        n = execute_tile(spark, cfg, z, r, c).count()
        print(json.dumps({"status": "done", "tile": [z, r, c], "rows": n}))
        stop_unless_kept(spark)
        return 0
    counts = execute(spark, cfg, mode=args.mode)
    print(json.dumps({"status": "done", "mode": args.mode, "stages": counts}))
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
