#!/usr/bin/env python
"""Write a STAC item for an existing output ('mapchete stac' analog).

    python jobs/stac.py /path/to/output [--item-id ID] [--out item.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--item-id", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from mapchete_spark.sources.stac import tile_table_stac_item, write_stac_item
    from mapchete_spark.tilegrid.pyramid import TilePyramid

    with open(os.path.join(args.output, "metadata.json")) as f:
        meta = json.load(f)
    pyr = TilePyramid(**meta["pyramid"])
    # zoom levels actually present on disk
    tiles_dir = os.path.join(args.output, "tiles")
    zooms = sorted(
        int(d.split("=")[1]) for d in os.listdir(tiles_dir) if d.startswith("zoom=")
    )
    item = tile_table_stac_item(
        args.item_id or os.path.basename(os.path.abspath(args.output)),
        pyr, zooms, args.output,
    )
    path = write_stac_item(item, args.out or os.path.join(args.output, "stac_item.json"))
    print(json.dumps({"status": "done", "path": path, "zooms": zooms}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
