#!/usr/bin/env python
"""Scaffold a new job: .mapchete config + process file
('mapchete create' analog).

    python jobs/create.py my_job.mapchete my_process.py \
        [--grid geodetic] [--zoom-min 0] [--zoom-max 8]
"""

from __future__ import annotations

import argparse
import json
import os

CONFIG_TEMPLATE = """process: {process_file}
zoom_levels:
  min: {zoom_min}
  max: {zoom_max}
pyramid:
  grid: {grid}
input:
  source: dem
process_parameters: {{}}
output:
  path: {out_path}
  format: parquet_tiles
"""

PROCESS_TEMPLATE = '''"""Scaffolded user process."""


def execute(mp):
    """Insert your tile logic here; mp.array is the input window."""
    return mp.array
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("process_file")
    ap.add_argument("--grid", default="geodetic")
    ap.add_argument("--zoom-min", type=int, default=0)
    ap.add_argument("--zoom-max", type=int, default=8)
    ap.add_argument("--out-path", default=None)
    args = ap.parse_args()

    for p in (args.config, args.process_file):
        if os.path.exists(p):
            raise SystemExit(f"refusing to overwrite existing {p}")
    with open(args.process_file, "w") as f:
        f.write(PROCESS_TEMPLATE)
    with open(args.config, "w") as f:
        f.write(CONFIG_TEMPLATE.format(
            process_file=os.path.basename(args.process_file),
            grid=args.grid, zoom_min=args.zoom_min, zoom_max=args.zoom_max,
            out_path=args.out_path or (os.path.splitext(args.config)[0] + "_out"),
        ))
    print(json.dumps({"status": "done", "config": args.config,
                      "process": args.process_file}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
