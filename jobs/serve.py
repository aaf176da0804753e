#!/usr/bin/env python
"""Dev tile server over a written output ('mapchete serve' analog).

    python jobs/serve.py /path/to/output [--port 5000]

GET /{zoom}/{row}/{col}.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    from mapchete_spark.sources.serve import serve

    print(f"serving {args.output} on http://{args.host}:{args.port}/z/r/c.png")
    serve(args.output, port=args.port, host=args.host)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
