#!/usr/bin/env python
"""List registered processes ('mapchete processes' analog)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from mapchete_spark.plans.job import PROCESS_REGISTRY

    out = {
        name: {"kind": kind, "min_pixelbuffer": pb, "doc": (fn.__doc__ or "").strip().split("\n")[0]}
        for name, (kind, fn, pb) in sorted(PROCESS_REGISTRY.items())
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
