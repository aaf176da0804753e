#!/usr/bin/env python
"""List output formats ('mapchete formats' analog)."""

from __future__ import annotations

import json

FORMATS = {
    "parquet_tiles": {
        "data_type": "raster",
        "description": "partitioned parquet tile table (the at-scale sink)",
    },
    "parquet_features": {
        "data_type": "vector",
        "description": "partitioned parquet feature table (WKB + JSON properties)",
    },
    "png_tiledir": {
        "data_type": "raster",
        "description": "z/row/col PNG tile directory export (small outputs)",
    },
    "npy_tiledir": {
        "data_type": "raster",
        "description": "z/row/col .npy tile directory export",
    },
    "single_npy": {
        "data_type": "raster",
        "description": "single-artifact mosaic (.npy + JSON sidecar, S6 analog)",
    },
    "geojson_index": {
        "data_type": "vector",
        "description": "per-zoom GeoJSON tile index (J8)",
    },
    "stac_item": {
        "data_type": "metadata",
        "description": "STAC item with tiled-assets templates (S12)",
    },
}


def main():
    print(json.dumps(FORMATS, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
