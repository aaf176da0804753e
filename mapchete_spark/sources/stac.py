"""S12: STAC item writer for tile-table outputs.

The reference writes a STAC Item with the tiled-assets extension
describing a TileDirectory output (mapchete/stac.py:41-278, wired into
job teardown at processing/base.py:574-619). Here the asset template
points at the engine's tile-table/tile-tree layout; the tile matrix set
is derived from the SAME TilePyramid the job ran on, so matrix sizes,
scale denominators and corner-of-origin match the grid exactly.

Driver-side JSON — engine state, not data."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import List, Optional

from mapchete_spark.tilegrid.grid import Bounds
from mapchete_spark.tilegrid.pyramid import TilePyramid

STAC_VERSION = "1.0.0"
TILED_ASSETS_EXT = "https://stac-extensions.github.io/tiled-assets/v1.0.0/schema.json"

# reference KNOWN_MATRIX_PROPERTIES (mapchete/stac.py:280-296): scale =
# pixel size in CRS units converted to the OGC 0.28mm pixel
_UNIT_TO_METER = {"geodetic": 111319.4907932732, "mercator": 1.0}
_MATRIX_NAMES = {
    "geodetic": "WorldCRS84Quad",
    "mercator": "WebMercatorQuad",
}
_CRS_URI = {
    "geodetic": "http://www.opengis.net/def/crs/OGC/1.3/CRS84",
    "mercator": "http://www.opengis.net/def/crs/EPSG/0/3857",
}


def _tile_matrix(pyramid: TilePyramid, zoom: int) -> dict:
    unit_to_meter = _UNIT_TO_METER.get(pyramid.grid.name, 1.0)
    scale = pyramid.pixel_x_size(zoom) * unit_to_meter / 0.00028
    return {
        "type": "TileMatrixType",
        "identifier": str(zoom),
        "scaleDenominator": scale,
        "topLeftCorner": [pyramid.left, pyramid.top],
        "tileWidth": pyramid.tile_size * pyramid.metatiling,
        "tileHeight": pyramid.tile_size * pyramid.metatiling,
        "matrixWidth": pyramid.matrix_width(zoom),
        "matrixHeight": pyramid.matrix_height(zoom),
    }


def tile_table_stac_item(
    item_id: str,
    pyramid: TilePyramid,
    zoom_levels: List[int],
    output_path: str,
    bounds: Optional[Bounds] = None,
    asset_template: str = "{zoom}/{row}/{col}.png",
    asset_type: str = "image/png",
    item_metadata: Optional[dict] = None,
    timestamp: Optional[str] = None,
) -> dict:
    """STAC Item dict with tiled-assets templates (stac.py:41-278)."""
    b = bounds or pyramid.bounds
    name = _MATRIX_NAMES.get(pyramid.grid.name, "custom")
    template = (
        asset_template.replace("{zoom}", "{TileMatrix}")
        .replace("{row}", "{TileRow}")
        .replace("{col}", "{TileCol}")
    )
    tms = {
        "type": "TileMatrixSetType",
        "title": name,
        "identifier": name,
        "supportedCRS": _CRS_URI.get(pyramid.grid.name, pyramid.crs),
        "tileMatrix": [_tile_matrix(pyramid, z) for z in sorted(zoom_levels)],
    }
    meta = dict(item_metadata or {})
    dt = timestamp or datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    item = {
        "type": "Feature",
        "stac_version": STAC_VERSION,
        "stac_extensions": [TILED_ASSETS_EXT],
        "id": item_id,
        "bbox": list(b),
        "geometry": {
            "type": "Polygon",
            "coordinates": [[
                [b.left, b.bottom], [b.right, b.bottom],
                [b.right, b.top], [b.left, b.top], [b.left, b.bottom],
            ]],
        },
        "properties": {
            "datetime": dt,
            "tiles:tile_matrix_links": {name: {"url": f"#{name}"}},
            "tiles:tile_matrix_sets": {name: tms},
            **meta,
        },
        "asset_templates": {
            "bands": {
                "href": os.path.join(output_path, template),
                "type": asset_type,
            }
        },
        "links": [],
        "assets": {},
    }
    return item


def write_stac_item(item: dict, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(item, f, indent=2)
    return path
