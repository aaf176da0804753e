"""Pure-Python/numpy tile pyramid math (no Spark dependency).

Re-derived from the WMTS-simple spec with the semantics of the
reference engine's grid layer (mapchete/tile.py + the external
tilematrix package it wraps): geodetic grid is 1 row x 2 cols at
zoom 0 over (-180,-90,180,90); mercator is 1x1 over +/-20037508.34...;
metatiling merges m x m base tiles (edge metatiles are cropped to the
pyramid bounds); pixelbuffer enlarges a tile by n pixels on every side,
clipped at the north/south pyramid edge on global grids but allowed to
overflow (wrap) across the antimeridian.
"""

from mapchete_spark.tilegrid.grid import (
    GEODETIC,
    MERCATOR,
    GridDef,
    ROUND,
    Bounds,
)
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid
from mapchete_spark.tilegrid.keys import pack_tile_key, unpack_tile_key

__all__ = [
    "GEODETIC",
    "MERCATOR",
    "GridDef",
    "ROUND",
    "Bounds",
    "Tile",
    "TilePyramid",
    "pack_tile_key",
    "unpack_tile_key",
]
