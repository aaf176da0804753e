"""Deterministic doc->geo derivation and tile arithmetic as Column
expressions + mirrored DuckDB SQL snippets.

Semantics:

- Geometry is derived deterministically from ``doc_id`` (FIXTURES.md F1):
  two LCG-style hashes map ids to (lon, lat); a deterministic 1% hot-spot
  cluster lands inside one zoom-8 tile to exercise skew handling; ~5% of
  docs get a square footprint (bbox) of radius 0.01..2 degrees for
  multi-tile assignment.
- Point->tile assignment replicates the reference's geodetic grid math
  (tiles_from_geom semantics, mapchete/tile.py:139-147): at zoom z the
  geodetic matrix is 2^z rows x 2^(z+1) cols over (-180,-90,180,90), so
  tile size in degrees is 180/2^z on both axes.
- Parent tile = (z-1, row//2, col//2) (mapchete/tile.py:285-320).

Every function has a ``*_sql`` twin producing the equivalent DuckDB SQL
string from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- deterministic geo hash constants (FIXTURES.md F1) ----------------------

M31 = 2_147_483_648  # 2^31
LON_A, LON_C = 1_103_515_245, 12_345  # glibc LCG multiplier/increment
LAT_A, LAT_C = 214_013, 2_531_011  # MSVC LCG multiplier/increment
RAD_A, RAD_C = 69_069, 1  # VAX LCG (footprint radius hash)

LAT_MIN, LAT_MAX = -85.0, 85.0  # stay off the poles (FIXTURES.md F1)

# hot-spot cluster: 1% of docs (doc_id % 100 == 0) forced into geodetic
# zoom-8 tile (8, 95, 200): x in [-39.375, -38.671875), y in (22.5, 23.203125]
HOT_MOD = 100
HOT_ZOOM, HOT_ROW, HOT_COL = 8, 95, 200
_HOT_TS = 180.0 / 2**HOT_ZOOM  # 0.703125
HOT_LEFT = -180.0 + HOT_COL * _HOT_TS
HOT_TOP = 90.0 - HOT_ROW * _HOT_TS

# footprint: docs with doc_id % 20 == 3 get a square bbox footprint
FOOT_MOD, FOOT_REM = 20, 3
FOOT_RMIN, FOOT_RSPAN = 0.01, 1.99


# ---- Spark Column builders ---------------------------------------------------


def _lcg(doc_id: Column, a: int, c: int) -> Column:
    return ((doc_id % M31) * F.lit(a) + F.lit(c)) % M31


def lon_col(doc_id: Column) -> Column:
    """Deterministic longitude in [-180, 180); hot-spot docs pinned into
    the hot zoom-8 tile."""
    base = F.lit(-180.0) + F.lit(360.0) * _lcg(doc_id, LON_A, LON_C) / F.lit(M31)
    hot = F.lit(HOT_LEFT) + F.lit(_HOT_TS * 0.998) * _lcg(
        doc_id, LON_A, LON_C
    ) / F.lit(M31)
    return F.when(doc_id % HOT_MOD == 0, hot).otherwise(base)


def lat_col(doc_id: Column) -> Column:
    base = F.lit(LAT_MIN) + F.lit(LAT_MAX - LAT_MIN) * _lcg(
        doc_id, LAT_A, LAT_C
    ) / F.lit(M31)
    hot = F.lit(HOT_TOP - _HOT_TS * 0.999) + F.lit(_HOT_TS * 0.998) * _lcg(
        doc_id, LAT_A, LAT_C
    ) / F.lit(M31)
    return F.when(doc_id % HOT_MOD == 0, hot).otherwise(base)


def footprint_radius_col(doc_id: Column) -> Column:
    """Square-footprint half-width in degrees; NULL for point-only docs."""
    r = F.lit(FOOT_RMIN) + F.lit(FOOT_RSPAN) * _lcg(doc_id, RAD_A, RAD_C) / F.lit(M31)
    return F.when(doc_id % FOOT_MOD == FOOT_REM, r).otherwise(F.lit(None))


def tile_size_deg(zoom: int) -> float:
    """Geodetic tile size in degrees at zoom (both axes)."""
    return 180.0 / 2**zoom


def _pow2_long(zoom) -> Column:
    zoom_c = F.lit(zoom) if isinstance(zoom, int) else zoom
    return F.pow(F.lit(2.0), zoom_c.cast("double")).cast("long")


def tile_col_expr(lon: Column, zoom) -> Column:
    """Geodetic tile column index; zoom may be an int or a Column."""
    zoom_c = F.lit(zoom) if isinstance(zoom, int) else zoom
    ts = F.lit(180.0) / F.pow(F.lit(2.0), zoom_c.cast("double"))
    mw = F.lit(2).cast("long") * _pow2_long(zoom)
    raw = F.floor((lon + F.lit(180.0)) / ts).cast("long")
    return F.least(F.greatest(raw, F.lit(0).cast("long")), mw - 1)


def tile_row_expr(lat: Column, zoom) -> Column:
    zoom_c = F.lit(zoom) if isinstance(zoom, int) else zoom
    ts = F.lit(180.0) / F.pow(F.lit(2.0), zoom_c.cast("double"))
    mh = _pow2_long(zoom)
    raw = F.floor((F.lit(90.0) - lat) / ts).cast("long")
    return F.least(F.greatest(raw, F.lit(0).cast("long")), mh - 1)


def parent_row(row: Column) -> Column:
    return F.floor(row / 2).cast("long")


def parent_col(col: Column) -> Column:
    return F.floor(col / 2).cast("long")


def zorder_key_col(zoom: Column, row: Column, col: Column) -> Column:
    """Z-order (morton) physical sort key — the Column twin of
    tilegrid.keys.pack_tile_key: [5 bits zoom | 58 bits morton(row,col)].
    Used as the within-partition WRITE ORDER so parquet row groups get
    spatial locality (neighboring tiles share row groups -> min/max
    stats prune spatial range scans); the linear tile_key stays the
    semantic join key. Pure shift/mask Column algebra, whole-stage
    codegen friendly."""

    def part1by1(x: Column) -> Column:
        x = x.cast("long").bitwiseAND(F.lit(0x1FFFFFFF))
        x = (x.bitwiseOR(F.shiftleft(x, 16))).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x3333333333333333))
        x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x5555555555555555))
        return x

    morton = F.shiftleft(part1by1(row), 1).bitwiseOR(part1by1(col))
    return F.shiftleft(zoom.cast("long"), 58).bitwiseOR(morton)


def tile_key_col(zoom: Column, row: Column, col: Column) -> Column:
    """Canonical packed int64 tile key: zoom*2^54 + row*2^27 + col —
    the Column twin of tilegrid.keys.linear_tile_key (same constants).
    Cheap shifts, exact in both Spark and DuckDB (< 2^63)."""
    from mapchete_spark.tilegrid.keys import (
        LINEAR_ROW_SHIFT,
        LINEAR_ZOOM_SHIFT,
    )

    return (
        zoom.cast("long") * F.lit(1 << LINEAR_ZOOM_SHIFT).cast("long")
        + row.cast("long") * F.lit(1 << LINEAR_ROW_SHIFT).cast("long")
        + col.cast("long")
    )


def parent_tile_key_col(zoom: Column, row: Column, col: Column) -> Column:
    """Linear key of the PARENT tile of (zoom, row, col) columns."""
    return tile_key_col(zoom.cast("long") - 1, F.floor(row / 2), F.floor(col / 2))


def with_geo(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach lon / lat / footprint radius columns (pure codegen)."""
    did = F.col(id_col)
    return df.withColumns(
        {
            "lon": lon_col(did),
            "lat": lat_col(did),
            "radius": footprint_radius_col(did),
        }
    )


# ---- DuckDB SQL twins --------------------------------------------------------


def lcg_sql(expr: str, a: int, c: int) -> str:
    return f"((({expr}) % {M31}) * {a} + {c}) % {M31}"


def lon_sql(expr: str = "doc_id") -> str:
    base = f"-180.0 + 360.0 * ({lcg_sql(expr, LON_A, LON_C)}) / {M31}"
    hot = f"{HOT_LEFT!r} + {_HOT_TS * 0.998!r} * ({lcg_sql(expr, LON_A, LON_C)}) / {M31}"
    return f"CASE WHEN ({expr}) % {HOT_MOD} = 0 THEN {hot} ELSE {base} END"


def lat_sql(expr: str = "doc_id") -> str:
    base = f"{LAT_MIN!r} + {LAT_MAX - LAT_MIN!r} * ({lcg_sql(expr, LAT_A, LAT_C)}) / {M31}"
    hot = (
        f"{HOT_TOP - _HOT_TS * 0.999!r} + {_HOT_TS * 0.998!r} * "
        f"({lcg_sql(expr, LAT_A, LAT_C)}) / {M31}"
    )
    return f"CASE WHEN ({expr}) % {HOT_MOD} = 0 THEN {hot} ELSE {base} END"


def radius_sql(expr: str = "doc_id") -> str:
    r = f"{FOOT_RMIN} + {FOOT_RSPAN} * ({lcg_sql(expr, RAD_A, RAD_C)}) / {M31}"
    return f"CASE WHEN ({expr}) % {FOOT_MOD} = {FOOT_REM} THEN {r} ELSE NULL END"


def tile_col_sql(lon_expr: str, zoom_expr: str) -> str:
    ts = f"(180.0 / POWER(2.0, {zoom_expr}))"
    mw = f"(2 * CAST(POWER(2, {zoom_expr}) AS BIGINT))"
    raw = f"CAST(FLOOR((({lon_expr}) + 180.0) / {ts}) AS BIGINT)"
    return f"LEAST(GREATEST({raw}, 0), {mw} - 1)"


def tile_row_sql(lat_expr: str, zoom_expr: str) -> str:
    ts = f"(180.0 / POWER(2.0, {zoom_expr}))"
    mh = f"CAST(POWER(2, {zoom_expr}) AS BIGINT)"
    raw = f"CAST(FLOOR((90.0 - ({lat_expr})) / {ts}) AS BIGINT)"
    return f"LEAST(GREATEST({raw}, 0), {mh} - 1)"


def tile_key_sql(zoom_expr: str, row_expr: str, col_expr: str) -> str:
    from mapchete_spark.tilegrid.keys import LINEAR_ROW_SHIFT, LINEAR_ZOOM_SHIFT

    return (
        f"CAST({zoom_expr} AS BIGINT) * {1 << LINEAR_ZOOM_SHIFT} + "
        f"CAST({row_expr} AS BIGINT) * {1 << LINEAR_ROW_SHIFT} + CAST({col_expr} AS BIGINT)"
    )
