"""Lambert-93 (EPSG:2154) forward projection as Spark Column algebra +
its DuckDB SQL twin.

The engine side is PURE Column math — tan/pow/sin/cos stay inside
whole-stage codegen, no Python UDF in the hot path (at 10^12 docs this
is a map-only stage with zero shuffle). The same arithmetic, with the
same ``repr()``-embedded constants, renders as the DuckDB oracle.
tests/test_utm.py pins Column output == geometry/conic's
LambertConformalConic to sub-ulp, so the contract query also vouches
for the library class."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mapchete_spark.geometry.conic import (
    CONIC_REGISTRY,
    GRS80_A,
    GRS80_E,
    LambertConformalConic,
)

_P = LambertConformalConic(CONIC_REGISTRY["EPSG:2154"])
LCC_N = _P.n
LCC_F = _P.F
LCC_RHO0 = _P.rho0
LCC_LON0 = _P.lon0
LCC_X0 = _P.x0
LCC_Y0 = _P.y0


def lcc_xy_cols(lon: Column, lat: Column):
    """(x, y) Columns of the EPSG:2154 forward transform (Snyder
    15-1..15-9 with precomputed n/F/rho0), cm-quantized with the
    round-half-up floor(v*100 + 0.5)/100 used by every reproject
    oracle."""
    phi = F.radians(lat)
    s = F.lit(GRS80_E) * F.sin(phi)
    t = F.tan(F.lit(0.7853981633974483) - phi / F.lit(2.0)) / F.pow(
        (F.lit(1.0) - s) / (F.lit(1.0) + s), F.lit(GRS80_E / 2.0)
    )
    rho = F.lit(GRS80_A * LCC_F) * F.pow(t, F.lit(LCC_N))
    th = F.lit(LCC_N) * F.radians(lon - F.lit(LCC_LON0))
    x = F.lit(LCC_X0) + rho * F.sin(th)
    y = F.lit(LCC_Y0 + LCC_RHO0) - rho * F.cos(th)
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(x), q(y)


def lcc_reproject_sql() -> str:
    """DuckDB twin of :func:`lcc_xy_cols` over the documents table
    (lon/lat derived the standard synthetic way via functions/geo)."""
    from mapchete_spark.functions import geo as G

    e = repr(GRS80_E)
    return f"""
    WITH docs_geo AS (
        SELECT doc_id, {G.lon_sql("doc_id")} AS lon, {G.lat_sql("doc_id")} AS lat
        FROM documents
    ), proj AS (
        SELECT doc_id, lon, lat,
               tan(0.7853981633974483 - radians(lat) / 2.0)
                 / pow((1.0 - {e} * sin(radians(lat)))
                       / (1.0 + {e} * sin(radians(lat))), {repr(GRS80_E / 2.0)})
               AS t
        FROM docs_geo
    ), xy AS (
        SELECT doc_id,
               {repr(LCC_X0)} + ({repr(GRS80_A * LCC_F)} * pow(t, {repr(LCC_N)}))
                   * sin({repr(LCC_N)} * radians(lon - {repr(LCC_LON0)})) AS x,
               {repr(LCC_Y0 + LCC_RHO0)} - ({repr(GRS80_A * LCC_F)} * pow(t, {repr(LCC_N)}))
                   * cos({repr(LCC_N)} * radians(lon - {repr(LCC_LON0)})) AS y
        FROM proj
    )
    SELECT doc_id,
           FLOOR(x * 100.0 + 0.5) / 100.0 AS lcc_x,
           FLOOR(y * 100.0 + 0.5) / 100.0 AS lcc_y
    FROM xy
    ORDER BY doc_id
    """
