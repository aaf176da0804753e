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


# ---------------------------------------------------------------------------
# LAEA Europe (EPSG:3035) — the proj-parameter front-end's flagship CRS
# ---------------------------------------------------------------------------

from mapchete_spark.geometry.conic import GRS80_E2, LambertAzimuthalEqualArea
from mapchete_spark.geometry.projparams import EPSG_PROJ4, projection_from_proj4

# Instantiated THROUGH the proj4 front-end (not the hand registry) so the
# contract query also vouches for geometry/projparams end-to-end.
import math as _math

_L = projection_from_proj4(EPSG_PROJ4["EPSG:3035"])
assert isinstance(_L, LambertAzimuthalEqualArea)
LAEA_QP = _L.qp
LAEA_SB1 = _math.sin(_L.beta1)
LAEA_CB1 = _math.cos(_L.beta1)
LAEA_RQ = _L.Rq
LAEA_D = _L.D
LAEA_LON0 = _L.lon0
LAEA_X0 = _L.x0
LAEA_Y0 = _L.y0


def _q_col(phi: Column) -> Column:
    """Snyder 3-12 authalic q as a Column (same algebra as conic._q)."""
    s = F.sin(phi)
    es = F.lit(GRS80_E) * s
    return F.lit(1.0 - GRS80_E2) * (
        s / (F.lit(1.0) - F.lit(GRS80_E2) * s * s)
        - F.lit(1.0 / (2.0 * GRS80_E))
        * F.log((F.lit(1.0) - es) / (F.lit(1.0) + es))
    )


def laea_xy_cols(lon: Column, lat: Column):
    """(x, y) Columns of the EPSG:3035 forward transform (Snyder
    24-2..24-8 oblique ellipsoidal LAEA with precomputed qp/beta1/Rq/D
    from the proj4 front-end), cm-quantized like every reproject
    oracle. Pure Column algebra: sin/cos/asin/log/sqrt stay in
    whole-stage codegen — map-only, zero shuffle at any corpus size."""
    phi = F.radians(lat)
    beta = F.asin(
        F.least(
            F.greatest(_q_col(phi) / F.lit(LAEA_QP), F.lit(-1.0)), F.lit(1.0)
        )
    )
    lam = F.radians(lon - F.lit(LAEA_LON0))
    sb, cb = F.sin(beta), F.cos(beta)
    B = F.lit(LAEA_RQ) * F.sqrt(
        F.lit(2.0)
        / (
            F.lit(1.0)
            + F.lit(LAEA_SB1) * sb
            + F.lit(LAEA_CB1) * cb * F.cos(lam)
        )
    )
    x = F.lit(LAEA_X0) + B * F.lit(LAEA_D) * cb * F.sin(lam)
    y = F.lit(LAEA_Y0) + (B / F.lit(LAEA_D)) * (
        F.lit(LAEA_CB1) * sb - F.lit(LAEA_SB1) * cb * F.cos(lam)
    )
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(x), q(y)


def laea_reproject_sql() -> str:
    """DuckDB twin of :func:`laea_xy_cols` over the documents table."""
    from mapchete_spark.functions import geo as G

    e = repr(GRS80_E)
    e2 = repr(GRS80_E2)
    return f"""
    WITH docs_geo AS (
        SELECT doc_id, {G.lon_sql("doc_id")} AS lon, {G.lat_sql("doc_id")} AS lat
        FROM documents
    ), authalic AS (
        SELECT doc_id, lon,
               {repr(1.0 - GRS80_E2)} * (
                   sin(radians(lat)) / (1.0 - {e2} * sin(radians(lat)) * sin(radians(lat)))
                   - {repr(1.0 / (2.0 * GRS80_E))}
                     * ln((1.0 - {e} * sin(radians(lat))) / (1.0 + {e} * sin(radians(lat))))
               ) AS qv
        FROM docs_geo
    ), beta_t AS (
        SELECT doc_id,
               asin(LEAST(GREATEST(qv / {repr(LAEA_QP)}, -1.0), 1.0)) AS beta,
               radians(lon - {repr(LAEA_LON0)}) AS lam
        FROM authalic
    ), bb AS (
        SELECT doc_id, beta, lam,
               {repr(LAEA_RQ)} * sqrt(2.0 / (1.0 + {repr(LAEA_SB1)} * sin(beta)
                   + {repr(LAEA_CB1)} * cos(beta) * cos(lam))) AS B
        FROM beta_t
    ), xy AS (
        SELECT doc_id,
               {repr(LAEA_X0)} + B * {repr(LAEA_D)} * cos(beta) * sin(lam) AS x,
               {repr(LAEA_Y0)} + (B / {repr(LAEA_D)})
                   * ({repr(LAEA_CB1)} * sin(beta)
                      - {repr(LAEA_SB1)} * cos(beta) * cos(lam)) AS y
        FROM bb
    )
    SELECT doc_id,
           FLOOR(x * 100.0 + 0.5) / 100.0 AS laea_x,
           FLOOR(y * 100.0 + 0.5) / 100.0 AS laea_y
    FROM xy
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Antarctic Polar Stereographic (EPSG:3031) — the polar-grid family
# ---------------------------------------------------------------------------

from mapchete_spark.geometry.conic import PolarStereographic

# Instantiated THROUGH the proj4 front-end so the contract query vouches
# for geometry/projparams' +proj=stere dispatch end-to-end.
_S = projection_from_proj4(EPSG_PROJ4["EPSG:3031"])
assert isinstance(_S, PolarStereographic) and _S.south
STERE_RHO_PER_T = _S.rho_per_t
STERE_E = _S.e
STERE_LON0 = _S.lon0  # 0.0
STERE_X0 = _S.x0  # 0.0
STERE_Y0 = _S.y0  # 0.0

#: deterministic remap of the synthetic doc latitude band [-85, 85]
#: into the Antarctic AOI [-85, -62] (pure affine, identical algebra
#: in the Column and SQL twins)
ANT_LAT_SCALE = 23.0 / 170.0


def antarctic_lat_col(lat: Column) -> Column:
    return F.lit(-62.0) - (lat + F.lit(85.0)) * F.lit(ANT_LAT_SCALE)


def stere_xy_cols(lon: Column, lat: Column):
    """(x, y) Columns of the EPSG:3031 forward transform (Snyder ch. 21
    south polar aspect, EPSG method 9829 variant B with lat_ts=-71;
    constants precomputed by geometry/conic.PolarStereographic through
    the proj4 front-end), cm-quantized like every reproject oracle.
    Pure Column algebra — tan/pow/sin/cos stay in whole-stage codegen,
    map-only, zero shuffle at any corpus size. The class itself pins to
    the EPSG GN7-2 variant A and B published worked examples in
    tests/test_utm.py."""
    phi = F.radians(lat)
    s = F.lit(STERE_E) * F.sin(phi)
    # south aspect: t(-phi) = tan(pi/4 + phi/2) / ((1+e sin phi)/(1-e sin phi))^(e/2)
    t = F.tan(F.lit(0.7853981633974483) + phi / F.lit(2.0)) / F.pow(
        (F.lit(1.0) + s) / (F.lit(1.0) - s), F.lit(STERE_E / 2.0)
    )
    rho = F.lit(STERE_RHO_PER_T) * t
    lam = F.radians(lon - F.lit(STERE_LON0))
    x = F.lit(STERE_X0) + rho * F.sin(lam)
    y = F.lit(STERE_Y0) + rho * F.cos(lam)
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(x), q(y)


def stere_reproject_sql() -> str:
    """DuckDB twin of :func:`stere_xy_cols` over the documents table
    (same Antarctic latitude remap, same repr()-embedded constants)."""
    from mapchete_spark.functions import geo as G

    e = repr(STERE_E)
    return f"""
    WITH docs_geo AS (
        SELECT doc_id, {G.lon_sql("doc_id")} AS lon,
               -62.0 - (({G.lat_sql("doc_id")}) + 85.0) * {ANT_LAT_SCALE!r} AS lat
        FROM documents
    ), tv AS (
        SELECT doc_id, lon,
               tan(0.7853981633974483 + radians(lat) / 2.0)
                 / pow((1.0 + {e} * sin(radians(lat)))
                       / (1.0 - {e} * sin(radians(lat))), {repr(STERE_E / 2.0)})
               AS t
        FROM docs_geo
    ), xy AS (
        SELECT doc_id,
               {repr(STERE_X0)} + ({repr(STERE_RHO_PER_T)} * t)
                   * sin(radians(lon - {repr(STERE_LON0)})) AS x,
               {repr(STERE_Y0)} + ({repr(STERE_RHO_PER_T)} * t)
                   * cos(radians(lon - {repr(STERE_LON0)})) AS y
        FROM tv
    )
    SELECT doc_id,
           FLOOR(x * 100.0 + 0.5) / 100.0 AS stere_x,
           FLOOR(y * 100.0 + 0.5) / 100.0 AS stere_y
    FROM xy
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Pseudocylindrical world grids (round 5): Equal Earth (EPSG:8857) and
# the MODIS sinusoidal sphere (SR-ORG:6974) — the last CRS families the
# round-4 verdict named. Both forwards are closed-form (no iteration),
# so the DuckDB twin is exact, not a series truncation.
# ---------------------------------------------------------------------------

from mapchete_spark.geometry.pseudocyl import (
    _EE_A1,
    _EE_A2,
    _EE_A3,
    _EE_A4,
    _SQRT3_2,
    EqualEarth,
    Sinusoidal,
)

# Instantiated THROUGH the proj4 front-end so the contract query vouches
# for geometry/projparams' +proj=eqearth / +proj=sinu dispatch.
_EE = projection_from_proj4(EPSG_PROJ4["EPSG:8857"])
assert isinstance(_EE, EqualEarth)
EE_E = _EE.e
EE_E2 = _EE.e2
EE_QP = _EE.qp
EE_RQ = _EE.Rq

_SN = projection_from_proj4(EPSG_PROJ4["SR-ORG:6974"])
assert isinstance(_SN, Sinusoidal) and _SN.e2 == 0.0
SINU_R = _SN.a  # MODIS sphere radius 6371007.181


def _q_col_e(phi: Column, e: float, e2: float) -> Column:
    """Snyder 3-12 authalic q as a Column for an arbitrary ellipsoid
    (the WGS84-exact twin of :func:`_q_col`, which is pinned to
    GRS80 for the LAEA grid)."""
    s = F.sin(phi)
    es = F.lit(e) * s
    return F.lit(1.0 - e2) * (
        s / (F.lit(1.0) - F.lit(e2) * s * s)
        - F.lit(1.0 / (2.0 * e))
        * F.log((F.lit(1.0) - es) / (F.lit(1.0) + es))
    )


def eqearth_xy_cols(lon: Column, lat: Column):
    """(x, y) Columns of the EPSG:8857 Equal Earth forward transform
    (Šavrič-Patterson-Jenny 2018 polynomial over the authalic-sphere
    parametric latitude; constants from geometry/pseudocyl.EqualEarth
    through the proj4 front-end), cm-quantized. Pure Column algebra —
    sin/asin/log/polynomials stay in whole-stage codegen; map-only,
    zero shuffle at any corpus size."""
    phi = F.radians(lat)
    sbeta = F.least(
        F.greatest(_q_col_e(phi, EE_E, EE_E2) / F.lit(EE_QP), F.lit(-1.0)),
        F.lit(1.0),
    )
    theta = F.asin(F.lit(_SQRT3_2) * sbeta)
    t2 = theta * theta
    t6 = t2 * t2 * t2
    dy = (
        F.lit(_EE_A1)
        + F.lit(3.0 * _EE_A2) * t2
        + t6 * (F.lit(7.0 * _EE_A3) + F.lit(9.0 * _EE_A4) * t2)
    )
    py = theta * (
        F.lit(_EE_A1)
        + F.lit(_EE_A2) * t2
        + t6 * (F.lit(_EE_A3) + F.lit(_EE_A4) * t2)
    )
    lam = F.radians(lon)
    x = F.lit(EE_RQ) * lam * F.cos(theta) / (F.lit(_SQRT3_2) * dy)
    y = F.lit(EE_RQ) * py
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(x), q(y)


def sinu_xy_cols(lon: Column, lat: Column):
    """(x, y) Columns of the MODIS sinusoidal forward (Snyder 30-1:
    x = R λ cos φ, y = R φ on the R=6371007.181 sphere), cm-quantized.
    The 10° MODIS tile width 1111950.5197 m falls out exactly."""
    phi = F.radians(lat)
    x = F.lit(SINU_R) * F.radians(lon) * F.cos(phi)
    y = F.lit(SINU_R) * phi
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(x), q(y)


def pseudocyl_reproject_sql() -> str:
    """DuckDB twin of eqearth_xy_cols + sinu_xy_cols over documents
    (same repr()-embedded constants, same cm quantization)."""
    from mapchete_spark.functions import geo as G

    e = repr(EE_E)
    e2 = repr(EE_E2)
    a1, a2, a3, a4 = repr(_EE_A1), repr(_EE_A2), repr(_EE_A3), repr(_EE_A4)
    m = repr(_SQRT3_2)
    return f"""
    WITH docs_geo AS (
        SELECT doc_id, {G.lon_sql("doc_id")} AS lon, {G.lat_sql("doc_id")} AS lat
        FROM documents
    ), authalic AS (
        SELECT doc_id, lon, lat,
               {repr(1.0 - _EE.e2)} * (
                   sin(radians(lat)) / (1.0 - {e2} * sin(radians(lat)) * sin(radians(lat)))
                   - {repr(1.0 / (2.0 * _EE.e))}
                     * ln((1.0 - {e} * sin(radians(lat))) / (1.0 + {e} * sin(radians(lat))))
               ) AS qv
        FROM docs_geo
    ), theta_t AS (
        SELECT doc_id, lon, lat,
               asin({m} * LEAST(GREATEST(qv / {repr(EE_QP)}, -1.0), 1.0)) AS theta
        FROM authalic
    ), xy AS (
        SELECT doc_id, lon, lat, theta,
               {repr(EE_RQ)} * radians(lon) * cos(theta)
                 / ({m} * ({a1} + 3.0 * {a2} * theta * theta
                    + theta*theta*theta*theta*theta*theta
                      * (7.0 * {a3} + 9.0 * {a4} * theta * theta))) AS ee_x,
               {repr(EE_RQ)} * theta * ({a1} + {a2} * theta * theta
                    + theta*theta*theta*theta*theta*theta
                      * ({a3} + {a4} * theta * theta)) AS ee_y
        FROM theta_t
    )
    SELECT doc_id,
           FLOOR(ee_x * 100.0 + 0.5) / 100.0 AS ee_x,
           FLOOR(ee_y * 100.0 + 0.5) / 100.0 AS ee_y,
           FLOOR({repr(SINU_R)} * radians(lon) * cos(radians(lat)) * 100.0 + 0.5)
               / 100.0 AS sinu_x,
           FLOOR({repr(SINU_R)} * radians(lat) * 100.0 + 0.5) / 100.0 AS sinu_y
    FROM xy
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Oblique (double) Stereographic — EPSG 9809, RD New EPSG:28992
# (geometry/sterea.py pins the EPSG GN7-2 worked example; here the
# same forward as pure Column algebra + DuckDB twin, local-datum
# coordinates like every reproject contract query)
from mapchete_spark.geometry.sterea import ObliqueStereographic as _OSt
from mapchete_spark.geometry.sterea import RD_NEW_PARAMS as _RDP

_RD = _OSt(_RDP)
STEREA_C = _RD.c
STEREA_N = _RD.n
STEREA_R2K = 2.0 * _RD.R * _RDP.k0
STEREA_E = _RD.e
STEREA_SCHI0 = float(__import__("numpy").sin(_RD.chi0))
STEREA_CCHI0 = float(__import__("numpy").cos(_RD.chi0))
STEREA_LAM0 = _RD.lam0
STEREA_X0 = _RDP.x0
STEREA_Y0 = _RDP.y0

#: deterministic remap of the synthetic doc point field into the RD
#: New area of use (lon [3.4, 7.0], lat [50.9, 53.5]); pure affine,
#: identical algebra in both twins
NL_LON_OFF, NL_LON_SCALE = 3.4, 3.6 / 360.0
NL_LAT_OFF, NL_LAT_SCALE = 50.9, 2.6 / 170.0


def nl_lon_col(lon: Column) -> Column:
    return F.lit(NL_LON_OFF) + (lon + F.lit(180.0)) * F.lit(NL_LON_SCALE)


def nl_lat_col(lat: Column) -> Column:
    return F.lit(NL_LAT_OFF) + (lat + F.lit(85.0)) * F.lit(NL_LAT_SCALE)


def sterea_xy_cols(lon: Column, lat: Column):
    """(E, N) Columns of the RD New (EPSG:28992) forward — EPSG method
    9809 oblique stereographic on the conformal sphere, constants
    precomputed by geometry/sterea.ObliqueStereographic (which pins
    the published GN7-2 worked example in tests/test_sterea.py).
    Pure Column algebra: pow/sqrt/trig stay in whole-stage codegen —
    map-only, zero shuffle at any corpus size. cm-quantized like every
    reproject oracle."""
    phi = F.radians(lat)
    s = F.sin(phi)
    sa = (F.lit(1.0) + s) / (F.lit(1.0) - s)
    sb = (F.lit(1.0) - F.lit(STEREA_E) * s) / (
        F.lit(1.0) + F.lit(STEREA_E) * s
    )
    w = F.lit(STEREA_C) * F.pow(
        sa * F.pow(sb, F.lit(STEREA_E)), F.lit(STEREA_N)
    )
    schi = (w - F.lit(1.0)) / (w + F.lit(1.0))
    cchi = F.sqrt(F.lit(1.0) - schi * schi)
    dlam = F.lit(STEREA_N) * (F.radians(lon) - F.lit(STEREA_LAM0))
    b = (
        F.lit(1.0)
        + schi * F.lit(STEREA_SCHI0)
        + cchi * F.lit(STEREA_CCHI0) * F.cos(dlam)
    )
    x = F.lit(STEREA_X0) + F.lit(STEREA_R2K) * cchi * F.sin(dlam) / b
    y = F.lit(STEREA_Y0) + F.lit(STEREA_R2K) * (
        schi * F.lit(STEREA_CCHI0) - cchi * F.lit(STEREA_SCHI0) * F.cos(dlam)
    ) / b
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(x), q(y)


def sterea_reproject_sql() -> str:
    """DuckDB twin of :func:`sterea_xy_cols` (same NL remap, same
    repr()-embedded constants, same operation order)."""
    from mapchete_spark.functions import geo as G

    e = repr(STEREA_E)
    return f"""
    WITH docs_geo AS (
        SELECT doc_id,
               {NL_LON_OFF!r} + (({G.lon_sql("doc_id")}) + 180.0)
                   * {NL_LON_SCALE!r} AS lon,
               {NL_LAT_OFF!r} + (({G.lat_sql("doc_id")}) + 85.0)
                   * {NL_LAT_SCALE!r} AS lat
        FROM documents
    ), chi AS (
        SELECT doc_id, lon,
               ({STEREA_C!r} * pow(
                   ((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat))))
                   * pow((1.0 - {e} * sin(radians(lat)))
                         / (1.0 + {e} * sin(radians(lat))), {e}),
                   {STEREA_N!r}) - 1.0)
               / ({STEREA_C!r} * pow(
                   ((1.0 + sin(radians(lat))) / (1.0 - sin(radians(lat))))
                   * pow((1.0 - {e} * sin(radians(lat)))
                         / (1.0 + {e} * sin(radians(lat))), {e}),
                   {STEREA_N!r}) + 1.0) AS schi
        FROM docs_geo
    ), parts AS (
        SELECT doc_id,
               schi,
               sqrt(1.0 - schi * schi) AS cchi,
               {STEREA_N!r} * (radians(lon) - {STEREA_LAM0!r}) AS dlam
        FROM chi
    ), b AS (
        SELECT doc_id, schi, cchi, dlam,
               1.0 + schi * {STEREA_SCHI0!r}
                   + cchi * {STEREA_CCHI0!r} * cos(dlam) AS bb
        FROM parts
    ), xy AS (
        SELECT doc_id,
               {STEREA_X0!r} + {STEREA_R2K!r} * cchi * sin(dlam) / bb AS x,
               {STEREA_Y0!r} + {STEREA_R2K!r}
                   * (schi * {STEREA_CCHI0!r}
                      - cchi * {STEREA_SCHI0!r} * cos(dlam)) / bb AS y
        FROM b
    )
    SELECT doc_id,
           FLOOR(x * 100.0 + 0.5) / 100.0 AS rd_x,
           FLOOR(y * 100.0 + 0.5) / 100.0 AS rd_y
    FROM xy
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Gnomonic + Orthographic (geometry/azimuthal.py; Snyder ch. 20/22) —
# the spherical azimuthal pair as Column algebra + DuckDB twin
AZ_R = 6371008.8
AZ_LAT0, AZ_LON0 = 40.0, -100.0
_AZ_S1 = float(__import__("numpy").sin(__import__("numpy").radians(AZ_LAT0)))
_AZ_C1 = float(__import__("numpy").cos(__import__("numpy").radians(AZ_LAT0)))

#: remap of the synthetic doc field into the visible hemisphere around
#: (40N, 100W): lon [-140, -60], lat [0, 75]
AZ_LON_OFF, AZ_LON_SCALE = -140.0, 80.0 / 360.0
AZ_LAT_OFF, AZ_LAT_SCALE = 0.0, 75.0 / 170.0


def az_lon_col(lon: Column) -> Column:
    return F.lit(AZ_LON_OFF) + (lon + F.lit(180.0)) * F.lit(AZ_LON_SCALE)


def az_lat_col(lat: Column) -> Column:
    return F.lit(AZ_LAT_OFF) + (lat + F.lit(85.0)) * F.lit(AZ_LAT_SCALE)


def azimuthal_xy_cols(lon: Column, lat: Column):
    """(ortho_x, ortho_y, gnom_x, gnom_y) of the general-aspect
    spherical pair centered on (40N, 100W) — pure Column trig in
    whole-stage codegen; map-only, zero shuffle at any corpus size.
    The library classes are verified against an independent 3-D
    tangent-plane construction in tests/test_azimuthal.py."""
    phi = F.radians(lat)
    dlam = F.radians(lon - F.lit(AZ_LON0))
    sphi, cphi = F.sin(phi), F.cos(phi)
    cosd = F.cos(dlam)
    ox = F.lit(AZ_R) * cphi * F.sin(dlam)
    oy = F.lit(AZ_R) * (
        F.lit(_AZ_C1) * sphi - F.lit(_AZ_S1) * cphi * cosd
    )
    cosc = F.lit(_AZ_S1) * sphi + F.lit(_AZ_C1) * cphi * cosd
    q = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return q(ox), q(oy), q(ox / cosc), q(oy / cosc)


def azimuthal_reproject_sql() -> str:
    """DuckDB twin of :func:`azimuthal_xy_cols` (same remap, same
    repr()-embedded constants, same operation order)."""
    from mapchete_spark.functions import geo as G

    return f"""
    WITH docs_geo AS (
        SELECT doc_id,
               {AZ_LON_OFF!r} + (({G.lon_sql("doc_id")}) + 180.0)
                   * {AZ_LON_SCALE!r} AS lon,
               {AZ_LAT_OFF!r} + (({G.lat_sql("doc_id")}) + 85.0)
                   * {AZ_LAT_SCALE!r} AS lat
        FROM documents
    ), t AS (
        SELECT doc_id,
               {AZ_R!r} * cos(radians(lat))
                   * sin(radians(lon - {AZ_LON0!r})) AS ox,
               {AZ_R!r} * ({_AZ_C1!r} * sin(radians(lat))
                   - {_AZ_S1!r} * cos(radians(lat))
                     * cos(radians(lon - {AZ_LON0!r}))) AS oy,
               {_AZ_S1!r} * sin(radians(lat))
                   + {_AZ_C1!r} * cos(radians(lat))
                     * cos(radians(lon - {AZ_LON0!r})) AS cosc
        FROM docs_geo
    )
    SELECT doc_id,
           FLOOR(ox * 100.0 + 0.5) / 100.0 AS ortho_x,
           FLOOR(oy * 100.0 + 0.5) / 100.0 AS ortho_y,
           FLOOR((ox / cosc) * 100.0 + 0.5) / 100.0 AS gnom_x,
           FLOOR((oy / cosc) * 100.0 + 0.5) / 100.0 AS gnom_y
    FROM t
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Hotine Oblique Mercator — EPSG 9815 variant B, Timbalai / RSO Borneo
# EPSG:29873 (geometry/omerc.py pins the GN7-2 worked example)
from mapchete_spark.geometry.omerc import omerc_grid as _omerc_grid

_OM = _omerc_grid("EPSG:29873")
OM_B = _OM.B
OM_A = _OM.A
OM_H = _OM.H
OM_E = _OM.e
OM_SG0 = float(__import__("numpy").sin(_OM.gamma0))
OM_CG0 = float(__import__("numpy").cos(_OM.gamma0))
OM_LAM0 = _OM.lam0
OM_UC = _OM.uc
OM_SGC = float(__import__("numpy").sin(_OM.gammac))
OM_CGC = float(__import__("numpy").cos(_OM.gammac))
OM_X0 = _OM.p.x0
OM_Y0 = _OM.p.y0

#: remap of the synthetic doc field into the RSO Borneo area of use:
#: lon [110.5, 118.5], lat [1.2, 7.2]
OM_LON_OFF, OM_LON_SCALE = 110.5, 8.0 / 360.0
OM_LAT_OFF, OM_LAT_SCALE = 1.2, 6.0 / 170.0


def om_lon_col(lon: Column) -> Column:
    return F.lit(OM_LON_OFF) + (lon + F.lit(180.0)) * F.lit(OM_LON_SCALE)


def om_lat_col(lat: Column) -> Column:
    return F.lit(OM_LAT_OFF) + (lat + F.lit(85.0)) * F.lit(OM_LAT_SCALE)


def omerc_xy_cols(lon: Column, lat: Column):
    """(E, N) Columns of the RSO Borneo (EPSG:29873) forward — EPSG
    method 9815 Hotine oblique Mercator, constants precomputed by
    geometry/omerc.HotineObliqueMercator (GN7-2 worked example pinned
    in tests/test_omerc.py). Pure Column algebra in whole-stage
    codegen — map-only, zero shuffle; cm-quantized like every
    reproject oracle."""
    phi = F.radians(lat)
    s = F.lit(OM_E) * F.sin(phi)
    t = F.tan(F.lit(0.7853981633974483) - phi / F.lit(2.0)) / F.pow(
        (F.lit(1.0) - s) / (F.lit(1.0) + s), F.lit(OM_E / 2.0)
    )
    q = F.lit(OM_H) / F.pow(t, F.lit(OM_B))
    ss = (q - F.lit(1.0) / q) / F.lit(2.0)
    tt = (q + F.lit(1.0) / q) / F.lit(2.0)
    dl = F.lit(OM_B) * (F.radians(lon) - F.lit(OM_LAM0))
    vv = F.sin(dl)
    uu = (-vv * F.lit(OM_CG0) + ss * F.lit(OM_SG0)) / tt
    v = F.lit(OM_A) * F.log(
        (F.lit(1.0) - uu) / (F.lit(1.0) + uu)
    ) / F.lit(2.0 * OM_B)
    u = F.lit(OM_A) * F.atan2(
        ss * F.lit(OM_CG0) + vv * F.lit(OM_SG0), F.cos(dl)
    ) / F.lit(OM_B) - F.lit(OM_UC)
    x = F.lit(OM_X0) + v * F.lit(OM_CGC) + u * F.lit(OM_SGC)
    y = F.lit(OM_Y0) + u * F.lit(OM_CGC) - v * F.lit(OM_SGC)
    qz = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)
    return qz(x), qz(y)


def omerc_reproject_sql() -> str:
    """DuckDB twin of :func:`omerc_xy_cols` (same remap, same
    repr()-embedded constants, same operation order)."""
    from mapchete_spark.functions import geo as G

    e = repr(OM_E)
    return f"""
    WITH docs_geo AS (
        SELECT doc_id,
               {OM_LON_OFF!r} + (({G.lon_sql("doc_id")}) + 180.0)
                   * {OM_LON_SCALE!r} AS lon,
               {OM_LAT_OFF!r} + (({G.lat_sql("doc_id")}) + 85.0)
                   * {OM_LAT_SCALE!r} AS lat
        FROM documents
    ), tq AS (
        SELECT doc_id, lon,
               {OM_H!r} / pow(
                   tan(0.7853981633974483 - radians(lat) / 2.0)
                   / pow((1.0 - {e} * sin(radians(lat)))
                         / (1.0 + {e} * sin(radians(lat))), {repr(OM_E / 2.0)}),
                   {OM_B!r}) AS q
        FROM docs_geo
    ), parts AS (
        SELECT doc_id,
               (q - 1.0 / q) / 2.0 AS ss,
               (q + 1.0 / q) / 2.0 AS tt,
               {OM_B!r} * (radians(lon) - {OM_LAM0!r}) AS dl
        FROM tq
    ), uv AS (
        SELECT doc_id,
               {OM_A!r} * ln((1.0 - ((-sin(dl) * {OM_CG0!r}
                   + ss * {OM_SG0!r}) / tt))
                   / (1.0 + ((-sin(dl) * {OM_CG0!r}
                   + ss * {OM_SG0!r}) / tt))) / {repr(2.0 * OM_B)} AS v,
               {OM_A!r} * atan2(ss * {OM_CG0!r} + sin(dl) * {OM_SG0!r},
                                cos(dl)) / {OM_B!r} - {OM_UC!r} AS u
        FROM parts
    )
    SELECT doc_id,
           FLOOR(({OM_X0!r} + v * {OM_CGC!r} + u * {OM_SGC!r})
               * 100.0 + 0.5) / 100.0 AS rso_x,
           FLOOR(({OM_Y0!r} + u * {OM_CGC!r} - v * {OM_SGC!r})
               * 100.0 + 0.5) / 100.0 AS rso_y
    FROM uv
    ORDER BY doc_id
    """
