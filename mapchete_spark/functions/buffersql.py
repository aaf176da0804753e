"""DuckDB twin of the V9 metric buffer (geometry/footprints.py).

Re-derives the FULL buffer_antimeridian_safe pipeline in SQL, operation
for operation:

  square ring (CCW)  ->  centroid zone pick  ->  ellipsoidal Krüger
  forward (per corner)  ->  miter vertex offset in UTM meters  ->
  Krüger INVERSE (beta series + 12 unrolled fixed-point iterations of
  the conformal-latitude inversion)  ->  unwrap + lat clip  ->
  per-doc coordinate digests.

Everything uses the SAME constants as geometry/reproject.py (embedded
via repr), hyperbolics expanded in exp/ln, and the engine's exact
accumulation order for the series sums. Residual libm/expansion ulps
(~1e-12 deg after the contraction of the fixed-point iterations) are
absorbed by the 2^-20-degree quantization of the digests.

Fixture (mirrored by __spark_entry__.q_metric_buffer): per footprint
doc, an axis-aligned CCW square of half-width w = radius*1.5 + 0.2
around (lon, lat), buffered by dist = 5000 + radius*20000 meters.
"""

from __future__ import annotations

from mapchete_spark.functions import geo as G
from mapchete_spark.geometry.reproject import (
    A_RECT,
    KRUGER_ALPHA,
    KRUGER_BETA,
    UTM_FALSE_EASTING,
    UTM_FALSE_NORTHING_SOUTH,
    UTM_K0,
    WGS84_E,
    _CONFORMAL_INV_ITERS,
)

_KA = repr(UTM_K0 * A_RECT)
_E = repr(WGS84_E)
_FE = repr(UTM_FALSE_EASTING)
_FN = repr(UTM_FALSE_NORTHING_SOUTH)


def _sinh(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2.0)"


def _cosh(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2.0)"


def _asinh(x: str) -> str:
    return f"ln(({x}) + sqrt(({x}) * ({x}) + 1.0))"


def _atanh(x: str) -> str:
    return f"(0.5 * ln((1.0 + ({x})) / (1.0 - ({x}))))"


def metric_buffer_sql() -> str:
    # forward series terms, engine accumulation order (j = 1..6)
    fwd_x_terms = " + ".join(
        f"{a!r} * cos({2 * j} * xi) * {_sinh(f'{2 * j} * eta')}"
        for j, a in enumerate(KRUGER_ALPHA, start=1)
    )
    fwd_y_terms = " + ".join(
        f"{a!r} * sin({2 * j} * xi) * {_cosh(f'{2 * j} * eta')}"
        for j, a in enumerate(KRUGER_ALPHA, start=1)
    )
    inv_x_terms = " - ".join(
        f"{b!r} * cos({2 * j} * xi2) * {_sinh(f'{2 * j} * eta2')}"
        for j, b in enumerate(KRUGER_BETA, start=1)
    )
    inv_y_terms = " - ".join(
        f"{b!r} * sin({2 * j} * xi2) * {_cosh(f'{2 * j} * eta2')}"
        for j, b in enumerate(KRUGER_BETA, start=1)
    )
    # 12 unrolled fixed-point iterations: phi <- atan(sinh(s + e*atanh(e*sin(phi))))
    iters = "".join(
        f""", it{i + 1} AS (
        SELECT doc_id, k, s, lon_part, cx,
               atan({_sinh(f"s + {_E} * {_atanh(f'{_E} * sin(phi)')}")}) AS phi
        FROM it{i}
    )"""
        for i in range(_CONFORMAL_INV_ITERS)
    )
    # CCW square corner offsets in ring order p0..p3
    ox = "CASE k WHEN 0 THEN -1.0 WHEN 1 THEN 1.0 WHEN 2 THEN 1.0 ELSE -1.0 END"
    oy = "CASE k WHEN 0 THEN -1.0 WHEN 1 THEN -1.0 WHEN 2 THEN 1.0 ELSE 1.0 END"
    return f"""
    WITH docs_geo AS (
        SELECT doc_id, {G.lon_sql("doc_id")} AS lon, {G.lat_sql("doc_id")} AS lat,
               {G.radius_sql("doc_id")} AS radius
        FROM documents
    ), fd AS (
        SELECT doc_id, lon, lat,
               radius * 1.5 + 0.2 AS w,
               5000.0 + radius * 20000.0 AS dist
        FROM docs_geo WHERE radius IS NOT NULL
    ), cen AS (
        -- np.mean over the CLOSED 5-point ring (p0 appears twice),
        -- engine summation order mirrored
        SELECT doc_id,
               (((((lon - w) + (lon + w)) + (lon + w)) + (lon - w)) + (lon - w)) / 5.0 AS cx,
               (((((lat - w) + (lat - w)) + (lat + w)) + (lat + w)) + (lat - w)) / 5.0 AS cy
        FROM fd
    ), zone AS (
        SELECT doc_id, cx,
               LEAST(GREATEST(CAST(FLOOR((cx + 180.0) / 6.0) AS INT) + 1, 1), 60) AS z,
               cy < 0 AS south
        FROM cen
    ), zl AS (
        SELECT doc_id, cx, south, -183.0 + 6.0 * z AS lon0 FROM zone
    ), corners AS (
        SELECT f.doc_id, kk.k, f.dist, zl.cx, zl.south, zl.lon0,
               f.lon + ({ox}) * f.w AS px,
               f.lat + ({oy}) * f.w AS py
        FROM fd f
        JOIN zl ON zl.doc_id = f.doc_id
        CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2), (3)) t(k)) kk
    ), args AS (
        SELECT doc_id, k, dist, cx, south, lon0,
               radians(px - lon0) AS lam, radians(py) AS phi
        FROM corners
    ), conf AS (
        SELECT doc_id, k, dist, cx, south, lon0, lam,
               {_sinh(f"{_asinh('tan(phi)')} - {_E} * {_atanh(f'{_E} * sin(phi)')}")} AS t
        FROM args
    ), gauss AS (
        SELECT doc_id, k, dist, cx, south, lon0,
               atan2(t, cos(lam)) AS xi,
               {_asinh('sin(lam) / sqrt(t * t + cos(lam) * cos(lam))')} AS eta
        FROM conf
    ), utm AS (
        SELECT doc_id, k, dist, cx, south, lon0,
               {_KA} * (eta + {fwd_x_terms}) + {_FE} AS ux,
               {_KA} * (xi + {fwd_y_terms})
                   + CASE WHEN south THEN {_FN} ELSE 0.0 END AS uy
        FROM gauss
    ), nbr AS (
        SELECT c.doc_id, c.k, c.dist, c.cx, c.south, c.lon0, c.ux, c.uy,
               p.ux AS pux, p.uy AS puy, n.ux AS nux, n.uy AS nuy
        FROM utm c
        JOIN utm p ON p.doc_id = c.doc_id AND p.k = (c.k + 3) % 4
        JOIN utm n ON n.doc_id = c.doc_id AND n.k = (c.k + 1) % 4
    ), normals AS (
        -- outward normal of a CCW edge (dx, dy) is (dy, -dx), unit
        SELECT doc_id, k, dist, cx, south, lon0, ux, uy,
               (uy - puy) / sqrt((uy - puy) * (uy - puy) + (ux - pux) * (ux - pux)) AS nix,
               (-(ux - pux)) / sqrt((uy - puy) * (uy - puy) + (ux - pux) * (ux - pux)) AS niy,
               (nuy - uy) / sqrt((nuy - uy) * (nuy - uy) + (nux - ux) * (nux - ux)) AS nox,
               (-(nux - ux)) / sqrt((nuy - uy) * (nuy - uy) + (nux - ux) * (nux - ux)) AS noy
        FROM nbr
    ), miter AS (
        SELECT doc_id, k, dist, cx, south, lon0, ux, uy, nix, niy,
               (nix + nox) / sqrt((nix + nox) * (nix + nox) + (niy + noy) * (niy + noy)) AS nax,
               (niy + noy) / sqrt((nix + nox) * (nix + nox) + (niy + noy) * (niy + noy)) AS nay
        FROM normals
    ), offs AS (
        SELECT doc_id, k, cx, south, lon0,
               ux + nax * (dist / LEAST(GREATEST(nax * nix + nay * niy, 0.2), 1.0)) AS bx,
               uy + nay * (dist / LEAST(GREATEST(nax * nix + nay * niy, 0.2), 1.0)) AS by_
        FROM miter
    ), invargs AS (
        SELECT doc_id, k, cx, lon0,
               (bx - {_FE}) / ({_KA}) AS eta2,
               (by_ - CASE WHEN south THEN {_FN} ELSE 0.0 END) / ({_KA}) AS xi2
        FROM offs
    ), invser AS (
        SELECT doc_id, k, cx, lon0,
               eta2 - {inv_x_terms} AS xp,
               xi2 - {inv_y_terms} AS yp
        FROM invargs
    ), it0 AS (
        SELECT doc_id, k,
               atan(t2) AS phi,
               {_asinh('t2')} AS s,
               lon0 + degrees(atan2(sh_xp, cos(yp))) AS lon_part,
               cx
        FROM (
            SELECT doc_id, k, cx, lon0, yp,
                   {_sinh('xp')} AS sh_xp,
                   sin(yp) / sqrt({_sinh('xp')} * {_sinh('xp')} + cos(yp) * cos(yp)) AS t2
            FROM invser
        ) q
    ){iters}, pts AS (
        SELECT i.doc_id,
               CASE WHEN i.lon_part - i.cx > 180.0 THEN i.lon_part - 360.0
                    WHEN i.cx - (CASE WHEN i.lon_part - i.cx > 180.0
                                      THEN i.lon_part - 360.0
                                      ELSE i.lon_part END) > 180.0
                    THEN (CASE WHEN i.lon_part - i.cx > 180.0
                               THEN i.lon_part - 360.0
                               ELSE i.lon_part END) + 360.0
                    ELSE i.lon_part END AS vlon,
               LEAST(GREATEST(degrees(i.phi), -90.0), 90.0) AS vlat
        FROM it{_CONFORMAL_INV_ITERS} i
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_vertices,
           CAST(SUM(CAST(FLOOR(vlon * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT) AS qlon,
           CAST(SUM(CAST(FLOOR(vlat * 1048576.0 + 0.5) AS BIGINT)) AS BIGINT) AS qlat
    FROM pts
    GROUP BY doc_id
    ORDER BY doc_id
    """
