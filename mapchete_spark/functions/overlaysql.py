"""Rotated-footprint union fixture + its DuckDB slab-overlay twin.

The V3 general-dissolve contract query (``vector_union_rotated``)
measures the EXACT per-tile union area of rotated square footprints
derived deterministically from the documents table. The engine side
computes it with geometry/overlay's slab decomposition in numpy; this
module re-derives the identical decomposition in pure SQL (windows for
the interval sweep), with every arithmetic step mirrored
operation-for-operation so both engines produce the same doubles:

    breakpoints  = edge starts + proper pairwise intersections + box edges
    midpoint     = x0 + (x1 - x0) / 2
    crossing     = y0 + (xm - x0) * ((y1 - y0) / (x1 - x0))
    parity       = sorted crossings per feature, consecutive pairs
    island break = lo > running MAX(hi) over preceding intervals
    slab measure = SUM(island MAX(hi) - island MIN(lo)) * width

Final areas are quantized with FLOOR(area * 10000 + 0.5) (1e-4 deg^2)
to absorb summation-order ulps.

Fixture: each footprint doc (doc_id % 20 == 3 in the synthetic geo
derivation, functions/geo.py) gets TWO overlapping rotated squares so
the union machinery is exercised within every doc:

    r  = radius * 15 + 2                (2.15 .. 32 deg half-width)
    a1 = radians((doc_id % 89) * 7)
    sq0: center (lon, lat),             half r,       angle a1
    sq1: center (lon + r/2, lat - r/4), half r * 0.7, angle a1 + 0.6

Squares are clipped to the doc's zoom-1 center tile (90 deg tiles).
"""

from __future__ import annotations

import numpy as np

from mapchete_spark.functions import geo as G

UNION_ZOOM = 1
UNION_TS = 90.0  # geodetic tile size at zoom 1 (dyadic, exact)

# edge k of a square runs corner k -> corner (k+1) % 4 with unit
# offsets c0=(-1,-1) c1=(1,-1) c2=(1,1) c3=(-1,1)
_EDGE_OFFS = (
    (-1.0, -1.0, 1.0, -1.0),
    (1.0, -1.0, 1.0, 1.0),
    (1.0, 1.0, -1.0, 1.0),
    (-1.0, 1.0, -1.0, -1.0),
)


def square_params(doc_id: int, lon: float, lat: float, radius: float):
    """(cx, cy, half_width, angle) for the doc's two squares — mirrored
    in SQL below."""
    r = radius * 15.0 + 2.0
    a1 = np.radians(float(doc_id % 89) * 7.0)
    return [
        (lon, lat, r, a1),
        (lon + r * 0.5, lat - r * 0.25, r * 0.7, a1 + 0.6),
    ]


def square_ring(cx: float, cy: float, hw: float, ang: float) -> np.ndarray:
    """Closed 5-point ring of the rotated square; corner arithmetic
    mirrored in SQL: x = cx + cos(a)*(ox*hw) - sin(a)*(oy*hw)."""
    ca, sa = np.cos(ang), np.sin(ang)
    pts = []
    for ox0, oy0, _, _ in _EDGE_OFFS:
        pts.append(
            (cx + ca * (ox0 * hw) - sa * (oy0 * hw),
             cy + sa * (ox0 * hw) + ca * (oy0 * hw))
        )
    pts.append(pts[0])
    return np.array(pts, dtype=np.float64)


def tile_of(lon: float, lat: float):
    """Zoom-1 tile of the square's center — clamped floor, mirrored to
    functions/geo.tile_row_sql/tile_col_sql at zoom 1."""
    raw_c = int(np.floor((lon + 180.0) / UNION_TS))
    raw_r = int(np.floor((90.0 - lat) / UNION_TS))
    return min(max(raw_r, 0), 1), min(max(raw_c, 0), 3)


def tile_box(tr: int, tc: int):
    bl = -180.0 + tc * UNION_TS
    bt = 90.0 - tr * UNION_TS
    return bl, bt - UNION_TS, bl + UNION_TS, bt  # left, bottom, right, top


def union_rotated_sql() -> str:
    """Full DuckDB twin: slab-overlay union area per zoom-1 tile."""
    ox0 = "CASE k WHEN 0 THEN -1.0 WHEN 1 THEN 1.0 WHEN 2 THEN 1.0 ELSE -1.0 END"
    oy0 = "CASE k WHEN 0 THEN -1.0 WHEN 1 THEN -1.0 WHEN 2 THEN 1.0 ELSE 1.0 END"
    ox1 = "CASE k WHEN 0 THEN 1.0 WHEN 1 THEN 1.0 WHEN 2 THEN -1.0 ELSE -1.0 END"
    oy1 = "CASE k WHEN 0 THEN -1.0 WHEN 1 THEN 1.0 WHEN 2 THEN 1.0 ELSE -1.0 END"
    return f"""
    WITH docs_geo AS (
        SELECT doc_id, {G.lon_sql("doc_id")} AS lon, {G.lat_sql("doc_id")} AS lat,
               {G.radius_sql("doc_id")} AS radius
        FROM documents
    ), fd AS (
        SELECT doc_id, lon, lat,
               radius * 15.0 + 2.0 AS r,
               radians(CAST(doc_id % 89 AS DOUBLE) * 7.0) AS a1,
               {G.tile_row_sql("lat", str(UNION_ZOOM))} AS tr,
               {G.tile_col_sql("lon", str(UNION_ZOOM))} AS tc
        FROM docs_geo WHERE radius IS NOT NULL
    ), sq AS (
        SELECT fd.*, v.s,
               CASE WHEN v.s = 0 THEN lon ELSE lon + r * 0.5 END AS cx,
               CASE WHEN v.s = 0 THEN lat ELSE lat - r * 0.25 END AS cy,
               CASE WHEN v.s = 0 THEN r ELSE r * 0.7 END AS hw,
               CASE WHEN v.s = 0 THEN a1 ELSE a1 + 0.6 END AS ang
        FROM fd CROSS JOIN (SELECT * FROM (VALUES (0), (1)) t(s)) v
    ), edges AS (
        SELECT doc_id, tr, tc, (doc_id * 8 + s * 4 + k) AS eid,
               cx + cos(ang) * (({ox0}) * hw) - sin(ang) * (({oy0}) * hw) AS ex0,
               cy + sin(ang) * (({ox0}) * hw) + cos(ang) * (({oy0}) * hw) AS ey0,
               cx + cos(ang) * (({ox1}) * hw) - sin(ang) * (({oy1}) * hw) AS ex1,
               cy + sin(ang) * (({ox1}) * hw) + cos(ang) * (({oy1}) * hw) AS ey1,
               (doc_id * 2 + s) AS fid,
               -180.0 + tc * {UNION_TS!r} AS bl,
               -180.0 + tc * {UNION_TS!r} + {UNION_TS!r} AS br,
               90.0 - tr * {UNION_TS!r} AS bt,
               90.0 - tr * {UNION_TS!r} - {UNION_TS!r} AS bb
        FROM sq CROSS JOIN (SELECT * FROM (VALUES (0), (1), (2), (3)) t(k)) kk
    ), bpi_raw AS (
        SELECT e1.tr AS tr, e1.tc AS tc, e1.bl AS bl, e1.br AS br,
               e1.ex0 AS ax, e1.ex1 - e1.ex0 AS dx1, e1.ey1 - e1.ey0 AS dy1,
               e2.ex0 - e1.ex0 AS rx, e2.ey0 - e1.ey0 AS ry,
               e2.ex1 - e2.ex0 AS dx2, e2.ey1 - e2.ey0 AS dy2
        FROM edges e1 JOIN edges e2
          ON e1.tr = e2.tr AND e1.tc = e2.tc AND e1.eid < e2.eid
    ), bpi AS (
        SELECT tr, tc, bl, br, ax + t * dx1 AS x
        FROM (
            SELECT tr, tc, bl, br, ax, dx1,
                   (rx * dy2 - ry * dx2) / (dx1 * dy2 - dy1 * dx2) AS t,
                   (rx * dy1 - ry * dx1) / (dx1 * dy2 - dy1 * dx2) AS u,
                   dx1 * dy2 - dy1 * dx2 AS den
            FROM bpi_raw
        )
        WHERE den <> 0 AND t > 0.0 AND t < 1.0 AND u > 0.0 AND u < 1.0
    ), bpy AS (
        -- edge crossings with the clip box's horizontal boundaries:
        -- without these cuts the GREATEST/LEAST clamp in ivc kinks
        -- inside a slab and the midpoint measure is no longer exact
        -- (mirrors geometry/overlay._slab_cuts)
        SELECT tr, tc, bl, br,
               ex0 + ((yb - ey0) / (ey1 - ey0)) * (ex1 - ex0) AS x
        FROM edges CROSS JOIN (SELECT * FROM (VALUES (0), (1)) t(hb)) v
        CROSS JOIN LATERAL (SELECT CASE WHEN hb = 0 THEN bb ELSE bt END AS yb) yy
        WHERE LEAST(ey0, ey1) < yb AND yb < GREATEST(ey0, ey1)
    ), bps AS (
        SELECT DISTINCT tr, tc, x FROM (
            SELECT tr, tc, ex0 AS x, bl, br FROM edges
            UNION ALL SELECT tr, tc, x, bl, br FROM bpi
            UNION ALL SELECT tr, tc, x, bl, br FROM bpy
        ) WHERE x > bl AND x < br
        UNION SELECT DISTINCT tr, tc, bl FROM edges
        UNION SELECT DISTINCT tr, tc, br FROM edges
    ), slabs AS (
        SELECT tr, tc, x AS x0,
               LEAD(x) OVER (PARTITION BY tr, tc ORDER BY x) AS x1
        FROM bps
    ), slabm AS (
        SELECT tr, tc, x0, x1 - x0 AS w, x0 + (x1 - x0) / 2.0 AS xm
        FROM slabs WHERE x1 IS NOT NULL AND x1 > x0
    ), crossings AS (
        SELECT s.tr, s.tc, s.x0, s.w, e.fid, e.bb, e.bt,
               e.ey0 + ((s.xm - e.ex0) / (e.ex1 - e.ex0)) * (e.ey1 - e.ey0) AS yv
        FROM slabm s JOIN edges e ON e.tr = s.tr AND e.tc = s.tc
        WHERE LEAST(e.ex0, e.ex1) < s.xm AND s.xm < GREATEST(e.ex0, e.ex1)
    ), iv AS (
        SELECT tr, tc, x0, w, bb, bt, yv AS lo,
               LEAD(yv) OVER (PARTITION BY tr, tc, x0, fid ORDER BY yv) AS hi,
               ROW_NUMBER() OVER (PARTITION BY tr, tc, x0, fid ORDER BY yv) AS rn
        FROM crossings
    ), ivc AS (
        SELECT tr, tc, x0, w, GREATEST(lo, bb) AS lo, LEAST(hi, bt) AS hi
        FROM iv WHERE rn % 2 = 1 AND hi IS NOT NULL
    ), ivk AS (
        SELECT * FROM ivc WHERE hi > lo
    ), brks AS (
        SELECT tr, tc, x0, w, lo, hi,
               CASE WHEN lo > COALESCE(MAX(hi) OVER (
                        PARTITION BY tr, tc, x0 ORDER BY lo, hi
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1e308)
                    THEN 1 ELSE 0 END AS brk
        FROM ivk
    ), grps AS (
        SELECT tr, tc, x0, w, lo, hi,
               SUM(brk) OVER (PARTITION BY tr, tc, x0 ORDER BY lo, hi
                              ROWS UNBOUNDED PRECEDING) AS g
        FROM brks
    ), islands AS (
        SELECT tr, tc, x0, MIN(w) AS w, MAX(hi) - MIN(lo) AS len
        FROM grps GROUP BY tr, tc, x0, g
    ), slabsum AS (
        SELECT tr, tc, x0, MIN(w) AS w, SUM(len) AS cov
        FROM islands GROUP BY tr, tc, x0
    ), pertile AS (
        SELECT tr, tc, SUM(cov * w) AS area
        FROM slabsum GROUP BY tr, tc
    ), ndocs AS (
        SELECT tr, tc, COUNT(DISTINCT doc_id) AS n_docs FROM fd GROUP BY tr, tc
    )
    SELECT CAST({UNION_ZOOM} AS INT) AS zoom,
           n.tr AS tile_row, n.tc AS tile_col, n.n_docs AS n_docs,
           CAST(FLOOR(COALESCE(p.area, 0.0) * 10000.0 + 0.5) AS BIGINT) AS area_q
    FROM ndocs n LEFT JOIN pertile p ON p.tr = n.tr AND p.tc = n.tc
    ORDER BY tile_row, tile_col
    """
