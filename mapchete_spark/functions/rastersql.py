"""DuckDB SQL twins of the raster pipeline over the analytic DEM.

The geodetic tile lattice is exactly dyadic (tile/pixel sizes are
45/2^k degrees), so every pixel-center lon/lat the engine samples is an
exact double, and the analytic elevation (raster/dem.py) is one trig
expression away — float32-cast on BOTH engines, which absorbs any
last-ulp libm divergence. That makes the whole raster family
(DEM materialization, Horn hillshade, marching-squares contours,
average-overview reduction, cross-pyramid tiledir warps) exactly
recomputable in SQL: the oracle re-derives per-tile integer digests
(valid-pixel counts, quantized value sums, positional checksums) from
closed form, no goldens involved.

Every generator here is built from the SAME constants the Spark side
uses (raster/dem.py DEM_*, raster/terrain._MS_SEGMENTS, the pyramid's
pixel sizes), keeping the repo's oracle-twin guarantee.

Digest conventions (mirrored by operators/digests.py):
- value_q_sum: SUM(FLOOR(float64(v) * 16)) over valid pixels — exact
  integer arithmetic on both engines (x16 is an exact float scaling).
- shade_sum / shade_wsum: SUM(shade) and SUM(shade * ((i*256+j) % 9973))
  over the uint8 hillshade — a positional checksum, order-free.
- len_q: SUM(FLOOR(segment_length * 2^18)) per (tile, level) — the
  marching-squares interpolation is pure double arithmetic on
  float32-exact corners, hence bit-identical across engines.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from mapchete_spark.raster.dem import (
    DEM_AMP1,
    DEM_AMP2,
    DEM_BASE,
    DEM_HOLE_BELOW,
    DEM_LAT_P1,
    DEM_LAT_P2,
    DEM_LON_P1,
    DEM_LON_P2,
)
from mapchete_spark.tilegrid.pyramid import TilePyramid

TILE_SIZE = 256
QUANT = 16.0
WMOD = 9973
LEN_QUANT = 262144.0  # 2^18


def _r(x: float) -> str:
    """Full-precision SQL literal of a double."""
    return repr(float(x))


def _geodetic_sizes(zoom: int):
    pyr = TilePyramid("geodetic")
    return pyr.tile_x_size(zoom), pyr.pixel_x_size(zoom)


# ---- lattice + elevation building blocks -------------------------------------


def _rows_cte(name: str, gi0: int, gi1: int, px: float) -> str:
    """Per-global-pixel-row trig terms of the separable DEM field
    (mirrors elevation_grid's outer-product form)."""
    return f"""
    {name} AS (
        SELECT gi,
               cos(lat * pi() / {_r(DEM_LAT_P1)}) AS cy1,
               sin(lat * pi() / {_r(DEM_LAT_P2)}) AS sy2
        FROM (
            SELECT gi, 90.0 - (gi + 0.5) * {_r(px)} AS lat
            FROM (SELECT UNNEST(generate_series({gi0}, {gi1})) AS gi)
        )
    )"""


def _cols_cte(name: str, gj0: int, gj1: int, px: float) -> str:
    return f"""
    {name} AS (
        SELECT gj,
               sin(lon * pi() / {_r(DEM_LON_P1)}) AS sx1,
               sin(lon * pi() / {_r(DEM_LON_P2)}) AS sx2
        FROM (
            SELECT gj, -180.0 + (gj + 0.5) * {_r(px)} AS lon
            FROM (SELECT UNNEST(generate_series({gj0}, {gj1})) AS gj)
        )
    )"""


def _elev_f32(cy1: str, sy2: str, sx1: str, sx2: str) -> str:
    """float32 elevation from the separable trig terms (exactly
    elevation_grid's operation order: (base + a1*o1) + (a2*o2))."""
    return (
        f"CAST(({_r(DEM_BASE)} + {_r(DEM_AMP1)} * ({cy1} * {sx1}))"
        f" + ({_r(DEM_AMP2)} * ({sy2} * {sx2})) AS FLOAT)"
    )


def _qsum(expr: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(CAST({expr} AS DOUBLE) * {_r(QUANT)}) AS BIGINT)) AS BIGINT)"


# ---- S1: dem_tiles ------------------------------------------------------------


def dem_tiles_sql(zoom: int, row0: int, row1: int, col0: int, col1: int,
                  hole: bool = True) -> str:
    """Per-tile digest of materialize_dem: n_valid + quantized value sum
    (hole pixels, elev < DEM_HOLE_BELOW, are nodata)."""
    _, px = _geodetic_sizes(zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1
    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    valid = f"({e}) >= {_r(DEM_HOLE_BELOW)}" if hole else "TRUE"
    return f"""
    WITH {_rows_cte("rows_g", gi0, gi1, px)},
    {_cols_cte("cols_g", gj0, gj1, px)},
    px AS (
        SELECT r.gi, c.gj,
               CASE WHEN {valid} THEN {e} ELSE NULL END AS e
        FROM rows_g r CROSS JOIN cols_g c
    )
    SELECT {zoom} AS zoom,
           gi // {TILE_SIZE} AS tile_row,
           gj // {TILE_SIZE} AS tile_col,
           1 AS bands, {TILE_SIZE} AS height, {TILE_SIZE} AS width,
           CAST(COUNT(e) AS BIGINT) AS n_valid,
           COALESCE({_qsum("e")}, 0) AS value_q_sum
    FROM px
    GROUP BY 2, 3
    ORDER BY tile_row, tile_col
    """


# ---- P1: hillshade -------------------------------------------------------------


def hillshade_sql(zoom: int, row0: int, row1: int, col0: int, col1: int,
                  azimuth: float = 315.0, altitude: float = 45.0,
                  z: float = 1.0, scale: float = 1.0) -> str:
    """Horn hillshade digest per tile, recomputed closed-form: each
    output pixel's 3x3 DEM window comes straight from the lattice
    (the halo exchange is exact arithmetic there). Constants follow
    raster/terrain.py hillshade()/calculate_slope_aspect() verbatim."""
    _, px = _geodetic_sizes(zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1
    deg2rad = math.pi / 180.0
    sin_alt = float(np.sin(float(altitude) * deg2rad))
    cos_alt = float(np.cos(float(altitude) * deg2rad))
    az_k = (float(azimuth) - 90.0) * deg2rad
    xres, yres = px, -px
    denx = 8.0 * xres * float(scale)
    deny = 8.0 * yres * float(scale)

    def e(r: str, c: str) -> str:
        f32 = _elev_f32(f"{r}.cy1", f"{r}.sy2", f"{c}.sx1", f"{c}.sx2")
        return f"CAST({f32} AS DOUBLE)"

    # w-index mapping of calculate_slope_aspect: w[r*3+c] = window
    # shifted by (r, c); center output pixel sits at (+1, +1)
    e_mm, e_m0, e_mp = e("rm", "cm"), e("rm", "c0"), e("rm", "cp")
    e_0m, e_0p = e("r0", "cm"), e("r0", "cp")
    e_pm, e_p0, e_pp = e("rp", "cm"), e("rp", "c0"), e("rp", "cp")
    return f"""
    WITH {_rows_cte("rows_g", gi0 - 1, gi1 + 1, px)},
    {_cols_cte("cols_g", gj0 - 1, gj1 + 1, px)},
    base AS (
        SELECT r.gi, c.gj
        FROM (SELECT UNNEST(generate_series({gi0}, {gi1})) AS gi) r
        CROSS JOIN (SELECT UNNEST(generate_series({gj0}, {gj1})) AS gj) c
    ),
    exy AS (
        SELECT b.gi, b.gj,
               (({e_mm} + {e_0m} + {e_0m} + {e_pm})
                - ({e_mp} + {e_0p} + {e_0p} + {e_pp})) / {_r(denx)} AS x,
               (({e_pm} + {e_p0} + {e_p0} + {e_pp})
                - ({e_mm} + {e_m0} + {e_m0} + {e_mp})) / {_r(deny)} AS y
        FROM base b
        JOIN rows_g rm ON rm.gi = b.gi - 1
        JOIN rows_g r0 ON r0.gi = b.gi
        JOIN rows_g rp ON rp.gi = b.gi + 1
        JOIN cols_g cm ON cm.gj = b.gj - 1
        JOIN cols_g c0 ON c0.gj = b.gj
        JOIN cols_g cp ON cp.gj = b.gj + 1
    ),
    sh AS (
        SELECT gi, gj,
               CAST(FLOOR(LEAST(GREATEST(
                   ({_r(sin_alt)} * sin(pi() / 2 - atan(sqrt(x * x + y * y)))
                    + ({_r(cos_alt)} * cos(pi() / 2 - atan(sqrt(x * x + y * y))))
                      * cos({_r(az_k)} - atan2(x, y))) * 255.0,
                   1.0), 255.0)) AS BIGINT) AS shade
        FROM exy
    )
    SELECT {zoom} AS zoom,
           gi // {TILE_SIZE} AS tile_row,
           gj // {TILE_SIZE} AS tile_col,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(shade) AS BIGINT) AS shade_sum,
           CAST(SUM(shade * (((gi % {TILE_SIZE}) * {TILE_SIZE} + (gj % {TILE_SIZE})) % {WMOD})) AS BIGINT) AS shade_wsum
    FROM sh
    GROUP BY 2, 3
    ORDER BY tile_row, tile_col
    """


# ---- P2: contours --------------------------------------------------------------


def contours_sql(zoom: int, row0: int, row1: int, col0: int, col1: int,
                 interval: float = 200.0, base: float = 0.0) -> str:
    """Marching-squares contour digest per (tile, level): segment count
    + quantized total length. Segment table and interpolation mirror
    raster/terrain._MS_SEGMENTS / _marching_squares; lengths replicate
    generate_contours' map-coordinate mapping (x = left + col*px,
    y = top - row*py)."""
    from mapchete_spark.raster.terrain import _MS_SEGMENTS

    ts, px = _geodetic_sizes(zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1

    # seg1 applies to every nontrivial case; seg2 only to the saddles
    seg1_e0, seg1_e1, seg2 = [], [], {}
    for cs, segs in _MS_SEGMENTS.items():
        if not segs:
            continue
        seg1_e0.append(f"WHEN {cs} THEN {segs[0][0]}")
        seg1_e1.append(f"WHEN {cs} THEN {segs[0][1]}")
        if len(segs) > 1:
            seg2[cs] = segs[1]
    seg2_e0 = " ".join(f"WHEN {cs} THEN {e0}" for cs, (e0, _) in seg2.items())
    seg2_e1 = " ".join(f"WHEN {cs} THEN {e1}" for cs, (_, e1) in seg2.items())
    seg2_cases = ", ".join(str(cs) for cs in seg2)

    def pt_r(e: str) -> str:
        return (f"CASE {e} WHEN 0 THEN i + 0.0 WHEN 1 THEN i + t_right "
                f"WHEN 2 THEN i + 1.0 ELSE i + t_left END")

    def pt_c(e: str) -> str:
        return (f"CASE {e} WHEN 0 THEN j + t_top WHEN 1 THEN j + 1.0 "
                f"WHEN 2 THEN j + t_bottom ELSE j + 0.0 END")

    def interp(v0: str, v1: str) -> str:
        return (f"CASE WHEN {v1} = {v0} THEN 0.5 "
                f"ELSE (level - {v0}) / ({v1} - {v0}) END")

    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    # map coords exactly as generate_contours: left + c*px, top - r*py
    x_of = "(-180.0 + tile_col * {ts}) + ({c} * {px})"
    y_of = "(90.0 - tile_row * {ts}) - ({r} * {px})"
    x0 = x_of.format(ts=_r(ts), px=_r(px), c="c0_")
    x1 = x_of.format(ts=_r(ts), px=_r(px), c="c1_")
    y0 = y_of.format(ts=_r(ts), px=_r(px), r="r0_")
    y1 = y_of.format(ts=_r(ts), px=_r(px), r="r1_")

    return f"""
    WITH {_rows_cte("rows_g", gi0, gi1, px)},
    {_cols_cte("cols_g", gj0, gj1, px)},
    pixels AS (
        SELECT r.gi, c.gj, {e} AS e
        FROM rows_g r CROSS JOIN cols_g c
    ),
    tile_stats AS (
        SELECT gi // {TILE_SIZE} AS tr, gj // {TILE_SIZE} AS tc,
               CAST(MIN(e) AS DOUBLE) AS amin, CAST(MAX(e) AS DOUBLE) AS amax
        FROM pixels GROUP BY 1, 2
    ),
    lv AS (
        SELECT tr, tc, {_r(base)} + k * {_r(interval)} AS level
        FROM tile_stats, (SELECT UNNEST(generate_series(-8, 16)) AS k)
        WHERE {_r(base)} + k * {_r(interval)} >= amin
          AND {_r(base)} + k * {_r(interval)} <= amax
    ),
    cells AS (
        SELECT p.gi, p.gj,
               p.gi % {TILE_SIZE} AS i, p.gj % {TILE_SIZE} AS j,
               CAST(p.e AS DOUBLE) AS v_tl,
               CAST(pr.e AS DOUBLE) AS v_tr,
               CAST(pb.e AS DOUBLE) AS v_bl,
               CAST(pbr.e AS DOUBLE) AS v_br
        FROM pixels p
        JOIN pixels pr ON pr.gi = p.gi AND pr.gj = p.gj + 1
        JOIN pixels pb ON pb.gi = p.gi + 1 AND pb.gj = p.gj
        JOIN pixels pbr ON pbr.gi = p.gi + 1 AND pbr.gj = p.gj + 1
        WHERE p.gi % {TILE_SIZE} < {TILE_SIZE - 1}
          AND p.gj % {TILE_SIZE} < {TILE_SIZE - 1}
    ),
    cased AS (
        SELECT c.gi // {TILE_SIZE} AS tr, c.gj // {TILE_SIZE} AS tc,
               c.i, c.j, l.level,
               (CASE WHEN v_tl >= level THEN 8 ELSE 0 END
                + CASE WHEN v_tr >= level THEN 4 ELSE 0 END
                + CASE WHEN v_br >= level THEN 2 ELSE 0 END
                + CASE WHEN v_bl >= level THEN 1 ELSE 0 END) AS cs,
               {interp("v_tl", "v_tr")} AS t_top,
               {interp("v_tr", "v_br")} AS t_right,
               {interp("v_bl", "v_br")} AS t_bottom,
               {interp("v_tl", "v_bl")} AS t_left
        FROM cells c
        JOIN lv l ON l.tr = c.gi // {TILE_SIZE} AND l.tc = c.gj // {TILE_SIZE}
    ),
    segs AS (
        SELECT tr, tc, level, i, j, t_top, t_right, t_bottom, t_left,
               CASE cs {' '.join(seg1_e0)} END AS e0,
               CASE cs {' '.join(seg1_e1)} END AS e1
        FROM cased WHERE cs > 0 AND cs < 15
        UNION ALL
        SELECT tr, tc, level, i, j, t_top, t_right, t_bottom, t_left,
               CASE cs {seg2_e0} END, CASE cs {seg2_e1} END
        FROM cased WHERE cs IN ({seg2_cases})
    ),
    pts AS (
        SELECT tr AS tile_row, tc AS tile_col, level,
               {pt_r("e0")} AS r0_, {pt_c("e0")} AS c0_,
               {pt_r("e1")} AS r1_, {pt_c("e1")} AS c1_
        FROM segs
    ),
    lens AS (
        SELECT tile_row, tile_col, level,
               CAST(FLOOR(sqrt(
                   (({x1}) - ({x0})) * (({x1}) - ({x0}))
                   + (({y1}) - ({y0})) * (({y1}) - ({y0}))
               ) * {_r(LEN_QUANT)}) AS BIGINT) AS len_q
        FROM pts
    )
    SELECT {zoom} AS zoom, tile_row, tile_col, level,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(len_q) AS BIGINT) AS len_q_sum
    FROM lens
    GROUP BY 2, 3, 4
    ORDER BY tile_row, tile_col, level
    """


# ---- Z1: overviews -------------------------------------------------------------


def overviews_sql(base_zoom: int, min_zoom: int,
                  row0: int, row1: int, col0: int, col1: int) -> str:
    """Average-resampled overview digest for every level from
    base_zoom-1 down to min_zoom: each parent pixel is the float32 cast
    of the mean of its (present) 2x2 children, exactly as create_mosaic
    + resample_from_array('average') compute it; pixels whose children
    are absent are nodata and excluded from the digest."""
    _, px = _geodetic_sizes(base_zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1
    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    ctes = [
        _rows_cte("rows_g", gi0, gi1, px).strip(),
        _cols_cte("cols_g", gj0, gj1, px).strip(),
        f"""px_{base_zoom} AS (
        SELECT r.gi, c.gj, {e} AS e
        FROM rows_g r CROSS JOIN cols_g c
    )""",
    ]
    selects: List[str] = []
    for z in range(base_zoom - 1, min_zoom - 1, -1):
        ctes.append(f"""px_{z} AS (
        SELECT gi // 2 AS gi, gj // 2 AS gj,
               CAST(SUM(CAST(e AS DOUBLE)) / COUNT(e) AS FLOAT) AS e
        FROM px_{z + 1}
        GROUP BY 1, 2
    )""")
        selects.append(f"""
    SELECT {z} AS zoom,
           gi // {TILE_SIZE} AS tile_row,
           gj // {TILE_SIZE} AS tile_col,
           CAST(COUNT(e) AS BIGINT) AS n_valid,
           {_qsum("e")} AS value_q_sum
    FROM px_{z}
    GROUP BY 2, 3""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\nSELECT * FROM ("
        + "\nUNION ALL".join(selects)
        + ")\nORDER BY zoom DESC, tile_row, tile_col"
    )


# ---- S3: tiledir_read (cross-pyramid warp) --------------------------------------


MERC_R = 6378137.0
MERC_MAX_LAT = 85.0511287798066


def _merc_rows_cte(name: str, zoom: int, gi0: int, gi1: int, ty: float,
                   top0: float) -> str:
    """Mercator source lattice rows: per-global-pixel-row latitude via
    the closed-form inverse transform (exactly dem_window's op order:
    per-tile bounds -> pixel centers -> mercator_to_geodetic), then the
    DEM's separable trig terms."""
    lat = f"degrees(2.0 * atan(exp(y / {_r(MERC_R)})) - pi() / 2.0)"
    return f"""
    {name} AS (
        SELECT gi,
               cos({lat} * pi() / {_r(DEM_LAT_P1)}) AS cy1,
               sin({lat} * pi() / {_r(DEM_LAT_P2)}) AS sy2
        FROM (
            SELECT gi, top_t - (((gi % 256) + 0.5) * ((top_t - bot_t) / 256.0)) AS y
            FROM (
                SELECT gi,
                       ({_r(top0)} - ((gi // 256) * {_r(ty)})) AS top_t,
                       GREATEST(({_r(top0)} - ((gi // 256) * {_r(ty)})) - {_r(ty)},
                                {_r(-top0)}) AS bot_t
                FROM (SELECT UNNEST(generate_series({gi0}, {gi1})) AS gi)
            )
        )
    )"""


def _merc_cols_cte(name: str, zoom: int, gj0: int, gj1: int, tx: float,
                   left0: float) -> str:
    lon = f"degrees(x / {_r(MERC_R)})"
    return f"""
    {name} AS (
        SELECT gj,
               sin({lon} * pi() / {_r(DEM_LON_P1)}) AS sx1,
               sin({lon} * pi() / {_r(DEM_LON_P2)}) AS sx2
        FROM (
            SELECT gj, left_t + (((gj % 256) + 0.5) * ((right_t - left_t) / 256.0)) AS x
            FROM (
                SELECT gj,
                       ({_r(left0)} + ((gj // 256) * {_r(tx)})) AS left_t,
                       LEAST(({_r(left0)} + ((gj // 256) * {_r(tx)})) + {_r(tx)},
                             {_r(-left0)}) AS right_t
                FROM (SELECT UNNEST(generate_series({gj0}, {gj1})) AS gj)
            )
        )
    )"""


def tiledir_read_sql(dst_zoom: int, targets: list, src_ranges: dict) -> str:
    """Digest twin of read_tiledir (mercator source -> geodetic targets,
    nearest resampling). All grid math (zoom matching, source cover,
    mosaic bounds/pixel sizes) is precomputed per target with the SAME
    Python functions the operator uses and embedded as literals; pixel
    VALUES are recomputed in SQL: forward-transform the (dyadic) target
    pixel centers, truncate to the nearest mosaic index, inverse-
    transform that source pixel center and evaluate the DEM.

    targets: [{trow, tcol, sz, mleft, mtop, mpx, mpy, sw, sh, roff, coff}]
    src_ranges: {zoom: (row0, row1, col0, col1)} of materialized source.
    """
    from mapchete_spark.tilegrid.pyramid import TilePyramid

    geod = TilePyramid("geodetic")
    merc = TilePyramid("mercator")
    ts = geod.tile_x_size(dst_zoom)
    px = geod.pixel_x_size(dst_zoom)

    ctes = []
    for z, (r0, r1, c0, c1) in sorted(src_ranges.items()):
        ty = merc.tile_y_size(z)
        tx = merc.tile_x_size(z)
        ctes.append(_merc_rows_cte(
            f"mrows_{z}", z, r0 * 256, (r1 + 1) * 256 - 1, ty, merc.top
        ).strip())
        ctes.append(_merc_cols_cte(
            f"mcols_{z}", z, c0 * 256, (c1 + 1) * 256 - 1, tx, merc.left
        ).strip())

    vals = ",\n        ".join(
        f"({t['trow']}, {t['tcol']}, {t['sz']}, {_r(t['mleft'])}, {_r(t['mtop'])}, "
        f"{_r(t['mpx'])}, {_r(t['mpy'])}, {t['sw']}, {t['sh']}, {t['roff']}, {t['coff']})"
        for t in targets
    )
    ctes.append(f"""tgt AS (
        SELECT * FROM (VALUES
        {vals}
        ) AS v(trow, tcol, sz, mleft, mtop, mpx, mpy, sw, sh, roff, coff)
    )""")
    # target pixel centers -> mercator -> nearest mosaic index
    lon = f"((-180.0 + trow * 0.0 + tcol * {_r(ts)}) + ((jj.j + 0.5) * {_r(px)}))"
    lon = f"((-180.0 + tcol * {_r(ts)}) + ((jj.j + 0.5) * {_r(px)}))"
    lat = f"((90.0 - trow * {_r(ts)}) - ((ii.i + 0.5) * {_r(px)}))"
    sx = f"(radians({lon}) * {_r(MERC_R)})"
    lat_c = f"LEAST(GREATEST({lat}, {_r(-MERC_MAX_LAT)}), {_r(MERC_MAX_LAT)})"
    sy = f"(ln(tan(pi() / 4.0 + radians({lat_c}) / 2.0)) * {_r(MERC_R)})"
    ctes.append(f"""opx AS (
        SELECT t.trow, t.tcol, t.sz,
               t.roff + LEAST(GREATEST(CAST(trunc((t.mtop - {sy}) / t.mpy) AS BIGINT), 0), t.sh - 1) AS gsi,
               t.coff + LEAST(GREATEST(CAST(trunc(({sx} - t.mleft) / t.mpx) AS BIGINT), 0), t.sw - 1) AS gsj
        FROM tgt t
        CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS i) ii
        CROSS JOIN (SELECT UNNEST(generate_series(0, 255)) AS j) jj
    )""")
    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    branches = []
    for z in sorted(src_ranges):
        branches.append(f"""
    SELECT o.trow, o.tcol, {e} AS e
    FROM opx o
    JOIN mrows_{z} r ON r.gi = o.gsi
    JOIN mcols_{z} c ON c.gj = o.gsj
    WHERE o.sz = {z}""")
    return (
        "WITH " + ",\n    ".join(ctes)
        + ", ev AS (" + "\nUNION ALL".join(branches) + ")\n"
        + f"""
    SELECT {dst_zoom} AS zoom, trow AS tile_row, tcol AS tile_col,
           CAST(COUNT(e) AS BIGINT) AS n_valid,
           {_qsum("e")} AS value_q_sum
    FROM ev
    GROUP BY 2, 3
    ORDER BY tile_row, tile_col
    """
    )


# ---- S6: single-file mosaic ------------------------------------------------------


def single_mosaic_sql(zoom: int, row0: int, row1: int, col0: int, col1: int,
                      hole: bool = True) -> str:
    """One-row digest of the assembled single artifact: the mosaic of a
    full tile-range rectangle is exactly the contiguous lattice window,
    so the digest is the dem_tiles digest aggregated across all tiles."""
    _, px = _geodetic_sizes(zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1
    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    valid = f"({e}) >= {_r(DEM_HOLE_BELOW)}" if hole else "TRUE"
    h = (row1 - row0 + 1) * TILE_SIZE
    w = (col1 - col0 + 1) * TILE_SIZE
    return f"""
    WITH {_rows_cte("rows_g", gi0, gi1, px)},
    {_cols_cte("cols_g", gj0, gj1, px)},
    px AS (
        SELECT CASE WHEN {valid} THEN {e} ELSE NULL END AS e
        FROM rows_g r CROSS JOIN cols_g c
    )
    SELECT {zoom} AS zoom, {h} AS height, {w} AS width,
           CAST(COUNT(e) AS BIGINT) AS n_valid,
           COALESCE({_qsum("e")}, 0) AS value_q_sum
    FROM px
    """


# ---- R3/R4/R8/R9: extract / prepare / referenced read --------------------------


def extract_prepare_sql(src_zoom: int, row0: int, row1: int, col0: int, col1: int,
                        hole: bool = True) -> str:
    """Per-CHILD-tile digests of the decode -> extract -> prepare ->
    resample composition: each source tile's four zoom+1 children as
    (a) the extracted 128x128 window at SOURCE resolution, prepared
    unmasked with nodata -1.0 (q_prep sums floor(16*v) over ALL pixels,
    holes contributing floor(-16)), and (b) the nearest-resampled
    256x256 child read where every source pixel appears exactly 2x2
    times (dyadic index arithmetic), so n_up = 4*n_valid and
    q_up = 4 * sum(floor(16*v)) over valid pixels."""
    _, px = _geodetic_sizes(src_zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1
    half = TILE_SIZE // 2
    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    valid = f"({e}) >= {_r(DEM_HOLE_BELOW)}" if hole else "TRUE"
    return f"""
    WITH {_rows_cte("rows_g", gi0, gi1, px)},
    {_cols_cte("cols_g", gj0, gj1, px)},
    px AS (
        SELECT r.gi, c.gj,
               CASE WHEN {valid} THEN {e} ELSE NULL END AS e
        FROM rows_g r CROSS JOIN cols_g c
    )
    SELECT {src_zoom + 1} AS zoom,
           gi // {half} AS tile_row,
           gj // {half} AS tile_col,
           CAST(COUNT(e) AS BIGINT) AS n_valid,
           CAST(SUM(CAST(FLOOR(COALESCE(CAST(e AS DOUBLE), -1.0) * {_r(QUANT)}) AS BIGINT)) AS BIGINT) AS q_prep,
           CAST(4 * COUNT(e) AS BIGINT) AS n_up,
           COALESCE(CAST(4 * SUM(CAST(FLOOR(CAST(e AS DOUBLE) * {_r(QUANT)}) AS BIGINT)) AS BIGINT), 0) AS q_up
    FROM px
    GROUP BY 2, 3
    ORDER BY tile_row, tile_col
    """


# ---- R6: create_mosaic (incl. antimeridian shift) ------------------------------


def mosaic_blocks_sql(zoom: int, row0: int, row1: int, col0: int, col1: int,
                      am_rows, am_cols_west: int, am_cols_east: int,
                      hole: bool = True) -> str:
    """Digests of create_mosaic canvases: (a) each 2x2 tile block of the
    AOI rectangle (disjoint lattice tiles stitch to the contiguous
    window; canvas bounds are pure tile arithmetic), (b) ONE mosaic of
    tiles straddling the antimeridian (cols {am_cols_west, am_cols_east}
    x am_rows) whose canvas is assembled in the SHIFTED frame: east
    columns land at col + matrix_width, so bounds.right overflows past
    180 (reference mapchete/io/raster/mosaic.py:167-207)."""
    pyr = TilePyramid("geodetic")
    ts = pyr.tile_x_size(zoom)
    mw = pyr.matrix_width(zoom)
    _, px = _geodetic_sizes(zoom)
    gi0, gi1 = row0 * TILE_SIZE, (row1 + 1) * TILE_SIZE - 1
    gj0, gj1 = col0 * TILE_SIZE, (col1 + 1) * TILE_SIZE - 1
    e = _elev_f32("r.cy1", "r.sy2", "c.sx1", "c.sx2")
    valid = f"({e}) >= {_r(DEM_HOLE_BELOW)}" if hole else "TRUE"
    r0a, r1a = am_rows[0], am_rows[-1]
    am_gi0, am_gi1 = r0a * TILE_SIZE, (r1a + 1) * TILE_SIZE - 1
    # antimeridian canvas bounds in the shifted frame
    am_left = f"CAST({pyr.left + am_cols_west * ts!r} AS DOUBLE)"
    am_right = f"CAST({pyr.left + (am_cols_east + mw + 1) * ts!r} AS DOUBLE)"
    am_top = f"CAST({pyr.top - r0a * ts!r} AS DOUBLE)"
    am_bottom = f"CAST({pyr.top - (r1a + 1) * ts!r} AS DOUBLE)"
    return f"""
    WITH {_rows_cte("rows_g", gi0, gi1, px)},
    {_cols_cte("cols_g", gj0, gj1, px)},
    px AS (
        SELECT r.gi, c.gj,
               CASE WHEN {valid} THEN {e} ELSE NULL END AS e
        FROM rows_g r CROSS JOIN cols_g c
    ),
    blocks AS (
        SELECT 'block' AS kind,
               gi // {2 * TILE_SIZE} AS brow, gj // {2 * TILE_SIZE} AS bcol,
               CAST(COUNT(e) AS BIGINT) AS n_valid,
               COALESCE({_qsum("e")}, 0) AS value_q_sum
        FROM px GROUP BY 2, 3
    ),
    block_rows AS (
        SELECT kind, brow, bcol, n_valid, value_q_sum,
               -180.0 + (2 * bcol) * CAST({_r(ts)} AS DOUBLE) AS ml,
               90.0 - (2 * brow + 2) * CAST({_r(ts)} AS DOUBLE) AS mb,
               -180.0 + (2 * bcol + 2) * CAST({_r(ts)} AS DOUBLE) AS mr,
               90.0 - (2 * brow) * CAST({_r(ts)} AS DOUBLE) AS mt
        FROM blocks
    ),
    {_rows_cte("am_rows_g", am_gi0, am_gi1, px)},
    {_cols_cte("am_cols_w", am_cols_west * TILE_SIZE, (am_cols_west + 1) * TILE_SIZE - 1, px)},
    {_cols_cte("am_cols_e", am_cols_east * TILE_SIZE, (am_cols_east + 1) * TILE_SIZE - 1, px)},
    am_px AS (
        SELECT CASE WHEN {valid} THEN {e} ELSE NULL END AS e
        FROM am_rows_g r CROSS JOIN am_cols_w c
        UNION ALL
        SELECT CASE WHEN {valid} THEN {e} ELSE NULL END AS e
        FROM am_rows_g r CROSS JOIN am_cols_e c
    ),
    am_row AS (
        SELECT 'antimeridian' AS kind,
               CAST({r0a} AS BIGINT) AS brow, CAST({am_cols_west} AS BIGINT) AS bcol,
               CAST(COUNT(e) AS BIGINT) AS n_valid,
               COALESCE({_qsum("e")}, 0) AS value_q_sum,
               {am_left} AS ml, {am_bottom} AS mb, {am_right} AS mr, {am_top} AS mt
        FROM am_px
    )
    SELECT * FROM block_rows
    UNION ALL
    SELECT * FROM am_row
    ORDER BY kind, brow, bcol
    """
