"""S2-style spherical cell keys as pure Column algebra + SQL twin.

BASELINE.json's north star calls for tiles addressable as "H3/S2-
indexed partition keys". The engine's primary key is the WMTS tile
(zoom, row, col) with a z-order physical layout; this module adds the
S2 alternative: the published S2 scheme (s2geometry.io docs — cube-face
projection, quadratic s/t transform, Hilbert-curve bit interleave) so a
doc's (lon, lat) maps to a hierarchical, locality-preserving spherical
cell key usable as a partition/bucket key.

Key layout: ``key = face * 4^level + hilbert_pos`` (face 0..5, pos the
2*level-bit Hilbert position). This keeps every key in signed-64 range
for any level <= 29 (the canonical uint64 S2 token puts face at bit 61
and a trailing marker bit, which overflows signed BIGINT on both Spark
and DuckDB — the two layouts are a fixed linear transform apart). The
defining properties hold exactly and are tested: parent(key_L) ==
key_L // 4 (hierarchical prefix), and the level-k curve on each face
visits every cell once with consecutive cells edge-adjacent (Hilbert
locality).

Everything is Column arithmetic — the per-level Hilbert automaton is
UNROLLED into when/element_at expressions, so the whole key derivation
stays inside whole-stage codegen (map-only, no UDF); the SQL twin
renders the identical unrolled arithmetic for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# S2 Hilbert automaton (s2geometry lookup tables):
# ij -> sub-position per orientation, orientation delta per sub-position
SWAP = 1
INVERT = 2
# ijToPos[orientation][i*2+j]
IJ_TO_POS = (
    (0, 1, 3, 2),
    (0, 3, 1, 2),
    (2, 3, 1, 0),
    (2, 1, 3, 0),
)
# posToOrientation[sub-position]: XOR delta applied to the orientation
POS_TO_ORIENTATION = (SWAP, 0, 0, INVERT | SWAP)

DEFAULT_LEVEL = 12


def _st_from_uv(u):
    """Quadratic projection (s2geometry's default ST transform)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def s2_key_np(lon, lat, level: int = DEFAULT_LEVEL):
    """Numpy twin of :func:`s2_key_col` (same arithmetic; tests assert
    bit-identical results across numpy / Column / SQL)."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # face of the largest axis, sign-split (0:+x 1:+y 2:+z 3:-x 4:-y 5:-z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    )
    # np.select evaluates every branch; the divisor of the SELECTED
    # branch is never 0 (it is the largest-|.| axis), so mask the
    # noise — including finite-but-tiny divisors whose quotient
    # overflows ("overflow in divide"), which is the same
    # unselected-branch artifact as the division-by-zero case
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    n = 1 << level
    i = np.clip(np.floor(_st_from_uv(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_st_from_uv(v) * n), 0, n - 1).astype(np.int64)
    orient = (face & SWAP).astype(np.int64)
    pos = np.zeros_like(i)
    ij2pos = np.array(IJ_TO_POS, dtype=np.int64)
    pos2or = np.array(POS_TO_ORIENTATION, dtype=np.int64)
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        sub = ij2pos[orient, ij]
        pos = pos * 4 + sub
        orient = orient ^ pos2or[sub]
    return face.astype(np.int64) * (4**level) + pos


def with_s2_key(
    df,
    lon_col: str = "lon",
    lat_col: str = "lat",
    level: int = DEFAULT_LEVEL,
    out_col: str = "s2_key",
):
    """Add the S2 cell key as a column — one withColumn per automaton
    level so every step references NAMED columns (a single Column
    expression would duplicate the orient/pos subtree per level and
    grow exponentially; the chained projects collapse to one linear
    codegen stage). Map-only, no UDF."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    lonr, latr = F.radians(lon), F.radians(lat)
    x = F.cos(latr) * F.cos(lonr)
    y = F.cos(latr) * F.sin(lonr)
    z = F.sin(latr)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    face = (
        F.when((ax >= ay) & (ax >= az), F.when(x >= 0, 0).otherwise(3))
        .when(ay >= az, F.when(y >= 0, 1).otherwise(4))
        .otherwise(F.when(z >= 0, 2).otherwise(5))
    )
    df = df.withColumn("__s2x", x).withColumn("__s2y", y).withColumn("__s2z", z)
    df = df.withColumn("__s2f", face)
    xc, yc, zc, fc = F.col("__s2x"), F.col("__s2y"), F.col("__s2z"), F.col("__s2f")
    u = (
        F.when(fc == 0, yc / xc)
        .when(fc == 1, -xc / yc)
        .when(fc == 2, -xc / zc)
        .when(fc == 3, zc / xc)
        .when(fc == 4, zc / yc)
        .otherwise(-yc / zc)
    )
    v = (
        F.when(fc == 0, zc / xc)
        .when(fc == 1, zc / yc)
        .when(fc == 2, -yc / zc)
        .when(fc == 3, yc / xc)
        .when(fc == 4, -xc / yc)
        .otherwise(-xc / zc)
    )

    def st(c):
        return F.when(
            c >= 0.0, F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * c)
        ).otherwise(F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * c))

    n = 1 << level
    df = df.withColumn(
        "__s2i",
        F.least(
            F.greatest(F.floor(st(u) * F.lit(float(n))), F.lit(0)),
            F.lit(n - 1),
        ).cast("long"),
    ).withColumn(
        "__s2j",
        F.least(
            F.greatest(F.floor(st(v) * F.lit(float(n))), F.lit(0)),
            F.lit(n - 1),
        ).cast("long"),
    )
    ij2pos_flat = F.array(*[F.lit(t) for row in IJ_TO_POS for t in row])
    pos2or = F.array(*[F.lit(t) for t in POS_TO_ORIENTATION])
    df = df.withColumn("__s2or", (fc.cast("long") % 2)).withColumn(
        "__s2pos", F.lit(0).cast("long")
    )
    i, j = F.col("__s2i"), F.col("__s2j")
    for k in range(level - 1, -1, -1):
        ij = (F.shiftright(i, k) % 2) * 2 + (F.shiftright(j, k) % 2)
        df = df.withColumn(
            "__s2sub",
            F.element_at(
                ij2pos_flat, (F.col("__s2or") * 4 + ij + 1).cast("int")
            ).cast("long"),
        )
        df = df.withColumn(
            "__s2pos", F.col("__s2pos") * 4 + F.col("__s2sub")
        ).withColumn(
            "__s2or",
            F.col("__s2or").bitwiseXOR(
                F.element_at(pos2or, (F.col("__s2sub") + 1).cast("int")).cast(
                    "long"
                )
            ),
        )
    df = df.withColumn(
        out_col, fc.cast("long") * F.lit(4**level) + F.col("__s2pos")
    )
    return df.drop(
        "__s2x", "__s2y", "__s2z", "__s2f", "__s2i", "__s2j",
        "__s2or", "__s2pos", "__s2sub",
    )


def s2_key_sql(lon_expr: str, lat_expr: str, level: int = DEFAULT_LEVEL) -> str:
    """DuckDB twin: the identical unrolled arithmetic as a chain of
    CTEs (one per automaton level). Returns a full SELECT over the
    ``documents`` view yielding (doc_id, s2_key)."""
    x = "(cos(radians(lat_v)) * cos(radians(lon_v)))"
    y = "(cos(radians(lat_v)) * sin(radians(lon_v)))"
    z = "(sin(radians(lat_v)))"
    face = (
        f"(CASE WHEN abs({x}) >= abs({y}) AND abs({x}) >= abs({z}) "
        f"THEN (CASE WHEN {x} >= 0 THEN 0 ELSE 3 END) "
        f"WHEN abs({y}) >= abs({z}) THEN (CASE WHEN {y} >= 0 THEN 1 ELSE 4 END) "
        f"ELSE (CASE WHEN {z} >= 0 THEN 2 ELSE 5 END) END)"
    )
    u = (
        f"(CASE {face} WHEN 0 THEN {y}/{x} WHEN 1 THEN -{x}/{y} "
        f"WHEN 2 THEN -{x}/{z} WHEN 3 THEN {z}/{x} WHEN 4 THEN {z}/{y} "
        f"ELSE -{y}/{z} END)"
    )
    v = (
        f"(CASE {face} WHEN 0 THEN {z}/{x} WHEN 1 THEN {z}/{y} "
        f"WHEN 2 THEN -{y}/{z} WHEN 3 THEN {y}/{x} WHEN 4 THEN -{x}/{y} "
        f"ELSE -{x}/{z} END)"
    )

    def st(c):
        return (
            f"(CASE WHEN {c} >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * {c}) "
            f"ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * {c}) END)"
        )

    n = 1 << level
    i_expr = (
        f"CAST(LEAST(GREATEST(FLOOR({st(u)} * {float(n)!r}), 0), {n - 1}) AS BIGINT)"
    )
    j_expr = (
        f"CAST(LEAST(GREATEST(FLOOR({st(v)} * {float(n)!r}), 0), {n - 1}) AS BIGINT)"
    )
    ij2pos = "[" + ",".join(str(t) for row in IJ_TO_POS for t in row) + "]"
    pos2or = "[" + ",".join(str(t) for t in POS_TO_ORIENTATION) + "]"
    body = [
        f"pts AS (SELECT doc_id, {lon_expr} AS lon_v, {lat_expr} AS lat_v FROM documents)",
        f"s0 AS (SELECT doc_id, {face} AS face, {i_expr} AS i, {j_expr} AS j, "
        f"CAST(({face}) % 2 AS BIGINT) AS orient, CAST(0 AS BIGINT) AS pos FROM pts)",
    ]
    prev = "s0"
    for idx, k in enumerate(range(level - 1, -1, -1)):
        cur = f"s{idx + 1}"
        ij = f"(((i // {1 << k}) % 2) * 2 + ((j // {1 << k}) % 2))"
        sub = f"({ij2pos}[CAST(orient * 4 + {ij} AS INT) + 1])"
        body.append(
            f"{cur} AS (SELECT doc_id, face, i, j, "
            f"xor(orient, CAST({pos2or}[CAST({sub} AS INT) + 1] AS BIGINT)) AS orient, "
            f"pos * 4 + {sub} AS pos FROM {prev})"
        )
        prev = cur
    return (
        "WITH " + ",\n    ".join(body)
        + f"\n    SELECT doc_id, face * {4**level} + pos AS s2_key FROM {prev}"
    )
