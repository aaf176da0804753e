"""Vector operators (V1-V13 of SURVEY.md §2.4).

The reference's per-tile vector scan (read_vector_window,
mapchete/io/vector/read.py:85-143) is a pipeline: rtree window filter ->
repair -> clip to tile bbox -> reproject -> type filter -> drop empties.
Here the rtree is replaced by the tile-key equi-join (explode features
to covering tiles); the rest runs vectorized inside Arrow batches using
the numpy geometry kernel.

Feature table schema: (feature_id string, geometry binary /WKB/,
geom_type string, properties string /JSON/).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapchete_spark.geometry.antimeridian import repair_antimeridian_polygon
from mapchete_spark.geometry.core import MultiPolygon, Polygon
from mapchete_spark.geometry.reproject import reproject_ring
from mapchete_spark.geometry.wkb import from_wkb, to_wkb
from mapchete_spark.tilegrid.grid import Bounds
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid
from mapchete_spark.tilegrid.keys import linear_tile_key, split_linear_tile_key

FEATURE_SCHEMA = "feature_id string, geometry binary, geom_type string, properties string"


def synthetic_land_polygons(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic polygon fixture (FIXTURES.md F3): n-gon 'buffers'
    of LCG-seeded points, one polygon crossing the antimeridian, one
    bow-tie (invalid, exercises repair)."""
    rows = []
    for i in range(n):
        h1 = (i * 1103515245 + 12345) % 2_147_483_648
        h2 = (i * 214013 + 2531011) % 2_147_483_648
        h3 = (i * 69069 + 1) % 2_147_483_648
        cx = -180.0 + 360.0 * h1 / 2_147_483_648
        cy = -80.0 + 160.0 * h2 / 2_147_483_648
        radius = 0.5 + 4.5 * h3 / 2_147_483_648
        nv = 3 + (h3 % 10)
        if i == 0:  # antimeridian crosser
            cx, cy, radius, nv = 179.5, 10.0, 2.0, 8
        poly = Polygon.regular(cx, cy, radius, n=int(nv), phase=h1 % 7 * 0.1)
        if i == 1:  # bow-tie (self-intersecting ring)
            ring = np.array(
                [[cx, cy], [cx + 2, cy + 2], [cx + 2, cy], [cx, cy + 2], [cx, cy]]
            )
            poly = Polygon(ring)
        rows.append(
            (
                f"feat-{i:04d}",
                bytearray(to_wkb(poly)),
                "Polygon",
                json.dumps({"idx": i, "radius": round(radius, 6)}),
            )
        )
    return spark.createDataFrame(rows, FEATURE_SCHEMA)


def repair_ring(ring: np.ndarray) -> np.ndarray:
    """V7 'repair' analog (mapchete/geometry/repair.py:7-21 uses
    buffer(0)+normalize): close the ring, drop consecutive duplicate
    vertices. Self-intersections are tolerated downstream (clipping is
    robust to them); truly degenerate rings (<3 distinct points) raise."""
    r = np.asarray(ring, dtype=np.float64)
    if not np.allclose(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = np.any(np.diff(r, axis=0) != 0, axis=1)
    r = r[keep]
    if len(r) < 4:  # closed ring needs >= 3 distinct vertices
        raise ValueError("geometry could not be repaired")
    return r


def explode_features_to_tiles(
    features: DataFrame,
    zoom: int,
    pyramid: Optional[TilePyramid] = None,
    exact: bool = True,
) -> DataFrame:
    """Feature -> covering tiles (the spatial index IS the join key).
    Antimeridian-overflowing geometries are split/shifted first
    (V8/V9 semantics)."""
    from mapchete_spark.tilegrid.cover import tiles_from_geom

    pyr = pyramid or TilePyramid("geodetic")
    pyr_dict = pyr.to_dict()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = TilePyramid(**pyr_dict)
        for pdf in batches:
            out = {
                "feature_id": [], "geometry": [], "geom_type": [],
                "properties": [], "zoom": [], "tile_row": [], "tile_col": [],
                "tile_key": [],
            }
            for fid, gwkb, gtype, props in zip(
                pdf["feature_id"].values, pdf["geometry"].values,
                pdf["geom_type"].values, pdf["properties"].values,
            ):
                geom = from_wkb(gwkb)
                if isinstance(geom, Polygon):
                    geom = repair_antimeridian_polygon(
                        geom, p.grid.left, p.grid.right
                    )
                for t in tiles_from_geom(p, geom, zoom, exact=exact):
                    out["feature_id"].append(fid)
                    out["geometry"].append(gwkb)
                    out["geom_type"].append(gtype)
                    out["properties"].append(props)
                    out["zoom"].append(t.zoom)
                    out["tile_row"].append(t.row)
                    out["tile_col"].append(t.col)
                    out["tile_key"].append(linear_tile_key(t.zoom, t.row, t.col))
            yield pd.DataFrame(out)

    return features.mapInPandas(
        gen,
        schema=FEATURE_SCHEMA + ", zoom int, tile_row long, tile_col long, tile_key long",
    )


def _clip_polygonal(geom, tb) -> Optional[tuple]:
    """(clipped geometry, area) of polygon ∩ rect, interior rings kept
    (reference read_vector_window keeps holes through the clip,
    mapchete/io/vector/read.py:85-143). None when empty."""
    from mapchete_spark.geometry.core import (
        clip_ring_to_rect,
        ring_area,
        untangle_ring,
    )

    polys = list(geom.polygons) if isinstance(geom, MultiPolygon) else [geom]
    pieces = []
    area = 0.0
    for poly in polys:
        try:
            repaired = repair_ring(poly.exterior)
        except ValueError:
            continue
        # buffer(0) analog: split self-intersecting exteriors into
        # simple loops (a bow-tie clips as two triangles with the TRUE
        # area, not the lobe-cancelling shoelace of the tangled ring)
        loops = untangle_ring(repaired)
        rep_holes = []
        for hole in poly.interiors:
            try:
                rep_holes.append(repair_ring(hole))
            except ValueError:
                continue
        if rep_holes:
            # V7 overlapping-ring repair: the exact overlay measures
            # (union of loops) minus (union of holes) inside the tile
            # box, so holes overlapping each other or leaking outside
            # the exterior are not double-subtracted (the reference
            # gets this from GEOS buffer(0)/difference semantics)
            from mapchete_spark.geometry.overlay import union_area

            area += union_area(
                [[lp] for lp in loops], box=tb, holes=[[h] for h in rep_holes]
            )
        for ring in loops:
            clipped = clip_ring_to_rect(ring, tb.left, tb.bottom, tb.right, tb.top)
            if len(clipped) < 3:
                continue
            a = ring_area(clipped)
            if a <= 0:
                continue
            holes = []
            for hring in rep_holes:
                hc = clip_ring_to_rect(hring, tb.left, tb.bottom, tb.right, tb.top)
                if len(hc) >= 3 and ring_area(hc) > 0:
                    holes.append(hc)
            pieces.append(Polygon(clipped, tuple(holes)))
            if not rep_holes:
                area += a
    if not pieces:
        return None
    merged = pieces[0] if len(pieces) == 1 else MultiPolygon(tuple(pieces))
    return merged, area


def _clip_linear(geom, tb) -> Optional[tuple]:
    """(clipped MultiLineString/LineString, 0.0) of line ∩ rect via
    Liang–Barsky; None when no portion inside."""
    from mapchete_spark.geometry.core import (
        LineString,
        MultiLineString,
        clip_line_to_rect,
    )

    lines = list(geom.lines) if isinstance(geom, MultiLineString) else [geom]
    pieces = []
    for ln in lines:
        for piece in clip_line_to_rect(
            ln.coords, tb.left, tb.bottom, tb.right, tb.top
        ):
            pieces.append(LineString(piece))
    if not pieces:
        return None
    return (pieces[0] if len(pieces) == 1 else MultiLineString(tuple(pieces))), 0.0


def clip_features_to_tiles(
    exploded: DataFrame, pyramid: Optional[TilePyramid] = None
) -> DataFrame:
    """V1 core: intersect each feature with its tile's bbox and drop
    empties. Polygons: repair -> Sutherland-Hodgman clip (interior
    rings kept); lines: Liang–Barsky segment clip stitched to
    polylines; points: tile-bbox containment (reference pipeline,
    mapchete/io/vector/read.py:85-143 + geometry/filter.py:18-121).
    Adds clipped geometry WKB + exact clipped area (0 for points/lines).
    """
    pyr = pyramid or TilePyramid("geodetic")
    pyr_dict = pyr.to_dict()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapchete_spark.geometry.core import LineString, MultiLineString, Point

        p = TilePyramid(**pyr_dict)
        for pdf in batches:
            out = {
                "feature_id": [], "zoom": [], "tile_row": [], "tile_col": [],
                "tile_key": [], "geometry": [], "clipped_area": [], "properties": [],
            }
            for fid, z, trow, tcol, tkey, gwkb, props in zip(
                pdf["feature_id"].values, pdf["zoom"].values,
                pdf["tile_row"].values, pdf["tile_col"].values,
                pdf["tile_key"].values, pdf["geometry"].values,
                pdf["properties"].values,
            ):
                t = Tile(p, int(z), int(trow), int(tcol))
                tb = t.bounds(pixelbuffer=0)
                geom = from_wkb(gwkb)
                if isinstance(geom, Point):
                    inside = (
                        tb.left <= geom.x <= tb.right
                        and tb.bottom <= geom.y <= tb.top
                    )
                    res = (geom, 0.0) if inside else None
                elif isinstance(geom, (LineString, MultiLineString)):
                    res = _clip_linear(geom, tb)
                else:
                    res = _clip_polygonal(geom, tb)
                if res is None:
                    continue
                merged, area = res
                out["feature_id"].append(fid)
                out["zoom"].append(int(z))
                out["tile_row"].append(int(trow))
                out["tile_col"].append(int(tcol))
                out["tile_key"].append(int(tkey))
                out["geometry"].append(to_wkb(merged))
                out["clipped_area"].append(area)
                out["properties"].append(props)
            yield pd.DataFrame(out)

    return exploded.mapInPandas(
        gen,
        schema=(
            "feature_id string, zoom int, tile_row long, tile_col long, "
            "tile_key long, geometry binary, clipped_area double, properties string"
        ),
    )


def tile_union_mask_area(
    clipped: DataFrame, pyramid: Optional[TilePyramid] = None, resolution: int = 256
) -> DataFrame:
    """V3 read_union_geometry analog: per-tile union measured on the
    pixel grid (rasterize the clipped pieces, count covered cells).
    Exact dissolve needs GEOS; the raster union is the engine's
    canonical union measure and matches the reference's
    read_as_raster_mask path (V4)."""
    pyr = pyramid or TilePyramid("geodetic")
    pyr_dict = pyr.to_dict()

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from mapchete_spark.raster.array import rasterize_mask

        p = TilePyramid(**pyr_dict)
        tile_key = int(key[0])
        z, row, col = split_linear_tile_key(tile_key)
        t = Tile(p, int(z), int(row), int(col))
        geoms = [from_wkb(g) for g in pdf["geometry"]]
        mask = rasterize_mask(
            geoms, t.bounds(pixelbuffer=0), (resolution, resolution), invert=True
        )
        covered = int(mask.sum())
        return pd.DataFrame(
            {
                "zoom": [int(z)],
                "tile_row": [int(row)],
                "tile_col": [int(col)],
                "n_features": [len(pdf)],
                "covered_px": [covered],
            }
        )

    return clipped.groupBy("tile_key").applyInPandas(
        fn,
        schema="zoom int, tile_row long, tile_col long, n_features long, covered_px long",
    )


def tile_union_area_exact(
    clipped: DataFrame, pyramid: Optional[TilePyramid] = None
) -> DataFrame:
    """V3 exact dissolve MEASURE: per-tile union area of the clipped
    features' bounding rectangles by y-slab sweep (coordinate
    compression) — exact for axis-aligned footprints (the engine's
    synthetic fixtures), an upper bound otherwise. This is the
    GEOS-free exact-union path next to the pixel-grid measure
    (tile_union_mask_area); the reference dissolves via shapely
    unary_union (mapchete/io/vector/indexed_features.py:190-217)."""
    pyr = pyramid or TilePyramid("geodetic")
    pyr_dict = pyr.to_dict()

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        p = TilePyramid(**pyr_dict)
        tile_key = int(key[0])
        z, row, col = split_linear_tile_key(tile_key)
        boxes = []
        for g in pdf["geometry"]:
            b = from_wkb(g).bounds
            boxes.append((b.left, b.bottom, b.right, b.top))
        ys = sorted({b[1] for b in boxes} | {b[3] for b in boxes})
        area = 0.0
        for y1, y2 in zip(ys[:-1], ys[1:]):
            if y2 <= y1:
                continue
            active = sorted(
                (b[0], b[2]) for b in boxes if b[1] <= y1 and b[3] >= y2
            )
            if not active:
                continue
            total = 0.0
            cur_l, cur_r = active[0]
            for l, r in active[1:]:
                if l > cur_r:
                    total += cur_r - cur_l
                    cur_l, cur_r = l, r
                else:
                    cur_r = max(cur_r, r)
            total += cur_r - cur_l
            area += (y2 - y1) * total
        return pd.DataFrame(
            {
                "zoom": [int(z)],
                "tile_row": [int(row)],
                "tile_col": [int(col)],
                "n_features": [len(pdf)],
                "union_area": [round(area, 6)],
            }
        )

    return clipped.groupBy("tile_key").applyInPandas(
        fn,
        schema=(
            "zoom int, tile_row long, tile_col long, "
            "n_features long, union_area double"
        ),
    )


def tile_union_area_overlay(
    clipped: DataFrame, pyramid: Optional[TilePyramid] = None
) -> DataFrame:
    """V3 general exact dissolve MEASURE: per-tile union area of the
    clipped polygon GEOMETRIES (any rotation, interior rings honored)
    via the slab overlay (geometry/overlay) — this closes the round-2
    gap where the exact path only held for axis-aligned footprints.
    Reference: shapely unary_union in
    mapchete/io/vector/indexed_features.py:190-217."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from mapchete_spark.geometry.overlay import union_area

        tile_key = int(key[0])
        z, row, col = split_linear_tile_key(tile_key)
        feats = []
        for g in pdf["geometry"]:
            geom = from_wkb(g)
            polys = (
                list(geom.polygons) if isinstance(geom, MultiPolygon) else [geom]
            )
            for p in polys:
                feats.append([p.exterior, *p.interiors])
        area = union_area(feats)
        return pd.DataFrame(
            {
                "zoom": [int(z)],
                "tile_row": [int(row)],
                "tile_col": [int(col)],
                "n_features": [len(pdf)],
                "union_area": [round(area, 6)],
            }
        )

    return clipped.groupBy("tile_key").applyInPandas(
        fn,
        schema=(
            "zoom int, tile_row long, tile_col long, "
            "n_features long, union_area double"
        ),
    )


def tile_union_rotated(docs_geo: DataFrame) -> DataFrame:
    """Contract-query operator: exact per-zoom-1-tile union area of TWO
    overlapping ROTATED squares per footprint doc, clipped to the tile
    box — the oracle re-derives the identical slab decomposition in SQL
    (functions/overlaysql.union_rotated_sql). Exercises the arbitrary-
    polygon dissolve end-to-end under the driver's correctness gate."""
    from mapchete_spark.functions.geo import tile_col_expr, tile_row_expr
    from mapchete_spark.functions.overlaysql import (
        UNION_ZOOM,
        square_params,
        square_ring,
        tile_box,
    )

    fd = docs_geo.where(F.col("radius").isNotNull()).select(
        "doc_id",
        "lon",
        "lat",
        "radius",
        tile_row_expr(F.col("lat"), UNION_ZOOM).alias("tile_row"),
        tile_col_expr(F.col("lon"), UNION_ZOOM).alias("tile_col"),
    )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from mapchete_spark.geometry.overlay import union_area

        tr, tc = int(key[0]), int(key[1])
        pdf = pdf.sort_values("doc_id")  # edge order must match SQL eid order
        feats = []
        for did, lon, lat, radius in zip(
            pdf["doc_id"], pdf["lon"], pdf["lat"], pdf["radius"]
        ):
            for cx, cy, hw, ang in square_params(
                int(did), float(lon), float(lat), float(radius)
            ):
                feats.append([square_ring(cx, cy, hw, ang)])
        left, bottom, right, top = tile_box(tr, tc)
        area = union_area(feats, box=Bounds(left, bottom, right, top))
        return pd.DataFrame(
            {
                "zoom": [UNION_ZOOM],
                "tile_row": [tr],
                "tile_col": [tc],
                "n_docs": [int(pdf["doc_id"].nunique())],
                "area_q": [int(np.floor(area * 10000.0 + 0.5))],
            }
        )

    return fd.groupBy("tile_row", "tile_col").applyInPandas(
        fn,
        schema="zoom int, tile_row long, tile_col long, n_docs long, area_q long",
    )


def reproject_features(
    features: DataFrame,
    src: str = "EPSG:4326",
    dst: str = "EPSG:3857",
    clip_to_crs_bounds: bool = True,
    error_on_clip: bool = False,
) -> DataFrame:
    """V5: reproject feature geometries (closed-form geodetic<->mercator,
    densified before warp like the reference's segmentize-then-transform).

    ``clip_to_crs_bounds`` mirrors the reference's reproject_geometry
    (mapchete/geometry/reproject.py:128-174): when the destination CRS
    has a known valid region (geometry/reproject.CRS_BOUNDS — the
    area-of-use table; reference falls back to pyproj area_of_use),
    geometries are first taken to geodetic and intersected with that
    region BEFORE warping, so out-of-domain coordinates are clipped
    away instead of producing garbage projected values. Unknown
    destination bounds, or dst EPSG:4326, warp unclipped (the
    reference's fallthrough). Features clipped to nothing are dropped
    (the reference returns an empty geometry; a row-drop is the
    DataFrame rendering of empty). ``error_on_clip`` raises instead of
    clipping, like the reference flag."""
    from mapchete_spark.geometry.core import clip_ring_to_rect
    from mapchete_spark.geometry.reproject import get_crs_bounds, get_transform

    bounds = (
        get_crs_bounds(dst)
        if clip_to_crs_bounds and dst != "EPSG:4326"
        else None
    )
    to_geodetic = (
        get_transform(src, "EPSG:4326")
        if bounds is not None and src != "EPSG:4326"
        else None
    )
    warp_src = "EPSG:4326" if bounds is not None else src

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            geoms = []
            keep = []
            for g in pdf["geometry"]:
                geom = from_wkb(g)
                polys = (
                    list(geom.polygons) if isinstance(geom, MultiPolygon) else [geom]
                )
                outp = []
                for poly in polys:
                    ring = np.asarray(poly.exterior, dtype=np.float64)
                    if bounds is not None:
                        if to_geodetic is not None:
                            lon, lat = to_geodetic(ring[:, 0], ring[:, 1])
                            ring = np.column_stack([lon, lat])
                        w, s, e, n = bounds
                        inside = (
                            (ring[:, 0] >= w)
                            & (ring[:, 0] <= e)
                            & (ring[:, 1] >= s)
                            & (ring[:, 1] <= n)
                        )
                        if not inside.all():
                            if error_on_clip:
                                raise RuntimeError(
                                    f"geometry outside {dst} CRS bounds"
                                )
                            ring = clip_ring_to_rect(ring, w, s, e, n)
                            if len(ring) < 3:
                                continue  # fully outside the valid region
                    outp.append(Polygon(reproject_ring(ring, warp_src, dst)))
                if not outp:
                    keep.append(False)
                    geoms.append(None)
                    continue
                keep.append(True)
                geoms.append(
                    bytearray(to_wkb(outp[0] if len(outp) == 1 else MultiPolygon(tuple(outp))))
                )
            res = pdf.copy()
            res["geometry"] = geoms
            yield res[pd.Series(keep, index=res.index)]

    return features.mapInPandas(gen, schema=features.schema)


def filter_by_geometry_type(features: DataFrame, geom_type: str) -> DataFrame:
    """V10: single/multi-equivalent type filter as a Column predicate
    (geom_type is a stored column — no decode needed)."""
    base = geom_type[5:] if geom_type.startswith("Multi") else geom_type
    return features.where(F.col("geom_type").isin(base, f"Multi{base}"))


# ---- SQL-oracle-friendly square-footprint variants ---------------------------
#
# doc footprints are axis-aligned squares (functions/geo.py), so their
# tile clip is a rectangle intersection — exactly expressible in SQL.
# These run the REAL vector pipeline (WKB -> kernel clip) on the Spark
# side; the oracle recomputes the rectangle algebra.


def doc_footprint_features(docs_geo: DataFrame) -> DataFrame:
    """WKB square footprints for docs with a radius (engine side).

    NOT spread via operators/partitioning (round-7 A/B): unlike the
    md5 dedup pipelines, the per-feature work here is light (~0.5s
    serial at sf0.1's 250 footprints), and 32 tasks x 3 chained
    mapInPandas evals of fixed per-task overhead measured SLOWER than
    the single-task run (0.83-0.94s -> 1.4-1.8s). Corpus-scale inputs
    arrive multi-partition from the scan anyway."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sel = pdf[pdf["radius"].notna()]
            geoms = []
            for lon, lat, r in zip(sel["lon"], sel["lat"], sel["radius"]):
                geoms.append(
                    bytearray(
                        to_wkb(
                            Polygon.from_bounds(
                                Bounds(
                                    max(lon - r, -180.0),
                                    max(lat - r, -90.0),
                                    min(lon + r, 180.0),
                                    min(lat + r, 90.0),
                                )
                            )
                        )
                    )
                )
            yield pd.DataFrame(
                {
                    "feature_id": sel["doc_id"].astype(str),
                    "geometry": geoms,
                    "geom_type": ["Polygon"] * len(sel),
                    "properties": ["{}"] * len(sel),
                }
            )

    return docs_geo.select("doc_id", "lon", "lat", "radius").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def doc_vline_features(docs_geo: DataFrame) -> DataFrame:
    """Deterministic 2-segment 'V' polyline per doc with a radius:
    (lon-r, lat-r) -> (lon, lat+r) -> (lon+r, lat-r), clamped to the
    world rect — the line-clipping analog of the square footprints
    (coordinates are plain column algebra, so the SQL twin rebuilds
    them exactly). Not spread, same A/B verdict as
    doc_footprint_features."""
    from mapchete_spark.geometry.core import LineString

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sel = pdf[pdf["radius"].notna()]
            geoms = []
            for lon, lat, r in zip(sel["lon"], sel["lat"], sel["radius"]):
                coords = np.array(
                    [
                        [max(lon - r, -180.0), max(lat - r, -90.0)],
                        [lon, min(lat + r, 90.0)],
                        [min(lon + r, 180.0), max(lat - r, -90.0)],
                    ],
                    dtype=np.float64,
                )
                geoms.append(bytearray(to_wkb(LineString(coords))))
            yield pd.DataFrame(
                {
                    "feature_id": sel["doc_id"].astype(str),
                    "geometry": geoms,
                    "geom_type": ["LineString"] * len(sel),
                    "properties": ["{}"] * len(sel),
                }
            )

    return docs_geo.select("doc_id", "lon", "lat", "radius").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


def line_clip_digests(exploded: DataFrame, pyramid: Optional[TilePyramid] = None) -> DataFrame:
    """Per (feature, tile) quantized inside-length of line features:
    SUM(floor((t1 - t0) * seglen * 2^18)) over Liang–Barsky-clipped
    segments — operation order mirrored by the SQL twin."""
    pyr = pyramid or TilePyramid("geodetic")
    pyr_dict = pyr.to_dict()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapchete_spark.geometry.core import segment_clip_params

        p = TilePyramid(**pyr_dict)
        for pdf in batches:
            out = {"zoom": [], "tile_row": [], "tile_col": [], "len_q": []}
            for z, trow, tcol, gwkb in zip(
                pdf["zoom"].values, pdf["tile_row"].values,
                pdf["tile_col"].values, pdf["geometry"].values,
            ):
                t = Tile(p, int(z), int(trow), int(tcol))
                tb = t.bounds(pixelbuffer=0)
                c = from_wkb(gwkb).coords
                t0, t1, seglen = segment_clip_params(
                    c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1],
                    tb.left, tb.bottom, tb.right, tb.top,
                )
                inside = t0 <= t1
                lq = np.floor(((t1 - t0) * seglen) * 262144.0).astype(np.int64)
                out["zoom"].append(int(z))
                out["tile_row"].append(int(trow))
                out["tile_col"].append(int(tcol))
                out["len_q"].append(int(lq[inside].sum()))
            yield pd.DataFrame(out)

    per_feature = exploded.mapInPandas(
        gen, schema="zoom int, tile_row long, tile_col long, len_q long"
    )
    return per_feature.groupBy("zoom", "tile_row", "tile_col").agg(
        F.sum("len_q").alias("len_q_sum")
    )


def tile_union_dissolved(docs_geo: DataFrame) -> DataFrame:
    """Contract-query operator for the RING dissolve: same rotated
    fixture as :func:`tile_union_rotated`, but the engine-side area is
    the SHOELACE SUM over the dissolved boundary rings
    (geometry/overlay.union_rings) instead of the slab measure, while
    the oracle still computes the slab-decomposition area in SQL. The
    two derivations agree only when the seam-cancelling edge trace and
    hole orientation are correct, so this query pins the GEOS-style
    ``unary_union`` output shape (reference
    mapchete/io/vector/indexed_features.py:190-217), not just its
    measure."""
    from mapchete_spark.functions.geo import tile_col_expr, tile_row_expr
    from mapchete_spark.functions.overlaysql import (
        UNION_ZOOM,
        square_params,
        square_ring,
        tile_box,
    )

    fd = docs_geo.where(F.col("radius").isNotNull()).select(
        "doc_id",
        "lon",
        "lat",
        "radius",
        tile_row_expr(F.col("lat"), UNION_ZOOM).alias("tile_row"),
        tile_col_expr(F.col("lon"), UNION_ZOOM).alias("tile_col"),
    )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from mapchete_spark.geometry.overlay import (
            ring_signed_area,
            union_rings,
        )

        tr, tc = int(key[0]), int(key[1])
        pdf = pdf.sort_values("doc_id")
        feats = []
        for did, lon, lat, radius in zip(
            pdf["doc_id"], pdf["lon"], pdf["lat"], pdf["radius"]
        ):
            for cx, cy, hw, ang in square_params(
                int(did), float(lon), float(lat), float(radius)
            ):
                feats.append([square_ring(cx, cy, hw, ang)])
        left, bottom, right, top = tile_box(tr, tc)
        rings = union_rings(feats, box=Bounds(left, bottom, right, top))
        area = sum(ring_signed_area(r) for r in rings)
        return pd.DataFrame(
            {
                "zoom": [UNION_ZOOM],
                "tile_row": [tr],
                "tile_col": [tc],
                "n_docs": [int(pdf["doc_id"].nunique())],
                "area_q": [int(np.floor(area * 10000.0 + 0.5))],
            }
        )

    return fd.groupBy("tile_row", "tile_col").applyInPandas(
        fn,
        schema="zoom int, tile_row long, tile_col long, n_docs long, area_q long",
    )


def dissolve_union_wkb(clipped: DataFrame) -> DataFrame:
    """Per-tile dissolved union GEOMETRY as MultiPolygon WKB — the
    consumer-facing `read_union_geometry` twin (merged rings, holes
    attached to shells; no seam edges). Input: clipped feature rows
    (tile_key, geometry WKB)."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from mapchete_spark.geometry.overlay import union_multipolygon
        from mapchete_spark.geometry.wkb import to_wkb

        tile_key = int(key[0])
        z, row, col = split_linear_tile_key(tile_key)
        feats = []
        for g in pdf["geometry"]:
            geom = from_wkb(g)
            polys = (
                list(geom.polygons) if isinstance(geom, MultiPolygon) else [geom]
            )
            for p in polys:
                feats.append([p.exterior, *p.interiors])
        mp = union_multipolygon(feats)
        return pd.DataFrame(
            {
                "zoom": [int(z)],
                "tile_row": [int(row)],
                "tile_col": [int(col)],
                "n_features": [len(pdf)],
                "n_polygons": [len(mp.polygons)],
                "union_area": [round(mp.area, 6)],
                "geometry": [to_wkb(mp)],
            }
        )

    return clipped.groupBy("tile_key").applyInPandas(
        fn,
        schema=(
            "zoom int, tile_row long, tile_col long, n_features long, "
            "n_polygons long, union_area double, geometry binary"
        ),
    )
