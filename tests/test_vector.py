"""Vector pipeline tests: explode to tiles, clip, union mask, reproject,
type filter — plus kernel-level golden checks on squares where the
result is analytically known."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapchete_spark.geometry.core import MultiPolygon, Polygon
from mapchete_spark.geometry.wkb import from_wkb, to_wkb
from mapchete_spark.operators.vector import (
    clip_features_to_tiles,
    doc_footprint_features,
    explode_features_to_tiles,
    filter_by_geometry_type,
    repair_ring,
    reproject_features,
    synthetic_land_polygons,
    tile_union_mask_area,
)
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")


@pytest.fixture(scope="module")
def land(spark):
    df = synthetic_land_polygons(spark, n=50).cache()
    df.count()
    yield df
    df.unpersist()


def test_fixture_deterministic(spark, land):
    again = synthetic_land_polygons(spark, n=50)
    a = sorted(tuple(r) for r in land.select("feature_id", F.md5("geometry")).collect())
    b = sorted(tuple(r) for r in again.select("feature_id", F.md5("geometry")).collect())
    assert a == b


def test_explode_exact_vs_bbox(spark, land):
    exact = explode_features_to_tiles(land, 5, exact=True).count()
    loose = explode_features_to_tiles(land, 5, exact=False).count()
    assert 0 < exact <= loose


def test_antimeridian_feature_split(spark, land):
    am = land.where(F.col("feature_id") == "feat-0000")
    tiles = explode_features_to_tiles(am, 4).collect()
    cols = {r["tile_col"] for r in tiles}
    mw = GEO.matrix_width(4)
    assert 0 in cols and mw - 1 in cols  # both sides of the antimeridian


def test_clip_area_conserved(spark, land):
    """Sum of per-tile clipped areas == full polygon area (tiles
    partition the plane; Sutherland-Hodgman clip is exact)."""
    sample = land.where(F.col("feature_id").isin("feat-0005", "feat-0010"))
    exploded = explode_features_to_tiles(sample, 6)
    clipped = clip_features_to_tiles(exploded)
    got = {
        r["feature_id"]: r["area"]
        for r in clipped.groupBy("feature_id")
        .agg(F.sum("clipped_area").alias("area"))
        .collect()
    }
    for r in sample.collect():
        poly = from_wkb(r["geometry"])
        assert got[r["feature_id"]] == pytest.approx(poly.area, rel=1e-9)


def test_clip_bowtie_repaired_not_crashing(spark, land):
    bow = land.where(F.col("feature_id") == "feat-0001")
    exploded = explode_features_to_tiles(bow, 5)
    clipped = clip_features_to_tiles(exploded)
    assert clipped.count() >= 1  # survives, no exception


def test_union_mask_area(spark, land):
    sample = land.limit(20)
    exploded = explode_features_to_tiles(sample, 4)
    clipped = clip_features_to_tiles(exploded)
    union = tile_union_mask_area(clipped)
    rows = union.collect()
    assert rows
    for r in rows:
        assert 0 < r["covered_px"] <= 256 * 256


def test_reproject_roundtrip(spark, land):
    # clip off for the pure-warp roundtrip: the fixture includes
    # features past lon 180 / lat 85 which the (reference-default)
    # CRS-bounds clip would legitimately cut (see test below)
    sample = land.limit(5)
    merc = reproject_features(
        sample, "EPSG:4326", "EPSG:3857", clip_to_crs_bounds=False
    )
    back = reproject_features(merc, "EPSG:3857", "EPSG:4326")
    for orig, rt in zip(sample.collect(), back.collect()):
        p0 = from_wkb(orig["geometry"])
        p1 = from_wkb(rt["geometry"])
        # roundtrip preserves shape (densified, so compare bounds)
        for a, b in zip(p0.bounds, p1.bounds):
            assert a == pytest.approx(b, abs=1e-6)


def _square_feature_df(spark, fid, x0, y0, x1, y1):
    wkb = to_wkb(Polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)]))
    return spark.createDataFrame(
        [(fid, bytearray(wkb), "Polygon")],
        "feature_id string, geometry binary, geom_type string",
    )


def test_reproject_clips_to_crs_bounds(spark):
    """V5 CRS-bounds parity (reference reproject_geometry:128-174):
    out-of-domain coordinates are clipped in geodetic space BEFORE the
    warp, not garbled."""
    from mapchete_spark.geometry.reproject import get_transform

    # square straddling the east edge of EPSG:3035's area of use
    df = _square_feature_df(spark, "f", 28.0, 40.0, 40.0, 50.0)
    out = reproject_features(df, "EPSG:4326", "EPSG:3035").collect()
    assert len(out) == 1
    inv = get_transform("EPSG:3035", "EPSG:4326")
    ring = np.asarray(from_wkb(out[0]["geometry"]).exterior, dtype=np.float64)
    lon, lat = inv(ring[:, 0], ring[:, 1])
    assert lon.max() == pytest.approx(31.55, abs=1e-6)  # clipped at east
    assert lon.min() == pytest.approx(28.0, abs=1e-6)
    assert lat.min() == pytest.approx(40.0, abs=1e-6)
    assert lat.max() == pytest.approx(50.0, abs=1e-6)


def test_reproject_drops_fully_outside(spark):
    df = _square_feature_df(spark, "f", -170.0, -20.0, -160.0, -10.0)
    assert reproject_features(df, "EPSG:4326", "EPSG:3035").count() == 0


def test_reproject_inside_untouched_and_error_on_clip(spark):
    inside = _square_feature_df(spark, "f", 10.0, 45.0, 12.0, 47.0)
    out = reproject_features(inside, "EPSG:4326", "EPSG:3035")
    no_clip = reproject_features(
        inside, "EPSG:4326", "EPSG:3035", clip_to_crs_bounds=False
    )
    assert [r["geometry"] for r in out.collect()] == [
        r["geometry"] for r in no_clip.collect()
    ]
    # error_on_clip raises only for geometries that need clipping
    assert (
        reproject_features(
            inside, "EPSG:4326", "EPSG:3035", error_on_clip=True
        ).count()
        == 1
    )
    crossing = _square_feature_df(spark, "g", 28.0, 40.0, 40.0, 50.0)
    with pytest.raises(Exception, match="CRS bounds"):
        reproject_features(
            crossing, "EPSG:4326", "EPSG:3035", error_on_clip=True
        ).count()


def test_type_filter(spark, land):
    assert filter_by_geometry_type(land, "Polygon").count() == land.count()
    assert filter_by_geometry_type(land, "LineString").count() == 0
    assert filter_by_geometry_type(land, "MultiPolygon").count() == land.count()


def test_repair_ring():
    ring = np.array([[0, 0], [1, 0], [1, 0], [1, 1], [0, 0]], dtype=float)
    out = repair_ring(ring)
    assert len(out) == 4  # dup dropped, still closed
    with pytest.raises(ValueError):
        repair_ring(np.array([[0, 0], [1, 1], [0, 0]], dtype=float))


def test_doc_footprints_clip_matches_rect_algebra(spark):
    """The oracle identity: kernel clip of a square footprint to a tile
    == rectangle intersection (checked here in-process; the SQL oracle
    in __spark_entry__ checks it cross-engine)."""
    from mapchete_spark.sources.tables import load_docs

    docs = load_docs(spark, "/root/testdata/sf0.001")
    feats = doc_footprint_features(docs)
    exploded = explode_features_to_tiles(feats, 6)
    clipped = clip_features_to_tiles(exploded).collect()
    assert clipped
    geo = {
        r["doc_id"]: r
        for r in docs.where(F.col("radius").isNotNull()).collect()
    }
    ts = 180.0 / 2**6
    for r in clipped[:50]:
        d = geo[int(r["feature_id"])]
        l = max(d["lon"] - d["radius"], -180.0)
        rr = min(d["lon"] + d["radius"], 180.0)
        b = max(d["lat"] - d["radius"], -90.0)
        t = min(d["lat"] + d["radius"], 90.0)
        tl = -180.0 + r["tile_col"] * ts
        tt = 90.0 - r["tile_row"] * ts
        w = min(rr, tl + ts) - max(l, tl)
        h = min(t, tt) - max(b, tt - ts)
        # float association order differs between shoelace and rect
        # algebra at ~1e-13 — compare at 1e-6 relative
        assert r["clipped_area"] == pytest.approx(max(w, 0) * max(h, 0), rel=1e-6)


class TestLinePointClip:
    """V1 point/line path + polygon interior rings through the clip
    (round-2 items; reference mapchete/io/vector/read.py:85-143)."""

    def test_clip_line_to_rect_crossing(self):
        import numpy as np

        from mapchete_spark.geometry.core import clip_line_to_rect

        line = np.array([[-1.0, 0.5], [2.0, 0.5]])
        [piece] = clip_line_to_rect(line, 0.0, 0.0, 1.0, 1.0)
        np.testing.assert_allclose(piece, [[0.0, 0.5], [1.0, 0.5]])

    def test_clip_line_multiple_pieces(self):
        import numpy as np

        from mapchete_spark.geometry.core import clip_line_to_rect

        # W shape dipping out of the rect between visits
        line = np.array([[0.2, 0.5], [0.4, -1.0], [0.6, 0.5]])
        pieces = clip_line_to_rect(line, 0.0, 0.0, 1.0, 1.0)
        assert len(pieces) == 2
        for p in pieces:
            assert (p[:, 1] >= -1e-12).all()

    def test_clip_line_stitches_through_interior_vertex(self):
        import numpy as np

        from mapchete_spark.geometry.core import clip_line_to_rect

        line = np.array([[0.1, 0.1], [0.5, 0.5], [0.9, 0.1]])
        pieces = clip_line_to_rect(line, 0.0, 0.0, 1.0, 1.0)
        assert len(pieces) == 1 and len(pieces[0]) == 3

    def test_multilinestring_wkb_roundtrip(self):
        import numpy as np

        from mapchete_spark.geometry.core import LineString, MultiLineString
        from mapchete_spark.geometry.wkb import from_wkb, to_wkb

        ml = MultiLineString(
            (
                LineString(np.array([[0.0, 0.0], [1.0, 1.0]])),
                LineString(np.array([[2.0, 2.0], [3.0, 2.0], [3.0, 4.0]])),
            )
        )
        assert from_wkb(to_wkb(ml)) == ml

    def test_point_and_line_features_clip(self, spark):
        import json

        import numpy as np

        from mapchete_spark.geometry.core import LineString, Point
        from mapchete_spark.geometry.wkb import from_wkb, to_wkb
        from mapchete_spark.operators.vector import (
            clip_features_to_tiles,
            explode_features_to_tiles,
        )

        rows = [
            ("pt-in", bytearray(to_wkb(Point(10.0, 10.0))), "Point", "{}"),
            (
                "line",
                bytearray(
                    to_wkb(LineString(np.array([[5.0, 4.0], [15.0, 14.0]])))
                ),
                "LineString",
                "{}",
            ),
        ]
        feats = spark.createDataFrame(
            rows, "feature_id string, geometry binary, geom_type string, properties string"
        )
        clipped = clip_features_to_tiles(explode_features_to_tiles(feats, 4)).collect()
        by_id = {}
        for r in clipped:
            by_id.setdefault(r["feature_id"], []).append(r)
        assert len(by_id["pt-in"]) == 1  # the point lands in exactly one tile
        assert by_id["pt-in"][0]["clipped_area"] == 0.0
        # the line (5,4)->(15,14) visits three z4 tiles (11.25-degree
        # tiles): crosses lon 11.25 at lat 10.25, then lat 11.25 at
        # lon 12.25
        assert len(by_id["line"]) == 3
        for r in by_id["line"]:
            geom = from_wkb(r["geometry"])
            assert geom.geom_type in ("LineString", "MultiLineString")

    def test_polygon_interior_ring_kept(self, spark):
        import numpy as np

        from mapchete_spark.geometry.core import Polygon
        from mapchete_spark.geometry.wkb import from_wkb, to_wkb
        from mapchete_spark.operators.vector import (
            clip_features_to_tiles,
            explode_features_to_tiles,
        )

        outer = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0], [1.0, 1.0]])
        hole = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0], [4.0, 4.0]])
        poly = Polygon(outer, (hole,))
        feats = spark.createDataFrame(
            [("donut", bytearray(to_wkb(poly)), "Polygon", "{}")],
            "feature_id string, geometry binary, geom_type string, properties string",
        )
        clipped = clip_features_to_tiles(explode_features_to_tiles(feats, 4)).collect()
        [r] = [c for c in clipped if c["tile_row"] == 7 and c["tile_col"] == 16]
        got = from_wkb(r["geometry"])
        assert len(got.interiors) == 1  # hole survived the clip
        assert abs(r["clipped_area"] - (64.0 - 4.0)) < 1e-9


class TestUntangle:
    """V7 buffer(0) analog: self-intersection repair by planar loop
    extraction (reference mapchete/geometry/repair.py:7-21)."""

    def test_bowtie_splits_into_two_triangles(self):
        import numpy as np

        from mapchete_spark.geometry.core import ring_area, untangle_ring

        bowtie = np.array(
            [[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]]
        )
        loops = untangle_ring(bowtie)
        assert len(loops) == 2
        areas = sorted(ring_area(lp) for lp in loops)
        # two congruent triangles of area 1 each ((1,1) apex)
        assert areas == [1.0, 1.0]
        for lp in loops:
            assert any(np.allclose(p, [1.0, 1.0]) for p in lp)

    def test_simple_ring_unchanged(self):
        import numpy as np

        from mapchete_spark.geometry.core import untangle_ring

        sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])
        loops = untangle_ring(sq)
        assert len(loops) == 1
        np.testing.assert_array_equal(loops[0], sq)

    def test_figure_eight(self):
        import numpy as np

        from mapchete_spark.geometry.core import ring_area, untangle_ring

        # explicit figure-8 sharing the middle vertex (1,1)
        fig8 = np.array(
            [
                [0.0, 0.0], [1.0, 1.0], [2.0, 0.0], [2.0, 2.0],
                [1.0, 1.0], [0.0, 2.0], [0.0, 0.0],
            ]
        )
        loops = untangle_ring(fig8)
        assert len(loops) == 2
        assert all(ring_area(lp) > 0 for lp in loops)


def test_dissolve_union_wkb_roundtrip(spark, land):
    """Consumer-facing dissolve: per-tile merged MultiPolygon WKB whose
    area equals the exact slab union area, geometry round-trips, and
    shells contain their holes."""
    from mapchete_spark.operators.vector import (
        dissolve_union_wkb,
        tile_union_area_overlay,
    )

    sample = land.where(
        F.col("feature_id").isin("feat-0003", "feat-0007", "feat-0012")
    )
    exploded = explode_features_to_tiles(sample, 5)
    clipped = clip_features_to_tiles(exploded)
    dissolved = {
        (r["tile_row"], r["tile_col"]): r
        for r in dissolve_union_wkb(clipped).collect()
    }
    measured = {
        (r["tile_row"], r["tile_col"]): r["union_area"]
        for r in tile_union_area_overlay(clipped).collect()
    }
    assert dissolved.keys() == measured.keys()
    assert dissolved
    for key, row in dissolved.items():
        geom = from_wkb(bytes(row["geometry"]))
        assert isinstance(geom, MultiPolygon)
        assert len(geom.polygons) == row["n_polygons"] > 0
        # dissolved-ring area == exact slab measure (both rounded 1e-6)
        assert geom.area == pytest.approx(measured[key], abs=2e-6)
        assert row["union_area"] == pytest.approx(measured[key], abs=2e-6)
