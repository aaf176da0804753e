"""V12 WKT / __geo_interface__ coercion and the config `area:` path."""

import numpy as np
import pytest

from mapchete_spark.geometry.core import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)
from mapchete_spark.geometry.wkt import from_wkt, guess_geometry, to_wkt
from mapchete_spark.tilegrid.grid import Bounds


def _sq(l, b, r, t):
    return Polygon.from_bounds(Bounds(l, b, r, t))


class TestWktRoundtrip:
    def test_point(self):
        p = Point(1.5, -2.25)
        assert from_wkt(to_wkt(p)) == p

    def test_linestring(self):
        ln = LineString(np.array([[0.1, 0.2], [3.0, 4.0], [5.5, -1.0]]))
        got = from_wkt(to_wkt(ln))
        np.testing.assert_array_equal(got.coords, ln.coords)

    def test_polygon_with_hole_bit_exact(self):
        rng = np.random.RandomState(1)
        ext = np.array([[rng.uniform(-180, 180), rng.uniform(-90, 90)] for _ in range(5)])
        hole = ext * 0.1
        poly = Polygon(ext, (hole,))
        got = from_wkt(to_wkt(poly))
        np.testing.assert_array_equal(got.exterior, poly.exterior)
        np.testing.assert_array_equal(got.interiors[0], hole)

    def test_multipolygon(self):
        mp = MultiPolygon((_sq(0, 0, 1, 1), _sq(5, 5, 6, 7)))
        got = from_wkt(to_wkt(mp))
        assert got.geom_type == "MultiPolygon"
        assert len(got.polygons) == 2
        assert got.polygons[1].bounds == Bounds(5, 5, 6, 7)

    def test_multilinestring(self):
        ml = MultiLineString(
            (LineString(np.array([[0.0, 0.0], [1.0, 1.0]])),
             LineString(np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 2.0]])))
        )
        got = from_wkt(to_wkt(ml))
        assert len(got.lines) == 2

    def test_external_wkt_formats(self):
        # uppercase/lowercase, extra whitespace
        g = from_wkt("polygon ((0 0, 4 0, 4 4, 0 4, 0 0))")
        assert g.geom_type == "Polygon"
        assert g.bounds == Bounds(0, 0, 4, 4)


class TestGuessGeometry:
    def test_wkt_string(self):
        g, crs = guess_geometry("POINT (3 4)")
        assert g == Point(3.0, 4.0) and crs is None

    def test_wkb_bytes(self):
        from mapchete_spark.geometry.wkb import to_wkb

        g, _ = guess_geometry(to_wkb(_sq(0, 0, 2, 2)))
        assert g.bounds == Bounds(0, 0, 2, 2)

    def test_geojson_dict(self):
        g, _ = guess_geometry(
            {"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}
        )
        assert g.bounds == Bounds(0, 0, 2, 2)

    def test_geo_interface_object(self):
        class Obj:
            __geo_interface__ = {"type": "Point", "coordinates": (7.0, 8.0)}

        g, _ = guess_geometry(Obj())
        assert g == Point(7.0, 8.0)

    def test_bounds_tuple(self):
        g, _ = guess_geometry([1.0, 2.0, 3.0, 4.0])
        assert g.bounds == Bounds(1, 2, 3, 4)

    def test_native_geometry_passthrough(self):
        sq = _sq(0, 0, 1, 1)
        g, _ = guess_geometry(sq)
        assert g is sq

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="coerce"):
            guess_geometry(42)


class TestWktAreaConfig:
    def test_area_restricts_tiles_end_to_end(self, spark, tmp_path):
        """A config with a WKT `area:` triangle processes exactly the
        tiles intersecting the triangle (vs the full bbox)."""
        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute
        from mapchete_spark.tilegrid.cover import tiles_from_geom
        from mapchete_spark.tilegrid.pyramid import TilePyramid

        wkt = "POLYGON ((0 20, 45 20, 0 50, 0 20))"
        cfg = JobConfig.from_dict(
            dict(
                process="convert",
                zoom_levels=[4],
                pyramid={"grid": "geodetic"},
                input={"source": "dem", "hole": False},
                area=wkt,
                process_parameters={"scale_ratio": 2.0, "scale_offset": 0.0},
                output={"path": str(tmp_path / "o"), "format": "parquet_tiles"},
            )
        )
        counts = execute(spark, cfg, mode="overwrite")
        want = {
            (t.row, t.col)
            for t in tiles_from_geom(TilePyramid("geodetic"), from_wkt(wkt), 4)
        }
        out = spark.read.parquet(str(tmp_path / "o" / "tiles"))
        got = {
            (r["tile_row"], r["tile_col"])
            for r in out.select("tile_row", "tile_col").collect()
        }
        assert got == want
        assert counts["process_z4"] == len(want)
        # strictly fewer than the bbox cover (the triangle cuts the AOI)
        assert len(want) < 16