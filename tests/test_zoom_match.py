"""Zoom-matching goldens replicated from the reference's own assertions
(test/test_io.py:88-190)."""

import pytest

from mapchete_spark.tilegrid import TilePyramid
from mapchete_spark.tilegrid.zoom_match import TopologicalError, tile_to_zoom_level

MERC = TilePyramid("mercator")
GEOD = TilePyramid("geodetic")


def test_same_crs_identity():
    assert tile_to_zoom_level(GEOD.tile(7, 3, 3), GEOD) == 7


class TestMercatorToGeodetic:
    """reference test_tile_to_zoom_level golden values."""

    def test_north_boundary_gdal(self):
        assert tile_to_zoom_level(MERC.tile(9, 0, 0), GEOD) == 9

    def test_north_boundary_min(self):
        assert (
            tile_to_zoom_level(MERC.tile(9, 0, 0), GEOD, matching_method="min") == 12
        )

    def test_equator_gdal(self):
        row = MERC.matrix_height(9) // 2
        assert tile_to_zoom_level(MERC.tile(9, row, 0), GEOD) == 9

    def test_equator_min(self):
        row = MERC.matrix_height(9) // 2
        assert (
            tile_to_zoom_level(MERC.tile(9, row, 0), GEOD, matching_method="min") == 9
        )

    def test_south_boundary_gdal(self):
        row = MERC.matrix_height(9) - 1
        assert tile_to_zoom_level(MERC.tile(9, row, 0), GEOD) == 9

    def test_south_boundary_min(self):
        row = MERC.matrix_height(9) - 1
        assert (
            tile_to_zoom_level(MERC.tile(9, row, 0), GEOD, matching_method="min") == 12
        )

    def test_metatile_pixelbuffer_gdal(self):
        src = TilePyramid("mercator", metatiling=2, pixelbuffer=20)
        dst = TilePyramid("geodetic", metatiling=8, pixelbuffer=20)
        assert tile_to_zoom_level(src.tile(4, 0, 7), dst) == 4


class TestGeodeticToMercator:
    def test_equatorial_tile(self):
        # geodetic z5 equator tile -> mercator: similar resolution zoom
        row = GEOD.matrix_height(5) // 2
        z = tile_to_zoom_level(GEOD.tile(5, row, 10), MERC)
        assert 4 <= z <= 6

    def test_invalid_method(self):
        with pytest.raises(ValueError):
            tile_to_zoom_level(MERC.tile(3, 0, 0), GEOD, matching_method="nope")
