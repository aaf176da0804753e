"""Closed-form spherical UTM (V5 arbitrary-CRS path) and the
antimeridian-safe metric buffer (V9)."""

import numpy as np
import pytest

from mapchete_spark.geometry.core import MultiPolygon, Polygon
from mapchete_spark.geometry.footprints import buffer_antimeridian_safe, offset_ring
from mapchete_spark.geometry.reproject import (
    EARTH_RADIUS,
    UTM_K0,
    get_transform,
    utm_zone,
)


class TestUtmTransform:
    def test_zone_selection(self):
        assert utm_zone(9.0, 48.0) == "EPSG:32632"   # central Europe
        assert utm_zone(-74.0, 40.7) == "EPSG:32618"  # New York
        assert utm_zone(174.8, -41.3) == "EPSG:32760"  # Wellington (south)
        assert utm_zone(-180.0, 10.0) == "EPSG:32601"
        assert utm_zone(179.99, 10.0) == "EPSG:32660"

    def test_central_meridian_scale_and_easting(self):
        fwd = get_transform("EPSG:4326", "EPSG:32632")
        # on the central meridian (9E): x = false easting exactly,
        # y = k0 * R * phi (spherical TM)
        x, y = fwd(np.array([9.0]), np.array([45.0]))
        assert abs(float(x[0]) - 500000.0) < 1e-6
        want_y = UTM_K0 * EARTH_RADIUS * np.radians(45.0)
        assert abs(float(y[0]) - want_y) < 1e-6

    def test_roundtrip(self):
        rng = np.random.RandomState(3)
        lon = 6.0 + rng.rand(500) * 6.0  # zone 32
        lat = -80.0 + rng.rand(500) * 160.0
        fwd = get_transform("EPSG:4326", "EPSG:32632")
        inv = get_transform("EPSG:32632", "EPSG:4326")
        lon2, lat2 = inv(*fwd(lon, lat))
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_southern_false_northing(self):
        fwd = get_transform("EPSG:4326", "EPSG:32760")
        _, y = fwd(np.array([177.0]), np.array([-41.0]))
        assert 0 < float(y[0]) < 10000000.0
        inv = get_transform("EPSG:32760", "EPSG:4326")
        lon2, lat2 = inv(*fwd(np.array([177.0]), np.array([-41.0])))
        assert abs(float(lon2[0]) - 177.0) < 1e-9
        assert abs(float(lat2[0]) + 41.0) < 1e-9

    def test_utm_to_utm_and_mercator_chains(self):
        f = get_transform("EPSG:32632", "EPSG:32633")
        x, y = f(np.array([500000.0]), np.array([5000000.0]))
        assert np.isfinite(x).all() and np.isfinite(y).all()
        g = get_transform("EPSG:3857", "EPSG:32632")
        x2, y2 = g(np.array([1000000.0]), np.array([6000000.0]))
        assert np.isfinite(x2).all()

    def test_unknown_pair_raises(self):
        with pytest.raises(ValueError, match="unsupported CRS pair"):
            get_transform("EPSG:4326", "EPSG:2154")


class TestMetricBuffer:
    def test_offset_ring_grows_square(self):
        sq = np.array(
            [[0.0, 0.0], [100.0, 0.0], [100.0, 100.0], [0.0, 100.0], [0.0, 0.0]]
        )
        grown = offset_ring(sq, 10.0)
        # miter corners of a square: vertices move by d*sqrt(2) along
        # the diagonal -> new side 120, area 14400
        from mapchete_spark.geometry.core import ring_area

        assert abs(ring_area(grown) - 120.0 * 120.0) < 1e-6

    def test_offset_ring_handles_cw_input(self):
        sq = np.array(
            [[0.0, 0.0], [0.0, 100.0], [100.0, 100.0], [100.0, 0.0], [0.0, 0.0]]
        )
        from mapchete_spark.geometry.core import ring_area

        grown = offset_ring(sq, 10.0)
        assert abs(ring_area(grown)) > 100.0 * 100.0

    def test_buffer_plain_polygon(self):
        poly = Polygon.from_bounds(
            __import__("mapchete_spark.tilegrid.grid", fromlist=["Bounds"]).Bounds(
                10.0, 40.0, 11.0, 41.0
            )
        )
        out = buffer_antimeridian_safe(poly, 10000.0)  # 10 km
        assert isinstance(out, Polygon)
        b = out.bounds
        # ~10 km = ~0.09 deg latitude growth on each side
        assert b.bottom < 40.0 - 0.05 and b.top > 41.0 + 0.05
        assert b.left < 10.0 and b.right > 11.0

    def test_buffer_antimeridian_crossing(self):
        from mapchete_spark.tilegrid.grid import Bounds

        # square straddling the antimeridian expressed with a wrap
        ring = np.array(
            [
                [178.0, 10.0],
                [-178.0, 10.0],
                [-178.0, 12.0],
                [178.0, 12.0],
                [178.0, 10.0],
            ]
        )
        out = buffer_antimeridian_safe(Polygon(ring), 50000.0)
        assert isinstance(out, MultiPolygon)
        assert len(out.polygons) == 2
        bs = sorted((p.bounds for p in out.polygons), key=lambda b: b.left)
        west, east = bs
        # both parts stay inside the grid and together cover the seam
        assert west.left < -177.0 and west.left >= -180.0
        assert east.right > 177.0 and east.right <= 180.0
        assert abs(west.left - (-180.0)) < 1e-6 or west.left < -178.0
        # buffered: covers more latitude than the original
        assert west.bottom < 10.0 - 0.3 and west.top > 12.0 + 0.3
