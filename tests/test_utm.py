"""Ellipsoidal Krüger-series UTM (V5 arbitrary-CRS path) and the
antimeridian-safe metric buffer (V9)."""

import numpy as np
import pytest

from mapchete_spark.geometry.core import MultiPolygon, Polygon
from mapchete_spark.geometry.footprints import buffer_antimeridian_safe, offset_ring
from mapchete_spark.geometry.reproject import (
    A_RECT,
    UTM_K0,
    WGS84_A,
    WGS84_E,
    get_transform,
    utm_zone,
)


def _snyder_tm(lon, lat, lon0, south):
    """Independent ellipsoidal TM formulation (Snyder 1987 eq. 8-9..8-13,
    meridian-arc form) used as a cross-check twin for the Krüger series;
    truncation-limited to ~1 mm inside a UTM zone."""
    a = WGS84_A
    e2 = WGS84_E**2
    ep2 = e2 / (1 - e2)
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    T = np.tan(phi) ** 2
    C = ep2 * np.cos(phi) ** 2
    A = lam * np.cos(phi)
    M = _snyder_meridian_arc(phi)
    x = UTM_K0 * N * (
        A + (1 - T + C) * A**3 / 6 + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    ) + 500000.0
    y = UTM_K0 * (
        M
        + N
        * np.tan(phi)
        * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    if south:
        y = y + 10000000.0
    return x, y


def _snyder_meridian_arc(phi):
    a = WGS84_A
    e2 = WGS84_E**2
    return a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )


class TestUtmTransform:
    def test_zone_selection(self):
        assert utm_zone(9.0, 48.0) == "EPSG:32632"   # central Europe
        assert utm_zone(-74.0, 40.7) == "EPSG:32618"  # New York
        assert utm_zone(174.8, -41.3) == "EPSG:32760"  # Wellington (south)
        assert utm_zone(-180.0, 10.0) == "EPSG:32601"
        assert utm_zone(179.99, 10.0) == "EPSG:32660"

    def test_rectifying_radius_and_quarter_meridian(self):
        """Two public WGS84 control constants anchor the series: the
        rectifying radius A* = 6367449.1458 m and the quarter meridian
        (equator to pole) = 10001965.7293 m = A* * pi/2."""
        assert A_RECT == pytest.approx(6367449.1458, abs=1e-3)
        assert A_RECT * np.pi / 2 == pytest.approx(10001965.7293, abs=1e-3)

    def test_central_meridian_easting_and_meridian_arc(self):
        fwd = get_transform("EPSG:4326", "EPSG:32632")
        # on the central meridian (9E): x = false easting exactly,
        # y = k0 * (ellipsoidal meridian arc length at phi)
        x, y = fwd(np.array([9.0]), np.array([45.0]))
        assert abs(float(x[0]) - 500000.0) < 1e-6
        want_y = UTM_K0 * _snyder_meridian_arc(np.radians(45.0))
        assert abs(float(y[0]) - want_y) < 1e-3

    def test_agrees_with_independent_snyder_formulation(self):
        """Krüger n^6 series vs Snyder's meridian-arc-form ellipsoidal TM
        (two independent public formulations) agree to < 2 mm across
        zones and hemispheres — evidence both compute EPSG-correct UTM,
        not the round-2 spherical approximation (~100 m off)."""
        rng = np.random.RandomState(7)
        lons = rng.uniform(-180, 180, 500)
        lats = rng.uniform(-84, 84, 500)
        for lon, lat in zip(lons, lats):
            crs = utm_zone(lon, lat)
            zone = int(crs.split(":")[1]) % 100
            lon0 = -183.0 + 6.0 * zone
            fwd = get_transform("EPSG:4326", crs)
            x1, y1 = fwd(np.array([lon]), np.array([lat]))
            x2, y2 = _snyder_tm(lon, lat, lon0, lat < 0)
            assert abs(float(x1[0]) - x2) < 2e-3, (lon, lat)
            assert abs(float(y1[0]) - y2) < 2e-3, (lon, lat)

    def test_roundtrip_sub_micrometer(self):
        rng = np.random.RandomState(3)
        lon = 6.0 + rng.rand(500) * 6.0  # zone 32
        lat = -84.0 + rng.rand(500) * 168.0
        fwd = get_transform("EPSG:4326", "EPSG:32632")
        inv = get_transform("EPSG:32632", "EPSG:4326")
        lon2, lat2 = inv(*fwd(lon, lat))
        # 1e-11 deg ~= 1 micrometer on the ground
        np.testing.assert_allclose(lon2, lon, atol=1e-11)
        np.testing.assert_allclose(lat2, lat, atol=1e-11)

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
        # EPSG:29902 (Irish grid, Airy Modified) is not registered;
        # the conic/TM/oblique registries cover 2154, 27700, 21781,
        # 2056 and 5514
        with pytest.raises(ValueError, match="unsupported CRS"):
            get_transform("EPSG:4326", "EPSG:29902")
        for crs in (
            "EPSG:2154", "EPSG:27700", "EPSG:21781", "EPSG:2056",
            "EPSG:5514",
        ):
            assert get_transform("EPSG:4326", crs) is not None


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


class TestConicProjections:
    """Ellipsoidal LCC / Albers national grids (geometry/conic)."""

    def test_lambert93_false_origin_exact(self):
        from mapchete_spark.geometry.conic import conic_projection

        p = conic_projection("EPSG:2154")
        x, y = p.forward(np.array([3.0]), np.array([46.5]))
        assert x[0] == pytest.approx(700000.0, abs=1e-6)
        assert y[0] == pytest.approx(6600000.0, abs=1e-6)

    def test_belgian_lambert_false_origin_exact(self):
        from mapchete_spark.geometry.conic import conic_projection

        p = conic_projection("EPSG:3812")
        x, y = p.forward(
            np.array([4.359215833333333]), np.array([50.797815])
        )
        assert x[0] == pytest.approx(649328.0, abs=1e-6)
        assert y[0] == pytest.approx(665262.0, abs=1e-6)

    def test_albers_origin_exact(self):
        from mapchete_spark.geometry.conic import conic_projection

        p = conic_projection("EPSG:5070")
        x, y = p.forward(np.array([-96.0]), np.array([23.0]))
        assert x[0] == pytest.approx(0.0, abs=1e-7)
        assert y[0] == pytest.approx(0.0, abs=1e-7)

    def test_lcc_unit_scale_on_standard_parallels(self):
        # the defining property of LCC 2SP: scale factor 1 on both
        # standard parallels (verifies n, F, rho0 jointly)
        from mapchete_spark.geometry.conic import GRS80_A, GRS80_E2, conic_projection

        p = conic_projection("EPSG:2154")
        for lat0 in (44.0, 49.0):
            h = 1e-6
            x1, y1 = p.forward(np.array([3.0]), np.array([lat0 - h]))
            x2, y2 = p.forward(np.array([3.0]), np.array([lat0 + h]))
            phi = np.radians(lat0)
            M = GRS80_A * (1 - GRS80_E2) / (1 - GRS80_E2 * np.sin(phi) ** 2) ** 1.5
            k = np.hypot(x2[0] - x1[0], y2[0] - y1[0]) / (M * np.radians(2 * h))
            assert k == pytest.approx(1.0, abs=1e-7)

    def test_albers_preserves_area(self):
        # equal-area property: the projected area of a small geodesic
        # quad equals its ellipsoidal area (authalic), to first order
        from mapchete_spark.geometry.conic import GRS80_A, GRS80_E2, conic_projection

        p = conic_projection("EPSG:5070")
        lon, lat, d = -100.0, 40.0, 0.01
        corners_lon = np.array([lon, lon + d, lon + d, lon])
        corners_lat = np.array([lat, lat, lat + d, lat + d])
        x, y = p.forward(corners_lon, corners_lat)
        proj_area = 0.5 * abs(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
        )
        phi = np.radians(lat + d / 2)
        sin2 = np.sin(phi) ** 2
        M = GRS80_A * (1 - GRS80_E2) / (1 - GRS80_E2 * sin2) ** 1.5
        N = GRS80_A / np.sqrt(1 - GRS80_E2 * sin2)
        true_area = (M * np.radians(d)) * (N * np.cos(phi) * np.radians(d))
        assert proj_area == pytest.approx(true_area, rel=1e-6)

    def test_roundtrip_sub_micrometer(self):
        from mapchete_spark.geometry.conic import conic_projection

        rng = np.random.RandomState(9)
        for crs, lo, hi, la, ha in [
            ("EPSG:2154", -5.0, 9.0, 41.0, 51.5),
            ("EPSG:3812", 2.5, 6.5, 49.4, 51.6),
            ("EPSG:5070", -125.0, -67.0, 25.0, 49.0),
        ]:
            p = conic_projection(crs)
            lon = rng.uniform(lo, hi, 200)
            lat = rng.uniform(la, ha, 200)
            x, y = p.forward(lon, lat)
            lon2, lat2 = p.inverse(x, y)
            assert np.max(np.abs(lon2 - lon)) * 111320 < 1e-6
            assert np.max(np.abs(lat2 - lat)) * 111320 < 1e-6

    def test_chain_through_utm(self):
        lon, lat = np.array([2.3508]), np.array([48.8567])
        a = get_transform("EPSG:4326", "EPSG:2154")(lon, lat)
        b = get_transform("EPSG:2154", "EPSG:32631")(*a)
        c = get_transform("EPSG:32631", "EPSG:4326")(*b)
        assert abs(c[0][0] - lon[0]) * 111320 < 1e-6
        assert abs(c[1][0] - lat[0]) * 111320 < 1e-6


class TestLccColumnTwin:
    """functions/conicsql Column algebra == geometry/conic class."""

    def test_column_matches_library(self, spark):
        import pandas as pd
        from pyspark.sql import functions as SF

        from mapchete_spark.functions.conicsql import lcc_xy_cols
        from mapchete_spark.geometry.conic import conic_projection

        rng = np.random.RandomState(17)
        lon = rng.uniform(-10, 12, 500)
        lat = rng.uniform(40, 52, 500)
        pdf = pd.DataFrame({"i": range(500), "lon": lon, "lat": lat})
        sdf = spark.createDataFrame(pdf)
        x, y = lcc_xy_cols(SF.col("lon"), SF.col("lat"))
        out = (
            sdf.select("i", x.alias("x"), y.alias("y"))
            .orderBy("i")
            .toPandas()
        )
        p = conic_projection("EPSG:2154")
        ex, ey = p.forward(lon, lat)
        ex = np.floor(ex * 100.0 + 0.5) / 100.0
        ey = np.floor(ey * 100.0 + 0.5) / 100.0
        np.testing.assert_array_equal(out["x"].values, ex)
        np.testing.assert_array_equal(out["y"].values, ey)


class TestPolarStereographic:
    """geometry/conic.PolarStereographic pinned to the EPSG Guidance
    Note 7-2 published worked examples (both variants), plus the
    Column twin parity."""

    def test_epsg_gn72_variant_b_worked_example(self):
        """Polar Stereographic variant B (EPSG method 9829), the GN7-2
        Australian Antarctic example: lat_ts=-71, lon_0=70E,
        FE=FN=6000000 on WGS84; 75S 120E -> E 7255380.79 N 7053389.56."""
        from mapchete_spark.geometry.projparams import projection_from_proj4

        p = projection_from_proj4(
            "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 "
            "+x_0=6000000 +y_0=6000000 +ellps=WGS84"
        )
        x, y = p.forward(120.0, -75.0)
        assert abs(x - 7255380.79) < 0.01
        assert abs(y - 7053389.56) < 0.01
        lo, la = p.inverse(x, y)
        assert abs(lo - 120.0) < 1e-9 and abs(la - (-75.0)) < 1e-9

    def test_epsg_gn72_variant_a_worked_example(self):
        """Polar Stereographic variant A (EPSG method 9810), the GN7-2
        UPS North example (EPSG:5041): k0=0.994, FE=FN=2000000;
        73N 44E -> E 3320416.75 N 632668.43. +proj=ups resolves to the
        identical grid."""
        from mapchete_spark.geometry.projparams import (
            EPSG_PROJ4,
            projection_from_proj4,
        )

        p = projection_from_proj4(EPSG_PROJ4["EPSG:5041"])
        x, y = p.forward(44.0, 73.0)
        assert abs(x - 3320416.75) < 0.01
        assert abs(y - 632668.43) < 0.01
        u = projection_from_proj4("+proj=ups +ellps=WGS84")
        assert u.forward(44.0, 73.0) == (x, y)

    def test_north_aspect_roundtrip_epsg3413(self):
        from mapchete_spark.geometry.projparams import (
            EPSG_PROJ4,
            projection_from_proj4,
        )

        p = projection_from_proj4(EPSG_PROJ4["EPSG:3413"])
        lons = np.linspace(-179.0, 179.0, 37)
        lats = np.linspace(60.0, 89.9, 37)
        x, y = p.forward(lons, lats)
        lo, la = p.inverse(x, y)
        dlo = (lo - lons + 180.0) % 360.0 - 180.0
        assert np.abs(dlo).max() < 1e-9
        assert np.abs(la - lats).max() < 1e-9
        # the pole itself maps to the false origin and back
        px, py = p.forward(0.0, 90.0)
        assert (px, py) == (0.0, 0.0)
        assert p.inverse(0.0, 0.0)[1] == 90.0

    def test_oblique_stere_raises(self):
        from mapchete_spark.geometry.projparams import projection_from_proj4

        with pytest.raises(ValueError, match="polar aspects"):
            projection_from_proj4("+proj=stere +lat_0=52 +lon_0=5")

    def test_column_twin_matches_library(self, spark):
        import pandas as pd
        from pyspark.sql import functions as SF

        from mapchete_spark.functions.conicsql import stere_xy_cols
        from mapchete_spark.geometry.projparams import (
            EPSG_PROJ4,
            projection_from_proj4,
        )

        rng = np.random.RandomState(23)
        lon = rng.uniform(-180, 180, 400)
        lat = rng.uniform(-85, -62, 400)
        pdf = pd.DataFrame({"i": range(400), "lon": lon, "lat": lat})
        sdf = spark.createDataFrame(pdf)
        x, y = stere_xy_cols(SF.col("lon"), SF.col("lat"))
        out = (
            sdf.select("i", x.alias("x"), y.alias("y"))
            .orderBy("i")
            .toPandas()
        )
        p = projection_from_proj4(EPSG_PROJ4["EPSG:3031"])
        ex, ey = p.forward(lon, lat)
        ex = np.floor(ex * 100.0 + 0.5) / 100.0
        ey = np.floor(ey * 100.0 + 0.5) / 100.0
        np.testing.assert_array_equal(out["x"].values, ex)
        np.testing.assert_array_equal(out["y"].values, ey)


class TestBritishNationalGrid:
    """General TM (geometry/tm): arbitrary ellipsoid + Helmert datum —
    EPSG:27700 on Airy 1830."""

    def test_natural_origin_maps_to_false_origin(self):
        from mapchete_spark.geometry.tm import tm_grid

        g = tm_grid("EPSG:27700")
        x, y = g.forward_local(np.array([-2.0]), np.array([49.0]))
        assert x[0] == pytest.approx(400000.0, abs=1e-6)
        assert y[0] == pytest.approx(-100000.0, abs=1e-6)

    def test_os_worked_example_sub_mm(self):
        """The OS guide's published worked example (annexe, Caister
        water tower): OSGB36 52d39'27.2531\"N 1d43'4.5177\"E ->
        E 651409.903 N 313177.270 — matches to < 1 mm."""
        from mapchete_spark.geometry.tm import tm_grid

        g = tm_grid("EPSG:27700")
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        x, y = g.forward_local(np.array([lon]), np.array([lat]))
        assert x[0] == pytest.approx(651409.903, abs=1e-3)
        assert y[0] == pytest.approx(313177.270, abs=1e-3)

    def test_local_roundtrip_sub_micrometer(self):
        from mapchete_spark.geometry.tm import tm_grid

        g = tm_grid("EPSG:27700")
        rng = np.random.RandomState(2)
        lon = rng.uniform(-7, 2, 300)
        lat = rng.uniform(49.5, 61, 300)
        lon2, lat2 = g.inverse_local(*g.forward_local(lon, lat))
        assert np.max(np.abs(lon2 - lon)) * 111320 < 1e-6
        assert np.max(np.abs(lat2 - lat)) * 111320 < 1e-6

    def test_wgs84_roundtrip_within_helmert_closure(self):
        # negating the 7 parameters inverts the Helmert only to second
        # order -> ~cm closure; the shift itself is ~5 m accurate by spec
        from mapchete_spark.geometry.tm import tm_grid

        g = tm_grid("EPSG:27700")
        rng = np.random.RandomState(4)
        lon = rng.uniform(-6, 1.5, 300)
        lat = rng.uniform(50, 60, 300)
        lon2, lat2 = g.inverse(*g.forward(lon, lat))
        assert np.max(np.abs(lon2 - lon)) * 111320 < 0.05
        assert np.max(np.abs(lat2 - lat)) * 111320 < 0.05

    def test_datum_shift_magnitude(self):
        """WGS84 vs OSGB36 geodetic differ by the published ~50-120 m
        over Britain; the shift must be applied (not a no-op)."""
        from mapchete_spark.geometry.tm import tm_grid

        g = tm_grid("EPSG:27700")
        lon, lat = np.array([-1.0]), np.array([52.0])
        xw, yw = g.forward(lon, lat)  # WGS84 input (shifted)
        xl, yl = g.forward_local(lon, lat)  # same numbers read as OSGB36
        d = float(np.hypot(xw - xl, yw - yl)[0])
        assert 50.0 < d < 150.0

    def test_via_get_transform_chain(self):
        f = get_transform("EPSG:4326", "EPSG:27700")
        inv = get_transform("EPSG:27700", "EPSG:4326")
        lon, lat = np.array([-0.1276]), np.array([51.5072])  # London
        x, y = f(lon, lat)
        assert 520000 < x[0] < 540000 and 170000 < y[0] < 190000
        lon2, lat2 = inv(x, y)
        assert abs(lon2[0] - lon[0]) * 111320 < 0.05
        # chain BNG -> Lambert-93 across registries
        g = get_transform("EPSG:27700", "EPSG:2154")
        xf, yf = g(x, y)
        assert np.isfinite(xf).all() and np.isfinite(yf).all()

    def test_kruger_coeffs_match_wgs84_module_constants(self):
        """kruger_coeffs(n) at the WGS84 n reproduces reproject.py's
        precomputed alpha series and rectifying radius bit-for-bit."""
        from mapchete_spark.geometry.reproject import (
            KRUGER_ALPHA,
            KRUGER_BETA,
            _N,
        )
        from mapchete_spark.geometry.tm import WGS84, kruger_coeffs

        alpha, beta, rect = kruger_coeffs(WGS84.n)
        assert WGS84.n == _N
        assert alpha == KRUGER_ALPHA
        assert beta == KRUGER_BETA
        # same value modulo multiply/divide ordering (one ulp)
        assert WGS84.a * rect == pytest.approx(A_RECT, abs=1e-6)


class TestSwissObliqueMercator:
    """CH1903 / LV03 (EPSG:21781): swisstopo double projection on
    Bessel 1841 + GRANIT87 datum shift."""

    def test_bern_maps_to_false_origin(self):
        from mapchete_spark.geometry.tm import SwissObliqueMercator

        g = SwissObliqueMercator()
        y, x = g.forward_local(np.array([g.LON0]), np.array([g.LAT0]))
        assert y[0] == pytest.approx(600000.0, abs=1e-4)
        assert x[0] == pytest.approx(200000.0, abs=1e-4)

    def test_conformality_isotropic_scale(self):
        """The projection is conformal: meridional and parallel scale
        factors agree to float-differentiation accuracy everywhere."""
        from mapchete_spark.geometry.tm import SwissObliqueMercator

        g = SwissObliqueMercator()
        e2, a = g.ell.e2, g.ell.a
        for L, P in [(6.2, 46.0), (7.44, 46.95), (9.8, 47.6)]:
            h = 1e-7
            E1, N1 = g.forward_local(np.array([L - h]), np.array([P]))
            E2, N2 = g.forward_local(np.array([L + h]), np.array([P]))
            E3, N3 = g.forward_local(np.array([L]), np.array([P - h]))
            E4, N4 = g.forward_local(np.array([L]), np.array([P + h]))
            phi = np.radians(P)
            M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
            Nr = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
            kx = np.hypot(E2[0] - E1[0], N2[0] - N1[0]) / (
                Nr * np.cos(phi) * np.radians(2 * h)
            )
            ky = np.hypot(E4[0] - E3[0], N4[0] - N3[0]) / (M * np.radians(2 * h))
            assert kx / ky == pytest.approx(1.0, abs=1e-6)

    def test_roundtrips(self):
        from mapchete_spark.geometry.tm import SwissObliqueMercator

        g = SwissObliqueMercator()
        rng = np.random.RandomState(8)
        lon = rng.uniform(5.9, 10.5, 300)
        lat = rng.uniform(45.8, 47.8, 300)
        lon2, lat2 = g.inverse_local(*g.forward_local(lon, lat))
        assert np.max(np.abs(lon2 - lon)) * 111320 < 1e-6
        lon3, lat3 = g.inverse(*g.forward(lon, lat))
        assert np.max(np.abs(lon3 - lon)) * 111320 < 0.01  # Helmert closure

    def test_lv95_offset(self):
        from mapchete_spark.geometry.tm import tm_grid

        lv03 = tm_grid("EPSG:21781")
        lv95 = tm_grid("EPSG:2056")
        lon, lat = np.array([8.0]), np.array([47.0])
        e3, n3 = lv03.forward(lon, lat)
        e5, n5 = lv95.forward(lon, lat)
        assert e5[0] - e3[0] == pytest.approx(2000000.0, abs=1e-9)
        assert n5[0] - n3[0] == pytest.approx(1000000.0, abs=1e-9)

    def test_via_get_transform(self):
        f = get_transform("EPSG:4326", "EPSG:21781")
        e, n = f(np.array([8.5417]), np.array([47.3769]))  # Zurich
        assert 660000 < e[0] < 710000 and 230000 < n[0] < 270000


class TestKrovak:
    """S-JTSK / Krovak (EPSG:5514): EPSG method 9819 on Bessel 1841."""

    def test_epsg_worked_example_sub_cm(self):
        """EPSG Guidance Note 7-2 worked example: 50d12'32.4416\"N,
        16d50'59.1790\"E (Greenwich) -> Southing 1050538.63,
        Westing 568991.00 — reproduced to < 2 cm (published values are
        cm-rounded)."""
        from mapchete_spark.geometry.tm import KrovakProjection

        g = KrovakProjection()
        lat = 50 + 12 / 60 + 32.4416 / 3600
        lon = 16 + 50 / 60 + 59.1790 / 3600
        E, N = g.forward_local(np.array([lon]), np.array([lat]))
        assert -N[0] == pytest.approx(1050538.63, abs=0.02)
        assert -E[0] == pytest.approx(568991.00, abs=0.02)

    def test_conformal_and_pseudo_parallel_scale(self):
        from mapchete_spark.geometry.tm import KrovakProjection

        g = KrovakProjection()
        e2, a = g.ell.e2, g.ell.a
        for L, P in [(14.42, 50.09), (17.0, 49.2), (18.5, 49.8)]:
            h = 1e-7
            E1, N1 = g.forward_local(np.array([L - h]), np.array([P]))
            E2, N2 = g.forward_local(np.array([L + h]), np.array([P]))
            E3, N3 = g.forward_local(np.array([L]), np.array([P - h]))
            E4, N4 = g.forward_local(np.array([L]), np.array([P + h]))
            phi = np.radians(P)
            M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
            Nr = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
            kx = np.hypot(E2[0] - E1[0], N2[0] - N1[0]) / (
                Nr * np.cos(phi) * np.radians(2 * h)
            )
            ky = np.hypot(E4[0] - E3[0], N4[0] - N3[0]) / (M * np.radians(2 * h))
            assert kx / ky == pytest.approx(1.0, abs=1e-6)  # conformal
            assert 0.9997 < kx < 1.0003  # near the k=0.9999 design band

    def test_roundtrips_and_chain(self):
        from mapchete_spark.geometry.tm import KrovakProjection

        g = KrovakProjection()
        rng = np.random.RandomState(5)
        lon = rng.uniform(12, 19, 300)
        lat = rng.uniform(48.5, 51.1, 300)
        lon2, lat2 = g.inverse_local(*g.forward_local(lon, lat))
        assert np.max(np.abs(lon2 - lon)) * 111320 < 1e-6
        lon3, lat3 = g.inverse(*g.forward(lon, lat))
        assert np.max(np.abs(lon3 - lon)) * 111320 < 0.05  # Helmert closure
        f = get_transform("EPSG:4326", "EPSG:5514")
        E, N = f(np.array([14.42]), np.array([50.09]))  # Prague
        assert -760000 < E[0] < -720000 and -1060000 < N[0] < -1020000
