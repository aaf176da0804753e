"""Property tests for the pseudocylindrical families (round 5):
Sinusoidal (Snyder ch. 30) and Equal Earth (Šavrič-Patterson-Jenny
2018). No third-party numbers are pinned from memory — the anchors are
the public MODIS grid constant, closed-form special values, a numeric
meridian-arc integral, and the equal-area Jacobian property against
the exact ellipsoid area element."""

import math

import numpy as np
import pytest

from mapchete_spark.geometry.projparams import (
    EPSG_PROJ4,
    projection_from_proj4,
)
from mapchete_spark.geometry.pseudocyl import (
    _EE_A1,
    EqualEarth,
    PseudocylParams,
    Sinusoidal,
    _meridian_arc,
)

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)

MODIS_R = 6371007.181
#: the published MODIS tile width: 10 degrees of arc on the MODIS
#: sphere (rounded to 6 decimals in NASA docs)
MODIS_TILE = 1111950.519667


@pytest.fixture(scope="module")
def grid():
    rs = np.random.RandomState(7)
    return rs.uniform(-179, 179, 500), rs.uniform(-88, 88, 500)


def test_modis_tile_width_pin():
    sinu = projection_from_proj4(EPSG_PROJ4["SR-ORG:6974"])
    assert isinstance(sinu, Sinusoidal) and sinu.e2 == 0.0
    x, y = sinu.forward(10.0, 0.0)
    assert abs(float(x) - MODIS_TILE) < 2e-4  # constant published to 1e-6
    assert abs(float(y)) < 1e-9
    # exact closed form on the sphere
    assert abs(float(x) - MODIS_R * math.radians(10.0)) < 1e-9


def test_sinusoidal_sphere_roundtrip(grid):
    lons, lats = grid
    sinu = projection_from_proj4(EPSG_PROJ4["SR-ORG:6974"])
    lo, la = sinu.inverse(*sinu.forward(lons, lats))
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9


def test_sinusoidal_ellipsoid_roundtrip(grid):
    lons, lats = grid
    sinu = projection_from_proj4(EPSG_PROJ4["ESRI:54008"])
    assert isinstance(sinu, Sinusoidal) and sinu.e2 > 0.0
    lo, la = sinu.inverse(*sinu.forward(lons, lats))
    # footpoint series is exact to O(e1^4): ~1e-7 deg (~1 cm)
    assert np.abs(lo - lons).max() < 5e-7
    assert np.abs(la - lats).max() < 5e-8


def test_meridian_arc_vs_numeric_integral():
    """Snyder 3-21 series against a 200k-point trapezoid integral of
    the exact meridian curvature radius — independent of the series."""
    for lat in (15.0, 45.0, 80.0):
        phis = np.linspace(0.0, math.radians(lat), 200_000)
        integrand = (1.0 - WGS84_E2) / np.power(
            1.0 - WGS84_E2 * np.sin(phis) ** 2, 1.5
        )
        numeric = WGS84_A * np.trapz(integrand, phis)
        series = float(_meridian_arc(np.array(math.radians(lat)), WGS84_A, WGS84_E2))
        assert abs(series - numeric) < 0.01  # < 1 cm


def test_equal_earth_anchors():
    ee = projection_from_proj4(EPSG_PROJ4["EPSG:8857"])
    assert isinstance(ee, EqualEarth)
    # the authalic radius of WGS84 IS the MODIS sphere radius (that is
    # where NASA's constant comes from) — a strong cross-check of qp
    assert abs(ee.Rq - MODIS_R) < 0.1
    x, y = ee.forward(0.0, 0.0)
    assert abs(float(x)) < 1e-9 and abs(float(y)) < 1e-9
    # equator closed form: theta == 0, x = Rq*lam/(M*A1)
    x, y = ee.forward(120.0, 0.0)
    expect = ee.Rq * math.radians(120.0) / (math.sqrt(3.0) / 2.0 * _EE_A1)
    assert abs(float(x) - expect) < 1e-6
    assert abs(float(y)) < 1e-9
    # symmetry
    xs, ys = ee.forward(np.array([30.0, -30.0]), np.array([45.0, -45.0]))
    assert abs(xs[0] + xs[1]) < 1e-6 and abs(ys[0] + ys[1]) < 1e-6


def test_equal_earth_roundtrip(grid):
    lons, lats = grid
    ee = projection_from_proj4(EPSG_PROJ4["EPSG:8857"])
    lo, la = ee.inverse(*ee.forward(lons, lats))
    assert np.abs(lo - lons).max() < 1e-10
    assert np.abs(la - lats).max() < 1e-10


@pytest.mark.parametrize("code", ["EPSG:8857", "ESRI:54008"])
def test_equal_area_jacobian(code, grid):
    """Both families are equal-area: the numeric Jacobian of the
    forward map must equal the exact ellipsoid area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 everywhere."""
    lons, lats = grid
    proj = projection_from_proj4(EPSG_PROJ4[code])
    h = 1e-5
    x0, y0 = proj.forward(lons, lats)
    xl, yl = proj.forward(lons + h, lats)
    xp, yp = proj.forward(lons, lats + h)
    dr = math.radians(h)
    J = ((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0)) / (dr * dr)
    phi = np.radians(lats)
    exact = (
        WGS84_A
        * WGS84_A
        * (1.0 - WGS84_E2)
        * np.cos(phi)
        / np.power(1.0 - WGS84_E2 * np.sin(phi) ** 2, 2)
    )
    assert (np.abs(np.abs(J) - exact) / exact).max() < 2e-4


def test_proj4_parameter_offsets():
    """lon_0/x_0/y_0 flow through the proj4 front-end."""
    p = projection_from_proj4(
        "+proj=sinu +lon_0=100 +x_0=5000 +y_0=-2000 +a=6371007.181 "
        "+b=6371007.181 +units=m +no_defs"
    )
    x, y = p.forward(100.0, 0.0)
    assert abs(float(x) - 5000.0) < 1e-9
    assert abs(float(y) + 2000.0) < 1e-9


def test_column_twin_matches_library():
    """conicsql's Column constants derive from the same instances the
    library dispatches — spot-check the scalar pipeline agrees with
    the numpy classes (full engine-vs-DuckDB parity is the
    eqearth_sinu_reproject contract query)."""
    from mapchete_spark.functions import conicsql as C

    ee = projection_from_proj4(EPSG_PROJ4["EPSG:8857"])
    assert C.EE_QP == ee.qp and C.EE_RQ == ee.Rq
    sn = projection_from_proj4(EPSG_PROJ4["SR-ORG:6974"])
    assert C.SINU_R == sn.a


def test_equal_earth_spherical():
    """ADVICE r5: '+proj=eqearth +R=...' (f=0 -> e=0) must not divide
    by zero in the authalic q term — the sphere branch of conic._q /
    _authalic_inverse must carry through EqualEarth."""
    import numpy as np

    from mapchete_spark.geometry.pseudocyl import EqualEarth, PseudocylParams

    g = EqualEarth(PseudocylParams(lon0=0.0, x0=0.0, y0=0.0,
                                   a=6371008.8, f=0.0))
    x, y = g.forward(np.array([10.0, -120.0]), np.array([45.0, -30.0]))
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    lon, lat = g.inverse(x, y)
    assert np.allclose(lon, [10.0, -120.0], atol=1e-9)
    assert np.allclose(lat, [45.0, -30.0], atol=1e-9)


def test_equal_earth_spherical_proj4():
    import numpy as np

    from mapchete_spark.geometry.projparams import projection_from_proj4

    g = projection_from_proj4("+proj=eqearth +R=6371008.8")
    x, y = g.forward(np.array([10.0]), np.array([45.0]))
    assert np.isfinite(x[0]) and np.isfinite(y[0])
