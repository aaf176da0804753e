"""Hotine Oblique Mercator (geometry/omerc.py) — EPSG 9812/9815,
pinned to the EPSG Guidance Note 7-2 §3.2.5 worked example (Timbalai
1948 / RSO Borneo). Reference parity:
mapchete/geometry/reproject.py:75-229 (pyproj resolves these grids)."""

import numpy as np
import pytest

from mapchete_spark.geometry.omerc import (
    RSO_BORNEO_PARAMS,
    HotineObliqueMercator,
    ObliqueMercatorParams,
    _dms,
    omerc_grid,
)

_LON = _dms(115, 48, 19.8196)
_LAT = _dms(5, 23, 14.1129)


def test_gn72_worked_example_forward():
    """GN7-2: Timbalai 1948, φ=5°23'14.1129"N λ=115°48'19.8196"E ->
    E=679245.73, N=596562.78 (published to cm)."""
    g = omerc_grid("EPSG:29873")
    E, N = g.forward(np.array([_LON]), np.array([_LAT]))
    assert abs(E[0] - 679245.73) < 1e-2
    assert abs(N[0] - 596562.78) < 1e-2


def test_gn72_worked_example_inverse():
    g = omerc_grid("EPSG:29873")
    lon, lat = g.inverse(np.array([679245.73]), np.array([596562.78]))
    assert abs(lon[0] - _LON) < 1e-7
    assert abs(lat[0] - _LAT) < 1e-7


def test_roundtrip_grid():
    g = omerc_grid("EPSG:29873")
    lons = np.linspace(110.0, 119.0, 11)
    lats = np.linspace(1.0, 7.5, 9)
    gx, gy = np.meshgrid(lons, lats)
    E, N = g.forward(gx.ravel(), gy.ravel())
    lon2, lat2 = g.inverse(E, N)
    assert np.allclose(lon2, gx.ravel(), atol=1e-11)
    assert np.allclose(lat2, gy.ravel(), atol=1e-11)


def test_scale_on_initial_line():
    """Conformal scale at the projection centre equals kc (0.99984):
    finite-difference the forward along a meridian arc at the centre
    against the ellipsoidal meridian radius."""
    p = RSO_BORNEO_PARAMS
    g = HotineObliqueMercator(p)
    d = 1e-6  # degrees
    E0, N0 = g.forward(np.array([p.lonc]), np.array([p.latc]))
    E1, N1 = g.forward(np.array([p.lonc]), np.array([p.latc + d]))
    grid_dist = float(np.hypot(E1 - E0, N1 - N0)[0])
    a, e2 = p.ell.a, p.ell.e2
    s = np.sin(np.radians(p.latc))
    rho = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    true_dist = float(rho * np.radians(d))
    assert abs(grid_dist / true_dist - p.kc) < 1e-6


def test_variant_a_differs_by_center_offset():
    """Variant A (no uc offset) differs from B by a constant shift
    along the skew axis — same point geometry, different origin."""
    p = RSO_BORNEO_PARAMS
    pa = ObliqueMercatorParams(
        latc=p.latc, lonc=p.lonc, alphac=p.alphac, gammac=p.gammac,
        kc=p.kc, x0=p.x0, y0=p.y0, ell=p.ell, variant="A",
    )
    ga, gb = HotineObliqueMercator(pa), HotineObliqueMercator(p)
    lons = np.array([114.0, 116.0, 118.0])
    lats = np.array([2.0, 4.5, 7.0])
    Ea, Na = ga.forward(lons, lats)
    Eb, Nb = gb.forward(lons, lats)
    dE, dN = Ea - Eb, Na - Nb
    assert np.allclose(dE, dE[0], atol=1e-6)
    assert np.allclose(dN, dN[0], atol=1e-6)
    assert abs(dE[0]) > 1.0  # the offset is real
    lon2, lat2 = ga.inverse(Ea, Na)
    assert np.allclose(lon2, lons, atol=1e-11)
    assert np.allclose(lat2, lats, atol=1e-11)


def test_get_transform_dispatch():
    from mapchete_spark.geometry.reproject import get_transform

    f = get_transform("EPSG:4326", "EPSG:29873")
    inv = get_transform("EPSG:29873", "EPSG:4326")
    E, N = f(np.array([_LON]), np.array([_LAT]))
    assert abs(E[0] - 679245.73) < 1e-2
    lon, lat = inv(E, N)
    assert abs(lon[0] - _LON) < 1e-11 and abs(lat[0] - _LAT) < 1e-11


def test_proj4_frontend():
    from mapchete_spark.geometry.projparams import projection_from_proj4

    g = projection_from_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
        "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
        "+y_0=442857.65 +a=6377298.556 +rf=300.8017"
    )
    E, N = g.forward(np.array([_LON]), np.array([_LAT]))
    assert abs(E[0] - 679245.73) < 1e-2
    assert abs(N[0] - 596562.78) < 1e-2


def test_unknown_grid_raises():
    with pytest.raises(ValueError, match="EPSG:9999"):
        omerc_grid("EPSG:9999")
