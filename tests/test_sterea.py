"""Oblique (double) Stereographic, EPSG method 9809
(geometry/sterea.py) — the +proj=sterea family behind RD New
EPSG:28992. Pinned to the EPSG Guidance Note 7-2 published worked
example; reference parity: mapchete/geometry/reproject.py:75-229
(pyproj resolves these grids)."""

import numpy as np
import pytest

from mapchete_spark.geometry.sterea import (
    RD_NEW_PARAMS,
    ObliqueStereographic,
    sterea_grid,
)


def test_gn72_worked_example_forward():
    """EPSG GN7-2 §3.2.6.1 (Amersfoort / RD New): φ=53°N λ=6°E on
    Bessel 1841 -> E=196105.283 N=557057.739 (published to mm)."""
    g = ObliqueStereographic(RD_NEW_PARAMS)
    E, N = g.forward_local(np.array([6.0]), np.array([53.0]))
    assert abs(E[0] - 196105.283) < 1e-3
    assert abs(N[0] - 557057.739) < 1e-3


def test_gn72_worked_example_inverse():
    g = ObliqueStereographic(RD_NEW_PARAMS)
    lon, lat = g.inverse_local(
        np.array([196105.283]), np.array([557057.739])
    )
    # inputs are the mm-rounded published coordinates: ~3e-9 deg of
    # the residual is the rounding itself
    assert abs(lon[0] - 6.0) < 1e-7
    assert abs(lat[0] - 53.0) < 1e-7


def test_local_roundtrip_grid():
    g = ObliqueStereographic(RD_NEW_PARAMS)
    lons = np.linspace(3.4, 7.0, 13)
    lats = np.linspace(50.9, 53.5, 11)
    gx, gy = np.meshgrid(lons, lats)
    E, N = g.forward_local(gx.ravel(), gy.ravel())
    lon2, lat2 = g.inverse_local(E, N)
    assert np.allclose(lon2, gx.ravel(), atol=1e-11)
    assert np.allclose(lat2, gy.ravel(), atol=1e-11)


def test_wgs84_path_through_helmert():
    """The registered EPSG:28992 applies the Amersfoort Helmert; the
    WGS84 round trip closes to ~1e-7 deg (small-angle inverse)."""
    g = sterea_grid("EPSG:28992")
    E, N = g.forward(np.array([5.387638889]), np.array([52.156160556]))
    # the projection origin in WGS84 is NOT (x0, y0) — the datum shift
    # moves it ~100 m; it must still land within 200 m of (FE, FN)
    assert abs(E[0] - 155000.0) < 200.0
    assert abs(N[0] - 463000.0) < 200.0
    lon, lat = g.inverse(E, N)
    assert abs(lon[0] - 5.387638889) < 1e-6
    assert abs(lat[0] - 52.156160556) < 1e-6


def test_get_transform_dispatch():
    from mapchete_spark.geometry.reproject import get_transform

    f = get_transform("EPSG:4326", "EPSG:28992")
    inv = get_transform("EPSG:28992", "EPSG:4326")
    E, N = f(np.array([6.0]), np.array([53.0]))
    lon, lat = inv(E, N)
    assert abs(lon[0] - 6.0) < 1e-6 and abs(lat[0] - 53.0) < 1e-6


def test_proj4_frontend():
    """+proj=sterea resolves through projparams (no datum shift)."""
    from mapchete_spark.geometry.projparams import projection_from_proj4

    g = projection_from_proj4(
        "+proj=sterea +lat_0=52.15616055555555 "
        "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 "
        "+y_0=463000 +ellps=bessel +units=m +no_defs"
    )
    E, N = g.forward(np.array([6.0]), np.array([53.0]))
    assert abs(E[0] - 196105.283) < 1e-3
    assert abs(N[0] - 557057.739) < 1e-3


def test_unknown_sterea_grid_raises():
    with pytest.raises(ValueError, match="EPSG:9999"):
        sterea_grid("EPSG:9999")
