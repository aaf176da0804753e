"""Gnomonic + Orthographic (geometry/azimuthal.py) — verified against
an INDEPENDENT 3-D construction: both are tangent-plane views of the
unit sphere, so the projection must equal the center/east/north-frame
dot products directly (no shared formulas with the implementation),
plus the gnomonic's defining straight-great-circle property."""

import numpy as np
import pytest

from mapchete_spark.geometry.azimuthal import (
    AzimuthalParams,
    Gnomonic,
    Orthographic,
)


def _frame(lat0, lon0):
    """(center, east, north) unit vectors of the tangent frame."""
    p1, l0 = np.radians(lat0), np.radians(lon0)
    c = np.array([
        np.cos(p1) * np.cos(l0), np.cos(p1) * np.sin(l0), np.sin(p1)
    ])
    e = np.array([-np.sin(l0), np.cos(l0), 0.0])
    n = np.cross(c, e) * -1.0  # north = -c x e ... fix sign below
    n = np.cross(e, c) * -1.0
    n = np.array([
        -np.sin(p1) * np.cos(l0), -np.sin(p1) * np.sin(l0), np.cos(p1)
    ])
    return c, e, n


def _unit(lat, lon):
    p, l = np.radians(lat), np.radians(lon)
    return np.array([np.cos(p) * np.cos(l), np.cos(p) * np.sin(l), np.sin(p)])


PTS = [(30.0, -110.0), (55.0, -80.0), (38.0, -95.0), (12.0, -130.0)]


@pytest.mark.parametrize("lat,lon", PTS)
def test_orthographic_matches_3d_view(lat, lon):
    p = AzimuthalParams(lat0=40.0, lon0=-100.0, R=1.0)
    g = Orthographic(p)
    c, e, n = _frame(p.lat0, p.lon0)
    v = _unit(lat, lon)
    x, y = g.forward(np.array([lon]), np.array([lat]))
    assert abs(x[0] - float(e @ v)) < 1e-14
    assert abs(y[0] - float(n @ v)) < 1e-14


@pytest.mark.parametrize("lat,lon", PTS)
def test_gnomonic_matches_3d_central_projection(lat, lon):
    p = AzimuthalParams(lat0=40.0, lon0=-100.0, R=1.0)
    g = Gnomonic(p)
    c, e, n = _frame(p.lat0, p.lon0)
    v = _unit(lat, lon)
    x, y = g.forward(np.array([lon]), np.array([lat]))
    assert abs(x[0] - float(e @ v) / float(c @ v)) < 1e-14
    assert abs(y[0] - float(n @ v) / float(c @ v)) < 1e-14


def test_gnomonic_great_circles_are_straight():
    """Snyder ch. 22: every great circle maps to a straight line. Take
    the great circle through two arbitrary points, sample it, project,
    and check collinearity (cross products ~0)."""
    p = AzimuthalParams(lat0=40.0, lon0=-100.0, R=1.0)
    g = Gnomonic(p)
    a, b = _unit(20.0, -120.0), _unit(50.0, -70.0)
    axis = np.cross(a, b)
    axis /= np.linalg.norm(axis)
    ts = np.linspace(0.0, 1.0, 9)
    pts = []
    for t in ts:
        # slerp along the great circle
        ang = np.arccos(np.clip(a @ b, -1, 1)) * t
        v = a * np.cos(ang) + np.cross(axis, a) * np.sin(ang)
        lat = np.degrees(np.arcsin(v[2]))
        lon = np.degrees(np.arctan2(v[1], v[0]))
        x, y = g.forward(np.array([lon]), np.array([lat]))
        pts.append((x[0], y[0]))
    (x0, y0), (x1, y1) = pts[0], pts[-1]
    for x, y in pts[1:-1]:
        cross = (x1 - x0) * (y - y0) - (y1 - y0) * (x - x0)
        assert abs(cross) < 1e-12


@pytest.mark.parametrize("cls", [Orthographic, Gnomonic])
def test_roundtrip(cls):
    p = AzimuthalParams(lat0=40.0, lon0=-100.0, R=6371008.8,
                        x0=5000.0, y0=-3000.0)
    g = cls(p)
    lons = np.linspace(-140.0, -60.0, 9)
    lats = np.linspace(0.0, 75.0, 7)
    gx, gy = np.meshgrid(lons, lats)
    x, y = g.forward(gx.ravel(), gy.ravel())
    lon2, lat2 = g.inverse(x, y)
    assert np.allclose(lon2, gx.ravel(), atol=1e-11)
    assert np.allclose(lat2, gy.ravel(), atol=1e-11)


def test_antipodal_masked():
    g = Orthographic(AzimuthalParams(lat0=0.0, lon0=0.0, R=1.0))
    x, y = g.forward(np.array([170.0]), np.array([0.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])
    gn = Gnomonic(AzimuthalParams(lat0=0.0, lon0=0.0, R=1.0))
    x, y = gn.forward(np.array([90.0]), np.array([0.0]))  # cos c == 0
    assert np.isnan(x[0]) and np.isnan(y[0])


def test_proj4_frontend_and_sphere_guard():
    from mapchete_spark.geometry.projparams import projection_from_proj4

    g = projection_from_proj4("+proj=ortho +lat_0=40 +lon_0=-100 +R=1")
    x, y = g.forward(np.array([-100.0]), np.array([40.0]))
    assert abs(x[0]) < 1e-15 and abs(y[0]) < 1e-15
    with pytest.raises(ValueError, match="sphere only"):
        projection_from_proj4("+proj=gnom +lat_0=40 +ellps=WGS84")
