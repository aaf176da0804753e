"""Ellipsoidal conic projections + a named-EPSG parameter registry.

Closes the V5 "arbitrary EPSG codes raise" gap for the CRS class real
mapchete configs actually use beyond UTM: national grids on Lambert
Conformal Conic (France's Lambert-93 EPSG:2154, Belgian Lambert 2008
EPSG:3812) and continental equal-area grids on Albers (NAD83 / Conus
Albers EPSG:5070). The reference reaches these through pyproj
(mapchete/geometry/reproject.py:75-229); without a proj database the
engine implements the two projection families closed-form from the
public Snyder formulas (Snyder 1987, *Map Projections — A Working
Manual*, USGS PP 1395: LCC eqs. 15-1..15-11, Albers eqs. 14-1..14-11)
and registers per-EPSG parameters.

Datum note: the registered CRS are on GRS80 (RGF93 / ETRS89 / NAD83),
which agrees with WGS84 to well under a millimeter of flattening
difference; like pyproj's default no-gridshift pipeline, no datum
shift is applied. All constants are module-level floats so the DuckDB
oracle twin embeds bit-identical values via ``repr()``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)
GRS80_E = GRS80_E2**0.5

# fixed-point rounds for the inverse latitude series (same budget as
# reproject._CONFORMAL_INV_ITERS; ~1.5 digits/round)
_INV_ITERS = 12


@dataclass(frozen=True)
class ConicParams:
    kind: str  # "lcc" | "aea" | "laea"
    lat0: float  # latitude of origin (deg)
    lon0: float  # central meridian (deg)
    lat1: float  # first standard parallel (deg; unused for laea)
    lat2: float  # second standard parallel (deg; unused for laea)
    x0: float  # false easting (m)
    y0: float  # false northing (m)
    a: float = GRS80_A  # ellipsoid semi-major axis (m)
    f: float = GRS80_F  # ellipsoid flattening


#: named EPSG codes -> projection parameters (EPSG registry values)
CONIC_REGISTRY = {
    # RGF93 / Lambert-93 (France)
    "EPSG:2154": ConicParams("lcc", 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0),
    # ETRS89 / Belgian Lambert 2008
    "EPSG:3812": ConicParams(
        "lcc", 50.797815, 4.359215833333333, 49.833333333333336,
        51.166666666666664, 649328.0, 665262.0,
    ),
    # NAD83 / Conus Albers
    "EPSG:5070": ConicParams("aea", 23.0, -96.0, 29.5, 45.5, 0.0, 0.0),
    # ETRS89-extended / LAEA Europe (EEA statistical grid)
    "EPSG:3035": ConicParams(
        "laea", 52.0, 10.0, 0.0, 0.0, 4321000.0, 3210000.0
    ),
}

_CONIC_CLASSES = {}  # filled after the classes are defined


def _m(phi: np.ndarray, e2: float = GRS80_E2) -> np.ndarray:
    """Snyder 14-15: m = cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)


def _t(phi: np.ndarray, e: float = GRS80_E) -> np.ndarray:
    """Snyder 15-9: t = tan(pi/4 - phi/2) / ((1 - e sin phi) /
    (1 + e sin phi))^(e/2)."""
    s = e * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - s) / (1.0 + s)
    ) ** (e / 2.0)


def _q(phi: np.ndarray, e: float = GRS80_E) -> np.ndarray:
    """Snyder 3-12 (authalic latitude integrand): q = (1 - e^2) *
    [sin phi / (1 - e^2 sin^2 phi) - (1/(2e)) ln((1 - e sin phi) /
    (1 + e sin phi))]."""
    e2 = e * e
    s = np.sin(phi)
    es = e * s
    if e == 0.0:
        return 2.0 * s
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
    )


def _authalic_inverse(qv: np.ndarray, e: float, e2: float) -> np.ndarray:
    """Authalic -> geodetic latitude (Snyder 3-16 fixed point). On a
    sphere (e == 0) q = 2 sin(phi), so phi = arcsin(q/2) exactly — the
    series step divides by 2e and must be skipped (the proj4 front-end
    advertises +a=+b spheres, e.g. the legacy US NA atlas EPSG:2163)."""
    phi = np.arcsin(np.clip(qv / 2.0, -1.0, 1.0))
    if e == 0.0:
        return phi
    for _ in range(_INV_ITERS):
        s = np.sin(phi)
        es = e * s
        one = 1.0 - e2 * s * s
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            qv / (1.0 - e2)
            - s / one
            + (1.0 / (2.0 * e)) * np.log((1.0 - es) / (1.0 + es))
        )
    return phi


class LambertConformalConic:
    """Ellipsoidal LCC with two standard parallels (Snyder ch. 15)."""

    def __init__(self, p: ConicParams):
        self.a = p.a
        e2 = p.f * (2.0 - p.f)
        self.e = e2**0.5
        phi0, phi1, phi2 = map(np.radians, (p.lat0, p.lat1, p.lat2))
        m1, m2 = _m(np.array(phi1), e2), _m(np.array(phi2), e2)
        t0, t1, t2 = (
            _t(np.array(phi0), self.e),
            _t(np.array(phi1), self.e),
            _t(np.array(phi2), self.e),
        )
        if p.lat1 == p.lat2:
            # 1SP degenerate: n = sin(lat1) (Snyder p. 107)
            self.n = float(np.sin(phi1))
        else:
            self.n = float(
                (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
            )
        if abs(self.n) < 1e-9:
            # standard parallels symmetric about the equator: the cone
            # degenerates to a cylinder (n -> 0); that projection IS
            # Mercator — same behavior as proj's lat_1 = -lat_2 error
            raise ValueError(
                "LCC is undefined for standard parallels symmetric about "
                "the equator (cone constant n ~ 0); use +proj=merc"
            )
        self.F = float(m1 / (self.n * t1**self.n))
        self.rho0 = float(self.a * self.F * t0**self.n)
        self.lon0 = p.lon0
        self.x0, self.y0 = p.x0, p.y0

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = self.a * self.F * _t(phi, self.e) ** self.n
        th = self.n * np.radians(lon - self.lon0)
        return self.x0 + rho * np.sin(th), self.y0 + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.x0
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sign(self.n) * np.sqrt(dx * dx + dy * dy)
        tp = (rho / (self.a * self.F)) ** (1.0 / self.n)
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        lon = self.lon0 + np.degrees(th / self.n)
        # Snyder 7-9 fixed point: phi = pi/2 - 2 atan(t ((1 - e sin phi)
        # / (1 + e sin phi))^(e/2))
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(_INV_ITERS):
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tp * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0)
            )
        return lon, np.degrees(phi)


class AlbersEqualArea:
    """Ellipsoidal Albers with two standard parallels (Snyder ch. 14)."""

    def __init__(self, p: ConicParams):
        self.a = p.a
        self.e2 = p.f * (2.0 - p.f)
        self.e = self.e2**0.5
        phi0, phi1, phi2 = map(np.radians, (p.lat0, p.lat1, p.lat2))
        m1, m2 = _m(np.array(phi1), self.e2), _m(np.array(phi2), self.e2)
        q0, q1, q2 = (
            _q(np.array(phi0), self.e),
            _q(np.array(phi1), self.e),
            _q(np.array(phi2), self.e),
        )
        if p.lat1 == p.lat2:
            # 1SP degenerate: n = sin(lat1) (Snyder 14-5 limit)
            self.n = float(np.sin(phi1))
        else:
            self.n = float((m1 * m1 - m2 * m2) / (q2 - q1))
        self.C = float(m1 * m1 + self.n * q1)
        self.rho0 = float(self.a * np.sqrt(self.C - self.n * q0) / self.n)
        self.lon0 = p.lon0
        self.x0, self.y0 = p.x0, p.y0

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        rho = self.a * np.sqrt(self.C - self.n * _q(phi, self.e)) / self.n
        th = self.n * np.radians(lon - self.lon0)
        return self.x0 + rho * np.sin(th), self.y0 + self.rho0 - rho * np.cos(th)

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.x0
        dy = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        rho = np.sqrt(dx * dx + dy * dy)
        qv = (self.C - (rho * self.n / self.a) ** 2) / self.n
        th = np.arctan2(np.sign(self.n) * dx, np.sign(self.n) * dy)
        lon = self.lon0 + np.degrees(th / self.n)
        phi = _authalic_inverse(qv, self.e, self.e2)
        return lon, np.degrees(phi)


class LambertAzimuthalEqualArea:
    """Ellipsoidal LAEA, oblique aspect (Snyder ch. 24, eqs. 24-2..24-8
    forward, 24-16..24-21 + the Albers authalic fixed point inverse).
    Covers ETRS89-extended / LAEA Europe (EPSG:3035), the EEA's
    standard statistical grid."""

    def __init__(self, p: ConicParams):
        self.a = p.a
        self.e2 = p.f * (2.0 - p.f)
        self.e = self.e2**0.5
        phi0 = np.radians(p.lat0)
        self.qp = float(_q(np.array(np.pi / 2.0), self.e))
        q0 = float(_q(np.array(phi0), self.e))
        self.beta1 = float(np.arcsin(np.clip(q0 / self.qp, -1.0, 1.0)))
        self.Rq = float(self.a * np.sqrt(self.qp / 2.0))
        m1 = float(_m(np.array(phi0), self.e2))
        self.D = float(self.a * m1 / (self.Rq * np.cos(self.beta1)))
        self.lon0 = p.lon0
        self.x0, self.y0 = p.x0, p.y0

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        beta = np.arcsin(np.clip(_q(phi, self.e) / self.qp, -1.0, 1.0))
        lam = np.radians(lon - self.lon0)
        sb1, cb1 = np.sin(self.beta1), np.cos(self.beta1)
        sb, cb = np.sin(beta), np.cos(beta)
        B = self.Rq * np.sqrt(
            2.0 / (1.0 + sb1 * sb + cb1 * cb * np.cos(lam))
        )
        x = self.x0 + B * self.D * cb * np.sin(lam)
        y = self.y0 + (B / self.D) * (cb1 * sb - sb1 * cb * np.cos(lam))
        return x, y

    def inverse(self, x, y):
        dx = (np.asarray(x, dtype=np.float64) - self.x0) / self.D
        dy = (np.asarray(y, dtype=np.float64) - self.y0) * self.D
        rho = np.sqrt(dx * dx + dy * dy)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        sb1, cb1 = np.sin(self.beta1), np.cos(self.beta1)
        with np.errstate(invalid="ignore", divide="ignore"):
            qv = self.qp * np.where(
                rho > 0.0,
                cce * sb1 + dy * sce * cb1 / np.where(rho > 0.0, rho, 1.0),
                sb1,
            )
            lam = np.arctan2(dx * sce, rho * cb1 * cce - dy * sb1 * sce)
        lon = self.lon0 + np.degrees(lam)
        phi = _authalic_inverse(qv, self.e, self.e2)
        return lon, np.degrees(phi)


@dataclass(frozen=True)
class PolarStereoParams:
    lat0: float  # +90 (north aspect) or -90 (south aspect)
    lon0: float  # central meridian (deg)
    lat_ts: float  # standard parallel (deg); == lat0 for variant A
    k0: float  # scale at the pole (variant A only; ignored otherwise)
    x0: float  # false easting (m)
    y0: float  # false northing (m)
    a: float = GRS80_A
    f: float = GRS80_F


class PolarStereographic:
    """Ellipsoidal polar stereographic, north and south aspects
    (Snyder ch. 21 eqs. 21-33/21-34 + 15-9; EPSG method 9810 "variant
    A" when defined by a pole scale factor k0, 9829 "variant B" when
    defined by a standard parallel lat_ts). Covers the standard polar
    grids: Antarctic EPSG:3031, NSIDC Arctic EPSG:3413, NSIDC South
    EPSG:3976, and UPS EPSG:5041/5042. The reference reaches these
    through pyproj (mapchete/geometry/reproject.py:75-229).

    South aspect via the exact symmetry t_south(phi) = t(-phi) =
    tan(pi/4 + phi/2) / ((1 + e sin phi)/(1 - e sin phi))^(e/2) with
    x = x0 + rho sin(lam), y = y0 + rho cos(lam) — the EPSG GN7-2
    south-polar formulation."""

    def __init__(self, p: PolarStereoParams):
        if abs(p.lat0) != 90.0:
            raise ValueError(
                "polar stereographic requires +lat_0=90 or -90 "
                "(oblique stereographic is not supported)"
            )
        self.a = p.a
        self.e2 = p.f * (2.0 - p.f)
        self.e = self.e2**0.5
        self.south = p.lat0 < 0.0
        self.lon0 = p.lon0
        self.x0, self.y0 = p.x0, p.y0
        if abs(p.lat_ts) == 90.0:
            # variant A: rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))
            cc = np.sqrt(
                (1.0 + self.e) ** (1.0 + self.e)
                * (1.0 - self.e) ** (1.0 - self.e)
            )
            self.rho_per_t = float(2.0 * self.a * p.k0 / cc)
        else:
            # variant B: rho = a m_c t / t_c at the (north-equivalent)
            # standard parallel
            phic = np.radians(abs(p.lat_ts))
            self.rho_per_t = float(
                self.a
                * _m(np.array(phic), self.e2)
                / _t(np.array(phic), self.e)
            )

    def forward(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        if self.south:
            phi = -phi
        rho = self.rho_per_t * _t(phi, self.e)
        lam = np.radians(lon - self.lon0)
        x = self.x0 + rho * np.sin(lam)
        y = self.y0 + rho * np.cos(lam) if self.south else (
            self.y0 - rho * np.cos(lam)
        )
        return x, y

    def inverse(self, x, y):
        dx = np.asarray(x, dtype=np.float64) - self.x0
        dyy = np.asarray(y, dtype=np.float64) - self.y0
        dyn = dyy if self.south else -dyy
        rho = np.sqrt(dx * dx + dyn * dyn)
        tp = rho / self.rho_per_t
        lam = np.arctan2(dx, dyn)
        # Snyder 7-9 conformal fixed point (same as the LCC inverse);
        # rho == 0 (the pole itself) yields phi = pi/2 exactly
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(_INV_ITERS):
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tp * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0)
            )
        lat = np.degrees(phi)
        if self.south:
            lat = -lat
        return self.lon0 + np.degrees(lam), lat


_CONIC_CLASSES.update(
    {
        "lcc": LambertConformalConic,
        "aea": AlbersEqualArea,
        "laea": LambertAzimuthalEqualArea,
    }
)


def projection_from_params(p: ConicParams):
    """Projection object for explicit conic/azimuthal parameters (the
    proj-parameter front-end entry point — geometry/projparams.py)."""
    try:
        cls = _CONIC_CLASSES[p.kind]
    except KeyError:
        raise ValueError(f"unknown projection kind {p.kind!r}") from None
    return cls(p)


def conic_projection(crs: str):
    """Projection object for a registered conic EPSG code."""
    p = CONIC_REGISTRY.get(crs)
    if p is None:
        raise ValueError(
            f"no conic parameters registered for {crs} "
            f"(known: {sorted(CONIC_REGISTRY)})"
        )
    return projection_from_params(p)


def is_conic(crs: str) -> bool:
    return crs in CONIC_REGISTRY
