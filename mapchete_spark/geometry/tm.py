"""General ellipsoidal transverse Mercator + Helmert datum shifts.

Extends the WGS84-only Krüger implementation in geometry/reproject to
ARBITRARY ellipsoids and datums, closing the "EPSG:27700 raises" gap:
national TM grids on non-WGS84 ellipsoids (British National Grid on
Airy 1830, with the published OSGB36<->WGS84 7-parameter Helmert
shift) now reproject closed-form. Same public sources as the UTM path:
the Krüger alpha/beta series in the third flattening n (Karney 2011,
arXiv:1002.1417, eqs. 35-36 — here as functions of n instead of
precomputed WGS84 constants) and the standard geodetic<->geocentric +
small-angle 7-parameter Helmert formulation (OS 'A guide to coordinate
systems in Great Britain', annexe C; pyproj applies the same
no-gridshift Helmert when NTv2 grids are absent, accuracy ~5 m for
OSGB36).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def kruger_coeffs(n: float) -> Tuple[Tuple[float, ...], Tuple[float, ...], float]:
    """(alpha, beta, rectifying_factor) series coefficients to n^6 for
    third flattening ``n``; rectifying radius = a * factor."""
    alpha = (
        n / 2.0 - 2.0 / 3.0 * n**2 + 5.0 / 16.0 * n**3
        + 41.0 / 180.0 * n**4 - 127.0 / 288.0 * n**5 + 7891.0 / 37800.0 * n**6,
        13.0 / 48.0 * n**2 - 3.0 / 5.0 * n**3 + 557.0 / 1440.0 * n**4
        + 281.0 / 630.0 * n**5 - 1983433.0 / 1935360.0 * n**6,
        61.0 / 240.0 * n**3 - 103.0 / 140.0 * n**4 + 15061.0 / 26880.0 * n**5
        + 167603.0 / 181440.0 * n**6,
        49561.0 / 161280.0 * n**4 - 179.0 / 168.0 * n**5
        + 6601661.0 / 7257600.0 * n**6,
        34729.0 / 80640.0 * n**5 - 3418889.0 / 1995840.0 * n**6,
        212378941.0 / 319334400.0 * n**6,
    )
    beta = (
        n / 2.0 - 2.0 / 3.0 * n**2 + 37.0 / 96.0 * n**3
        - 1.0 / 360.0 * n**4 - 81.0 / 512.0 * n**5 + 96199.0 / 604800.0 * n**6,
        1.0 / 48.0 * n**2 + 1.0 / 15.0 * n**3 - 437.0 / 1440.0 * n**4
        + 46.0 / 105.0 * n**5 - 1118711.0 / 3870720.0 * n**6,
        17.0 / 480.0 * n**3 - 37.0 / 840.0 * n**4 - 209.0 / 4480.0 * n**5
        + 5569.0 / 90720.0 * n**6,
        4397.0 / 161280.0 * n**4 - 11.0 / 504.0 * n**5
        - 830251.0 / 7257600.0 * n**6,
        4583.0 / 161280.0 * n**5 - 108847.0 / 3991680.0 * n**6,
        20648693.0 / 638668800.0 * n**6,
    )
    rect = (1.0 + n**2 / 4.0 + n**4 / 64.0 + n**6 / 256.0) / (1.0 + n)
    return alpha, beta, rect


@dataclass(frozen=True)
class Ellipsoid:
    a: float
    f: float

    @property
    def e(self) -> float:
        return (self.f * (2.0 - self.f)) ** 0.5

    @property
    def e2(self) -> float:
        return self.f * (2.0 - self.f)

    @property
    def n(self) -> float:
        return self.f / (2.0 - self.f)


WGS84 = Ellipsoid(6378137.0, 1.0 / 298.257223563)
AIRY_1830 = Ellipsoid(6377563.396, 1.0 / 299.3249646)
GRS80 = Ellipsoid(6378137.0, 1.0 / 298.257222101)


@dataclass(frozen=True)
class Helmert:
    """7-parameter small-angle Helmert transform applied to geocentric
    coordinates: X' = T + (1 + s)*R*X with R the small-angle rotation
    matrix. Units: meters / radians / unitless scale."""

    tx: float
    ty: float
    tz: float
    rx: float
    ry: float
    rz: float
    s: float

    def apply(self, x, y, z):
        k = 1.0 + self.s
        x2 = self.tx + k * (x - self.rz * y + self.ry * z)
        y2 = self.ty + k * (self.rz * x + y - self.rx * z)
        z2 = self.tz + k * (-self.ry * x + self.rx * y + z)
        return x2, y2, z2

    def inverse(self) -> "Helmert":
        # small-angle / small-scale inverse: negate all parameters
        return Helmert(
            -self.tx, -self.ty, -self.tz, -self.rx, -self.ry, -self.rz, -self.s
        )


_AS = np.pi / (180.0 * 3600.0)  # arcsecond -> radian

# OSGB36 -> WGS84 (OS guide annexe C / EPSG:1314 reversed signs):
# tx 446.448 ty -125.157 tz 542.060 m, rx 0.1502 ry 0.2470 rz 0.8421
# arcsec, s -20.4894 ppm
OSGB36_TO_WGS84 = Helmert(
    446.448, -125.157, 542.060,
    0.1502 * _AS, 0.2470 * _AS, 0.8421 * _AS,
    -20.4894e-6,
)


def geodetic_to_ecef(lon, lat, ell: Ellipsoid, h=0.0):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    s, c = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    x = (nu + h) * c * np.cos(lam)
    y = (nu + h) * c * np.sin(lam)
    z = (nu * (1.0 - ell.e2) + h) * s
    return x, y, z


def ecef_to_geodetic(x, y, z, ell: Ellipsoid, iters: int = 8):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1.0 - ell.e2))
    for _ in range(iters):
        s = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
        phi = np.arctan2(z + ell.e2 * nu * s, p)
    return np.degrees(lam), np.degrees(phi)


def datum_shift(lon, lat, src: Ellipsoid, dst: Ellipsoid, h7: Helmert):
    """Geodetic on ``src`` datum -> geodetic on ``dst`` datum via
    geocentric Helmert (heights assumed 0, the map-projection case)."""
    x, y, z = geodetic_to_ecef(lon, lat, src)
    x, y, z = h7.apply(x, y, z)
    return ecef_to_geodetic(x, y, z, dst)


class TransverseMercatorGrid:
    """General ellipsoidal TM grid: Krüger series on an arbitrary
    ellipsoid with natural-origin latitude, scale factor and false
    origin; optional Helmert datum shift from/to WGS84 geodetic."""

    def __init__(
        self,
        ell: Ellipsoid,
        lat0: float,
        lon0: float,
        k0: float,
        x0: float,
        y0: float,
        to_wgs84: Optional[Helmert] = None,
    ):
        self.ell = ell
        self.lon0, self.k0, self.x0, self.y0 = lon0, k0, x0, y0
        self.alpha, self.beta, rect = kruger_coeffs(ell.n)
        self.A = ell.a * rect
        self.to_wgs84 = to_wgs84
        self.from_wgs84 = to_wgs84.inverse() if to_wgs84 else None
        # rectifying northing of the natural origin (eta = 0)
        phi0 = np.radians(lat0)
        t0 = self._conformal_t(np.array([phi0]))
        xi0 = np.arctan2(t0, 1.0)
        y0m = xi0.copy()
        for j, a in enumerate(self.alpha, start=1):
            y0m = y0m + a * np.sin(2 * j * xi0)
        self.m0 = float(self.k0 * self.A * y0m[0])

    def _conformal_t(self, phi):
        e = self.ell.e
        return np.sinh(np.arcsinh(np.tan(phi)) - e * np.arctanh(e * np.sin(phi)))

    def forward(self, lon, lat):
        """WGS84 geodetic (or local-datum geodetic when no shift is
        registered) -> grid easting/northing."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        if self.from_wgs84 is not None:
            lon, lat = datum_shift(lon, lat, WGS84, self.ell, self.from_wgs84)
        return self.forward_local(lon, lat)

    def forward_local(self, lon, lat):
        """Local-datum geodetic -> grid (no datum shift)."""
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.lon0)
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        t = self._conformal_t(phi)
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xs, ys = eta.copy(), xi.copy()
        for j, a in enumerate(self.alpha, start=1):
            xs = xs + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            ys = ys + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        x = self.x0 + self.k0 * self.A * xs
        y = self.y0 + self.k0 * self.A * ys - self.m0
        return x, y

    def inverse_local(self, x, y):
        """Grid -> local-datum geodetic."""
        eta = (np.asarray(x, dtype=np.float64) - self.x0) / (self.k0 * self.A)
        xi = (np.asarray(y, dtype=np.float64) - self.y0 + self.m0) / (
            self.k0 * self.A
        )
        xp, yp = eta.copy(), xi.copy()
        for j, b in enumerate(self.beta, start=1):
            xp = xp - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            yp = yp - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        t = np.sin(yp) / np.sqrt(np.sinh(xp) ** 2 + np.cos(yp) ** 2)
        lam = np.arctan2(np.sinh(xp), np.cos(yp))
        e = self.ell.e
        phi = np.arctan(t)
        s = np.arcsinh(t)
        for _ in range(12):
            phi = np.arctan(np.sinh(s + e * np.arctanh(e * np.sin(phi))))
        return self.lon0 + np.degrees(lam), np.degrees(phi)

    def inverse(self, x, y):
        """Grid -> WGS84 geodetic (or local-datum when no shift)."""
        lon, lat = self.inverse_local(x, y)
        if self.to_wgs84 is not None:
            lon, lat = datum_shift(lon, lat, self.ell, WGS84, self.to_wgs84)
        return lon, lat


#: named TM grids on non-WGS84 datums
TM_REGISTRY = {
    # OSGB36 / British National Grid (Airy 1830, Helmert to WGS84)
    "EPSG:27700": lambda: TransverseMercatorGrid(
        AIRY_1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
        to_wgs84=OSGB36_TO_WGS84,
    ),
}


def tm_grid(crs: str) -> TransverseMercatorGrid:
    f = TM_REGISTRY.get(crs)
    if f is None:
        raise ValueError(
            f"no TM grid registered for {crs} (known: {sorted(TM_REGISTRY)})"
        )
    return f()


def is_tm(crs: str) -> bool:
    return crs in TM_REGISTRY


# ---- Swiss oblique Mercator (CH1903 / LV03, EPSG:21781) ---------------------

BESSEL_1841 = Ellipsoid(6377397.155, 1.0 / 299.1528128)

# CH1903 -> WGS84 geocentric translation (swisstopo GRANIT87; no
# rotation/scale published for the standard 3-parameter transform)
CH1903_TO_WGS84 = Helmert(674.374, 15.056, 405.346, 0.0, 0.0, 0.0, 0.0)


class SwissObliqueMercator:
    """CH1903 / LV03 (EPSG:21781): the published swisstopo double
    projection — Bessel ellipsoid conformally to a sphere, then an
    oblique Mercator about Bern — from 'Formulas and constants for the
    calculation of the Swiss conformal cylindrical projection and for
    the transformation between coordinate systems' (swisstopo, public).
    WGS84 input is shifted onto CH1903 with the GRANIT87 3-parameter
    Helmert (same no-gridshift accuracy class, ~1-2 m, as pyproj
    without the official NTv2 grid)."""

    LAT0 = 46.0 + 57.0 / 60.0 + 8.66 / 3600.0  # Bern
    LON0 = 7.0 + 26.0 / 60.0 + 22.50 / 3600.0
    X0, Y0 = 200000.0, 600000.0  # false northing (X), easting (Y)

    def __init__(self):
        ell = BESSEL_1841
        self.ell = ell
        e2 = ell.e2
        phi0 = np.radians(self.LAT0)
        s0, c0 = np.sin(phi0), np.cos(phi0)
        self.R = ell.a * np.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
        self.alpha = np.sqrt(1.0 + (e2 / (1.0 - e2)) * c0**4)
        self.b0 = np.arcsin(s0 / self.alpha)
        e = ell.e
        self.K = (
            np.log(np.tan(np.pi / 4.0 + self.b0 / 2.0))
            - self.alpha * np.log(np.tan(np.pi / 4.0 + phi0 / 2.0))
            + self.alpha * (e / 2.0) * np.log(
                (1.0 + e * s0) / (1.0 - e * s0)
            )
        )
        self.to_wgs84 = CH1903_TO_WGS84
        self.from_wgs84 = CH1903_TO_WGS84.inverse()

    def forward_local(self, lon, lat):
        """CH1903 geodetic (Bessel) -> LV03 (easting, northing)."""
        e = self.ell.e
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64) - self.LON0)
        s = np.sin(phi)
        S = (
            self.alpha * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
            - self.alpha * (e / 2.0) * np.log((1.0 + e * s) / (1.0 - e * s))
            + self.K
        )
        b = 2.0 * (np.arctan(np.exp(S)) - np.pi / 4.0)
        l = self.alpha * lam
        # rotate to the pseudo-equator system about Bern
        sb0, cb0 = np.sin(self.b0), np.cos(self.b0)
        bbar = np.arcsin(cb0 * np.sin(b) - sb0 * np.cos(b) * np.cos(l))
        lbar = np.arctan2(np.sin(l) * np.cos(b), np.cos(l) * np.cos(b) * cb0 + np.sin(b) * sb0)
        y = self.R * lbar
        x = (self.R / 2.0) * np.log((1.0 + np.sin(bbar)) / (1.0 - np.sin(bbar)))
        return self.Y0 + y, self.X0 + x

    def inverse_local(self, east, north):
        e = self.ell.e
        y = (np.asarray(east, dtype=np.float64) - self.Y0) / self.R
        x = (np.asarray(north, dtype=np.float64) - self.X0) / self.R
        bbar = 2.0 * (np.arctan(np.exp(x)) - np.pi / 4.0)
        lbar = y
        sb0, cb0 = np.sin(self.b0), np.cos(self.b0)
        b = np.arcsin(cb0 * np.sin(bbar) + sb0 * np.cos(bbar) * np.cos(lbar))
        l = np.arctan2(
            np.sin(lbar) * np.cos(bbar),
            np.cos(lbar) * np.cos(bbar) * cb0 - np.sin(bbar) * sb0,
        )
        lam = l / self.alpha
        # invert the conformal latitude of the sphere -> ellipsoid
        S = np.log(np.tan(np.pi / 4.0 + b / 2.0))
        phi = b
        for _ in range(_INV_ITERS := 12):
            s = np.sin(phi)
            phi = 2.0 * np.arctan(
                np.exp(
                    (S - self.K) / self.alpha
                    + (e / 2.0) * np.log((1.0 + e * s) / (1.0 - e * s))
                )
            ) - np.pi / 2.0
        return self.LON0 + np.degrees(lam), np.degrees(phi)

    def forward(self, lon, lat):
        lon, lat = datum_shift(lon, lat, WGS84, self.ell, self.from_wgs84)
        return self.forward_local(lon, lat)

    def inverse(self, east, north):
        lon, lat = self.inverse_local(east, north)
        return datum_shift(lon, lat, self.ell, WGS84, self.to_wgs84)


class _SwissLV95(SwissObliqueMercator):
    """CH1903+ / LV95 (EPSG:2056): identical projection, false origin
    shifted to (2 600 000, 1 200 000)."""

    X0, Y0 = 1200000.0, 2600000.0


TM_REGISTRY["EPSG:21781"] = SwissObliqueMercator
TM_REGISTRY["EPSG:2056"] = _SwissLV95


# ---- Krovak oblique conformal conic (S-JTSK, EPSG:5514) ---------------------

# S-JTSK -> WGS84 7-parameter Helmert (EPSG transformation 1622)
SJTSK_TO_WGS84 = Helmert(
    570.8, 85.7, 462.8,
    4.998 * _AS, 1.587 * _AS, 5.261 * _AS,
    3.56e-6,
)


class KrovakProjection:
    """Krovak oblique conformal conic on Bessel 1841 (EPSG method 9819,
    public EPSG Guidance Note 7-2 formulas) — S-JTSK / Krovak East-North
    (EPSG:5514: easting = -westing, northing = -southing). WGS84 input
    shifts through the EPSG:1622 Helmert (no-gridshift class, ~1 m)."""

    LAT_C = 49.5  # latitude of projection centre
    LON_0 = 24.0 + 50.0 / 60.0  # longitude of origin, east of Greenwich
    ALPHA_C = 30.0 + 17.0 / 60.0 + 17.3031 / 3600.0  # cone azimuth
    LAT_P = 78.5  # latitude of pseudo standard parallel
    K_P = 0.9999

    def __init__(self):
        ell = BESSEL_1841
        self.ell = ell
        e2, e = ell.e2, ell.e
        phiC = np.radians(self.LAT_C)
        sC = np.sin(phiC)
        self.A = ell.a * np.sqrt(1.0 - e2) / (1.0 - e2 * sC * sC)
        self.B = np.sqrt(1.0 + e2 * np.cos(phiC) ** 4 / (1.0 - e2))
        self.g0 = np.arcsin(sC / self.B)
        self.t0 = (
            np.tan(np.pi / 4.0 + self.g0 / 2.0)
            * ((1.0 + e * sC) / (1.0 - e * sC)) ** (e * self.B / 2.0)
            / np.tan(np.pi / 4.0 + phiC / 2.0) ** self.B
        )
        self.n = np.sin(np.radians(self.LAT_P))
        self.r0 = self.K_P * self.A / np.tan(np.radians(self.LAT_P))
        self.to_wgs84 = SJTSK_TO_WGS84
        self.from_wgs84 = SJTSK_TO_WGS84.inverse()

    def forward_local(self, lon, lat):
        """S-JTSK geodetic (Bessel, Greenwich longitudes) ->
        EPSG:5514 (easting, northing) — both negative over Czechia."""
        e = self.ell.e
        phi = np.radians(np.asarray(lat, dtype=np.float64))
        lam = np.radians(np.asarray(lon, dtype=np.float64))
        s = np.sin(phi)
        U = 2.0 * (
            np.arctan(
                self.t0
                * np.tan(phi / 2.0 + np.pi / 4.0) ** self.B
                / ((1.0 + e * s) / (1.0 - e * s)) ** (e * self.B / 2.0)
            )
            - np.pi / 4.0
        )
        V = self.B * (np.radians(self.LON_0) - lam)
        aC = np.radians(self.ALPHA_C)
        T = np.arcsin(np.cos(aC) * np.sin(U) + np.sin(aC) * np.cos(U) * np.cos(V))
        D = np.arcsin(np.cos(U) * np.sin(V) / np.cos(T))
        theta = self.n * D
        r = (
            self.r0
            * np.tan(np.pi / 4.0 + np.radians(self.LAT_P) / 2.0) ** self.n
            / np.tan(T / 2.0 + np.pi / 4.0) ** self.n
        )
        Xs = r * np.cos(theta)  # southing
        Yw = r * np.sin(theta)  # westing
        return -Yw, -Xs  # East-North orientation (EPSG:5514)

    def inverse_local(self, east, north):
        e = self.ell.e
        Yw = -np.asarray(east, dtype=np.float64)
        Xs = -np.asarray(north, dtype=np.float64)
        r = np.hypot(Xs, Yw)
        theta = np.arctan2(Yw, Xs)
        D = theta / self.n
        T = 2.0 * (
            np.arctan(
                (self.r0 / r) ** (1.0 / self.n)
                * np.tan(np.pi / 4.0 + np.radians(self.LAT_P) / 2.0)
            )
            - np.pi / 4.0
        )
        aC = np.radians(self.ALPHA_C)
        U = np.arcsin(np.cos(aC) * np.sin(T) - np.sin(aC) * np.cos(T) * np.cos(D))
        V = np.arcsin(np.cos(T) * np.sin(D) / np.cos(U))
        lam = np.radians(self.LON_0) - V / self.B
        # invert U(phi) by fixed point
        phi = U
        for _ in range(12):
            s = np.sin(phi)
            phi = 2.0 * (
                np.arctan(
                    (np.tan(U / 2.0 + np.pi / 4.0) / self.t0) ** (1.0 / self.B)
                    * ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0)
                )
                - np.pi / 4.0
            )
        return np.degrees(lam), np.degrees(phi)

    def forward(self, lon, lat):
        lon, lat = datum_shift(lon, lat, WGS84, self.ell, self.from_wgs84)
        return self.forward_local(lon, lat)

    def inverse(self, east, north):
        lon, lat = self.inverse_local(east, north)
        return datum_shift(lon, lat, self.ell, WGS84, self.to_wgs84)


TM_REGISTRY["EPSG:5514"] = KrovakProjection
