"""Hotine Oblique Mercator — EPSG methods 9812 (variant A) and 9815
(variant B), from the published EPSG Guidance Note 7-2 §3.2.5
formulas (public specification; Snyder ch. 9 gives the same
projection). The grid behind Borneo RSO (EPSG:29873), Malaysian BRSO
(EPSG:3376), Alaska zone 1 and the Swiss-style oblique cylinders proj
spells ``+proj=omerc``.

Variant A places the grid origin at the aposphere's natural origin
(FE/FN at the intersection of the initial line with its perpendicular
through the center); variant B ("Oblique Mercator", proj's
``+no_uoff`` absent) anchors Ec/Nc at the projection CENTER, offset
by ``uc`` along the initial line.

The GN7-2 worked example (Timbalai 1948 / RSO Borneo (m): φ=5°23'
14.1129"N λ=115°48'19.8196"E -> 679245.73 E, 596562.78 N) is pinned
in tests/test_omerc.py. Reference parity:
mapchete/geometry/reproject.py:75-229 (pyproj resolves any CRS).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from mapchete_spark.geometry.tm import Ellipsoid

_INV_ITERS = 15


@dataclass(frozen=True)
class ObliqueMercatorParams:
    latc: float  # latitude of projection centre (degrees)
    lonc: float  # longitude of projection centre (degrees)
    alphac: float  # azimuth of the initial line at the centre (degrees)
    gammac: float  # rectified-to-skew grid angle (degrees; often == alphac)
    kc: float  # scale on the initial line
    x0: float  # FE (variant A) or Ec (variant B)
    y0: float  # FN (variant A) or Nc (variant B)
    ell: Ellipsoid = Ellipsoid(6378137.0, 1.0 / 298.257222101)
    variant: str = "B"  # "A" (9812) or "B" (9815)


class HotineObliqueMercator:
    def __init__(self, p: ObliqueMercatorParams):
        if p.variant not in ("A", "B"):
            raise ValueError(f"variant must be A or B, got {p.variant!r}")
        self.p = p
        a, e2 = p.ell.a, p.ell.e2
        e = np.sqrt(e2)
        phic = np.radians(p.latc)
        alphac = np.radians(p.alphac)
        sc, cc = np.sin(phic), np.cos(phic)
        self.B = float(np.sqrt(1.0 + e2 * cc**4 / (1.0 - e2)))
        self.A = float(
            a * self.B * p.kc * np.sqrt(1.0 - e2) / (1.0 - e2 * sc * sc)
        )
        t0 = np.tan(np.pi / 4.0 - phic / 2.0) / (
            (1.0 - e * sc) / (1.0 + e * sc)
        ) ** (e / 2.0)
        D = self.B * np.sqrt(1.0 - e2) / (cc * np.sqrt(1.0 - e2 * sc * sc))
        D2 = max(float(D * D), 1.0)
        sign = 1.0 if p.latc >= 0 else -1.0
        F = D + np.sqrt(D2 - 1.0) * sign
        self.H = float(F * t0**self.B)
        G = (F - 1.0 / F) / 2.0
        self.gamma0 = float(np.arcsin(np.sin(alphac) / D))
        self.lam0 = float(
            np.radians(p.lonc)
            - np.arcsin(G * np.tan(self.gamma0)) / self.B
        )
        # variant B: the centre's u coordinate along the initial line
        self.uc = float(
            (self.A / self.B)
            * np.arctan2(np.sqrt(D2 - 1.0), np.cos(alphac))
            * sign
        ) if p.variant == "B" else 0.0
        self.e = float(e)
        self.gammac = float(np.radians(p.gammac))

    def forward(self, lon, lat):
        p = self.p
        lam = np.radians(np.asarray(lon, np.float64))
        phi = np.radians(np.asarray(lat, np.float64))
        s = self.e * np.sin(phi)
        t = np.tan(np.pi / 4.0 - phi / 2.0) / (
            (1.0 - s) / (1.0 + s)
        ) ** (self.e / 2.0)
        Q = self.H / t**self.B
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        dl = self.B * (lam - self.lam0)
        V = np.sin(dl)
        U = (-V * np.cos(self.gamma0) + S * np.sin(self.gamma0)) / T
        v = self.A * np.log((1.0 - U) / (1.0 + U)) / (2.0 * self.B)
        u = (
            self.A
            * np.arctan2(
                S * np.cos(self.gamma0) + V * np.sin(self.gamma0),
                np.cos(dl),
            )
            / self.B
        ) - self.uc
        cg, sg = np.cos(self.gammac), np.sin(self.gammac)
        E = p.x0 + v * cg + u * sg
        N = p.y0 + u * cg - v * sg
        return E, N

    def inverse(self, x, y):
        p = self.p
        dE = np.asarray(x, np.float64) - p.x0
        dN = np.asarray(y, np.float64) - p.y0
        cg, sg = np.cos(self.gammac), np.sin(self.gammac)
        v = dE * cg - dN * sg
        u = dN * cg + dE * sg + self.uc
        Q = np.exp(-self.B * v / self.A)
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(self.B * u / self.A)
        U = (V * np.cos(self.gamma0) + S * np.sin(self.gamma0)) / T
        t = (
            self.H
            / np.sqrt((1.0 + U) / (1.0 - U))
        ) ** (1.0 / self.B)
        # Snyder 7-9 fixed point (same as the conic/stere inverses)
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(_INV_ITERS):
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0)
            )
        lam = self.lam0 - np.arctan2(
            S * np.cos(self.gamma0) - V * np.sin(self.gamma0),
            np.cos(self.B * u / self.A),
        ) / self.B
        return np.degrees(lam), np.degrees(phi)


def _dms(d, m, s):
    return d + m / 60.0 + s / 3600.0


#: Everest 1830 (1967 definition) — the Timbalai 1948 ellipsoid
EVEREST_1967 = Ellipsoid(a=6377298.556, f=1.0 / 300.8017)

#: Timbalai 1948 / RSO Borneo (m) — the GN7-2 variant B worked example
RSO_BORNEO_PARAMS = ObliqueMercatorParams(
    latc=4.0,
    lonc=115.0,
    alphac=_dms(53, 18, 56.9537),
    gammac=_dms(53, 7, 48.3685),
    kc=0.99984,
    x0=590476.87,
    y0=442857.65,
    ell=EVEREST_1967,
    variant="B",
)

OMERC_REGISTRY = {
    "EPSG:29873": lambda: HotineObliqueMercator(RSO_BORNEO_PARAMS),
}


def omerc_grid(crs: str) -> HotineObliqueMercator:
    f = OMERC_REGISTRY.get(crs)
    if f is None:
        raise ValueError(
            f"no oblique-mercator grid registered for {crs} "
            f"(known: {sorted(OMERC_REGISTRY)})"
        )
    return f()


def is_omerc(crs: str) -> bool:
    return crs in OMERC_REGISTRY
