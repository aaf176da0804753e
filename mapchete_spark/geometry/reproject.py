"""Geodetic <-> spherical-mercator reprojection (pure numpy).

Replaces the reference's pyproj transformer usage
(mapchete/geometry/reproject.py:75-229) for the two built-in grids.
Spherical mercator (EPSG:3857) forward/inverse are closed-form, so no
proj database is needed. Vectorized over coordinate arrays, matching
the reference's 'reproject via coords-array function' pattern
(mapchete/geometry/transform.py:18-60).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS = 6378137.0
MERCATOR_MAX_LAT = 85.0511287798066  # atan(sinh(pi)) in degrees


def geodetic_to_mercator(lon: np.ndarray, lat: np.ndarray):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERCATOR_MAX_LAT, MERCATOR_MAX_LAT)
    x = np.radians(lon) * EARTH_RADIUS
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * EARTH_RADIUS
    return x, y


def mercator_to_geodetic(x: np.ndarray, y: np.ndarray):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): geodetic_to_mercator,
    ("EPSG:3857", "EPSG:4326"): mercator_to_geodetic,
}

# ---- UTM (ellipsoidal transverse Mercator, Krüger n-series) -------------------
#
# The reference reprojects through pyproj to ANY CRS; without pyproj the
# engine covers the CRS family its own operators need: the two built-in
# grids plus the UTM zones (EPSG:326xx north / 327xx south), which the
# reference's antimeridian-safe buffering depends on
# (mapchete/geometry/footprints.py:20-110). Formulas are the ELLIPSOIDAL
# transverse Mercator on WGS84 via the Krüger series in the third
# flattening n, truncated at n^6 (Karney 2011, 'Transverse Mercator with
# an accuracy of a few nanometers', arXiv:1002.1417; same series as
# published in Krüger 1912) — sub-micrometer accuracy inside a UTM zone,
# replacing the round-2 spherical approximation (~1e-3 relative error).
# All constants below are plain module-level floats so the DuckDB oracle
# twin embeds the bit-identical values via repr().

UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500000.0
UTM_FALSE_NORTHING_SOUTH = 10000000.0

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_N = WGS84_F / (2.0 - WGS84_F)  # third flattening
# first eccentricity; identity e = 2*sqrt(n)/(1+n) holds exactly
WGS84_E = (WGS84_F * (2.0 - WGS84_F)) ** 0.5
# rectifying radius A* = a/(1+n) * (1 + n^2/4 + n^4/64 + n^6/256)
A_RECT = (
    WGS84_A
    / (1.0 + _N)
    * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
)
# forward series coefficients alpha_j (Karney 2011 eq. 35, to n^6)
KRUGER_ALPHA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3
    + 41.0 / 180.0 * _N**4 - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
    13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
    + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
    + 167603.0 / 181440.0 * _N**6,
    49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5
    + 6601661.0 / 7257600.0 * _N**6,
    34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
    212378941.0 / 319334400.0 * _N**6,
)
# inverse series coefficients beta_j (Karney 2011 eq. 36, to n^6)
KRUGER_BETA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3
    - 1.0 / 360.0 * _N**4 - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
    1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
    + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
    + 5569.0 / 90720.0 * _N**6,
    4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5
    - 830251.0 / 7257600.0 * _N**6,
    4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
    20648693.0 / 638668800.0 * _N**6,
)


def utm_zone(lon: float, lat: float) -> str:
    """EPSG code of the UTM zone containing (lon, lat)."""
    zone = int((float(lon) + 180.0) // 6.0) + 1
    zone = min(max(zone, 1), 60)
    return f"EPSG:{32600 + zone}" if lat >= 0 else f"EPSG:{32700 + zone}"


def _utm_params(crs: str):
    code = int(crs.split(":")[1])
    if 32601 <= code <= 32660:
        zone, south = code - 32600, False
    elif 32701 <= code <= 32760:
        zone, south = code - 32700, True
    else:
        raise ValueError(f"not a UTM CRS: {crs}")
    lon0 = -183.0 + 6.0 * zone  # central meridian
    return lon0, south


def _conformal_t(phi: np.ndarray) -> np.ndarray:
    """tan of the conformal latitude: t = sinh(asinh(tan phi)
    - e*atanh(e*sin phi)) (WGS84 first eccentricity e)."""
    return np.sinh(
        np.arcsinh(np.tan(phi)) - WGS84_E * np.arctanh(WGS84_E * np.sin(phi))
    )


def geodetic_to_utm_factory(crs: str):
    """Forward ellipsoidal UTM: Krüger n^6 series on WGS84."""
    lon0, south = _utm_params(crs)

    def fwd(lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lam = np.radians(lon - lon0)
        phi = np.radians(lat)
        t = _conformal_t(phi)
        xi = np.arctan2(t, np.cos(lam))
        eta = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
        xs, ys = eta.copy(), xi.copy()
        for j, a in enumerate(KRUGER_ALPHA, start=1):
            xs = xs + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            ys = ys + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        x = UTM_K0 * A_RECT * xs + UTM_FALSE_EASTING
        y = UTM_K0 * A_RECT * ys
        if south:
            y = y + UTM_FALSE_NORTHING_SOUTH
        return x, y

    return fwd


# fixed-point rounds inverting the conformal latitude (converges ~1.5
# digits/round on WGS84; 12 rounds ~= double precision from any start)
_CONFORMAL_INV_ITERS = 12


def utm_to_geodetic_factory(crs: str):
    """Inverse ellipsoidal UTM: Krüger n^6 inverse series + fixed-point
    inversion of the conformal latitude."""
    lon0, south = _utm_params(crs)

    def inv(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if south:
            y = y - UTM_FALSE_NORTHING_SOUTH
        eta = (x - UTM_FALSE_EASTING) / (UTM_K0 * A_RECT)
        xi = y / (UTM_K0 * A_RECT)
        xp, yp = eta.copy(), xi.copy()
        for j, b in enumerate(KRUGER_BETA, start=1):
            xp = xp - b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
            yp = yp - b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        t = np.sin(yp) / np.sqrt(np.sinh(xp) ** 2 + np.cos(yp) ** 2)
        lam = np.arctan2(np.sinh(xp), np.cos(yp))
        # invert t = sinh(asinh(tan phi) - e*atanh(e*sin phi)):
        # phi <- atan(sinh(asinh(t) + e*atanh(e*sin phi)))
        phi = np.arctan(t)
        s = np.arcsinh(t)
        for _ in range(_CONFORMAL_INV_ITERS):
            phi = np.arctan(
                np.sinh(s + WGS84_E * np.arctanh(WGS84_E * np.sin(phi)))
            )
        return lon0 + np.degrees(lam), np.degrees(phi)

    return inv


def _to_geodetic(src: str):
    """(x, y) -> (lon, lat) for any supported CRS, or None for 4326."""
    from mapchete_spark.geometry.conic import conic_projection, is_conic
    from mapchete_spark.geometry.tm import is_tm, tm_grid

    if src == "EPSG:4326":
        return None
    if src == "EPSG:3857":
        return mercator_to_geodetic
    if src.startswith("EPSG:32"):
        return utm_to_geodetic_factory(src)
    if is_conic(src):
        return conic_projection(src).inverse
    if is_tm(src):
        return tm_grid(src).inverse
    from mapchete_spark.geometry.sterea import is_sterea, sterea_grid

    if is_sterea(src):
        return sterea_grid(src).inverse
    from mapchete_spark.geometry.omerc import is_omerc, omerc_grid

    if is_omerc(src):
        return omerc_grid(src).inverse
    from mapchete_spark.geometry.projparams import resolve_projection

    proj = resolve_projection(src)
    if proj is not None:
        return proj.inverse
    raise ValueError(f"unsupported CRS {src}")


def _from_geodetic(dst: str):
    """(lon, lat) -> (x, y) for any supported CRS, or None for 4326."""
    from mapchete_spark.geometry.conic import conic_projection, is_conic
    from mapchete_spark.geometry.tm import is_tm, tm_grid

    if dst == "EPSG:4326":
        return None
    if dst == "EPSG:3857":
        return geodetic_to_mercator
    if dst.startswith("EPSG:32"):
        return geodetic_to_utm_factory(dst)
    if is_conic(dst):
        return conic_projection(dst).forward
    if is_tm(dst):
        return tm_grid(dst).forward
    from mapchete_spark.geometry.sterea import is_sterea, sterea_grid

    if is_sterea(dst):
        return sterea_grid(dst).forward
    from mapchete_spark.geometry.omerc import is_omerc, omerc_grid

    if is_omerc(dst):
        return omerc_grid(dst).forward
    from mapchete_spark.geometry.projparams import resolve_projection

    proj = resolve_projection(dst)
    if proj is not None:
        return proj.forward
    raise ValueError(f"unsupported CRS {dst}")


def get_transform(src: str, dst: str):
    """Coordinate transform function (x, y) -> (x, y) between supported
    CRS: the built-in grids (4326/3857), UTM zones (326xx/327xx,
    Krüger n^6), and registered conic national grids (Lambert-93
    2154, Belgian Lambert 2008 3812, Conus Albers 5070 —
    geometry/conic.CONIC_REGISTRY). Any pair composes through
    geodetic. Identity when src == dst."""
    if src == dst:
        return lambda x, y: (np.asarray(x, np.float64), np.asarray(y, np.float64))
    inv, fwd = _to_geodetic(src), _from_geodetic(dst)
    if inv is None:
        return fwd
    if fwd is None:
        return inv
    return lambda x, y: fwd(*inv(x, y))


# ---- CRS valid-region bounds (area of use) -----------------------------------
#
# The reference clips geometries to the destination CRS's valid region
# before warping (mapchete/geometry/reproject.py:36-68 CRS_BOUNDS +
# pyproj area_of_use fallback; reproject_geometry clip_to_crs_bounds).
# Without a proj database the engine carries a curated table of
# published EPSG area-of-use boxes (geodetic degrees, west/south/east/
# north) for every CRS it registers, plus the closed-form UTM-zone rule.
# The first three entries use the reference's own literal values so the
# two engines clip identically on the CRSes both know.

CRS_BOUNDS = {
    "EPSG:4326": (-180.0, -90.0, 180.0, 90.0),
    "EPSG:3857": (-180.0, -85.0511, 180.0, 85.0511),
    "EPSG:3035": (-10.67, 34.5, 31.55, 71.05),
    # EPSG registry area-of-use values for the hand-registered grids
    "EPSG:2154": (-9.86, 41.15, 10.38, 51.56),  # RGF93 / Lambert-93
    "EPSG:3812": (2.5, 49.5, 6.4, 51.51),  # Belgian Lambert 2008
    "EPSG:5070": (-124.79, 24.41, -66.91, 49.38),  # Conus Albers
    "EPSG:2193": (166.33, -47.4, 178.63, -34.0),  # NZTM 2000
    "EPSG:3577": (112.85, -43.7, 153.69, -9.86),  # Australian Albers
    "EPSG:3978": (-141.01, 38.21, -40.73, 86.46),  # Canada Atlas LCC
    "EPSG:25832": (6.0, 38.76, 12.0, 84.33),  # ETRS89 / UTM 32N
    "EPSG:27700": (-9.0, 49.75, 2.01, 61.01),  # OSGB British National Grid
    "EPSG:28992": (3.2, 50.75, 7.22, 53.7),  # Amersfoort / RD New
    "EPSG:29873": (109.31, 0.85, 119.61, 7.67),  # Timbalai / RSO Borneo
    # polar grids (EPSG area of use; NSIDC sea-ice coverage for 3413/3976)
    "EPSG:3031": (-180.0, -90.0, 180.0, -60.0),
    "EPSG:3413": (-180.0, 60.0, 180.0, 90.0),
    "EPSG:3976": (-180.0, -90.0, 180.0, -40.0),
    "EPSG:5041": (-180.0, 60.0, 180.0, 90.0),
    "EPSG:5042": (-180.0, -90.0, 180.0, -60.0),
}


def register_crs_bounds(crs: str, bounds) -> None:
    """Register the geodetic valid region for a runtime-registered CRS
    (west, south, east, north in degrees)."""
    w, s, e, n = (float(v) for v in bounds)
    CRS_BOUNDS[crs] = (w, s, e, n)


def get_crs_bounds(crs: str):
    """Geodetic (west, south, east, north) valid region of ``crs``, or
    None when unknown (callers then warp without clipping, matching the
    reference's fallthrough when pyproj has no area_of_use)."""
    b = CRS_BOUNDS.get(crs)
    if b is not None:
        return b
    # UTM zones: EPSG area of use is the 6-degree meridian strip over
    # the zone's hemisphere
    if crs.startswith("EPSG:32"):
        try:
            lon0, south = _utm_params(crs)
        except ValueError:
            return None
        return (lon0 - 3.0, -80.0 if south else 0.0, lon0 + 3.0,
                0.0 if south else 84.0)
    return None


def reproject_ring(
    ring: np.ndarray, src: str, dst: str, segmentize_at=None, custom_transform=None
):
    """Reproject a coordinate ring, optionally densifying first
    (mapchete/geometry/reproject.py segmentize-before-warp behavior).

    ``custom_transform`` (V11, reference reproject_geometry's
    fiona_crs/custom transformer arg): a callable (x_array, y_array) ->
    (x_array, y_array) applied INSTEAD of the CRS pair — the reference
    passes pyproj transformers this way; any coords-array function
    works here."""
    from mapchete_spark.geometry.core import segmentize_ring

    r = np.asarray(ring, dtype=np.float64)
    if segmentize_at:
        r = segmentize_ring(r, segmentize_at)
    f = custom_transform if custom_transform is not None else get_transform(src, dst)
    x, y = f(r[:, 0], r[:, 1])
    return np.column_stack([x, y])


def transform_geometry(geom, fn):
    """Map ANY engine geometry (Point / LineString / MultiLineString /
    Polygon / MultiPolygon) through a coords transform ``fn(x_arr,
    y_arr) -> (x_arr, y_arr)`` — the per-geometry step of the
    reference's reproject_geometry (mapchete/geometry/reproject.py),
    which transforms every coordinate of whatever type fiona handed
    it. Rings/lines go through fn as whole arrays (vectorized)."""
    from mapchete_spark.geometry.core import (
        LineString,
        MultiLineString,
        MultiPolygon,
        Point,
        Polygon,
    )

    def _coords(arr):
        a = np.asarray(arr, dtype=np.float64)
        x, y = fn(a[:, 0], a[:, 1])
        return np.column_stack([x, y])

    if isinstance(geom, Point):
        x, y = fn(np.array([geom.x]), np.array([geom.y]))
        return Point(float(x[0]), float(y[0]))
    if isinstance(geom, LineString):
        return LineString(_coords(geom.coords))
    if isinstance(geom, MultiLineString):
        return MultiLineString(
            tuple(LineString(_coords(ln.coords)) for ln in geom.lines)
        )
    if isinstance(geom, Polygon):
        return Polygon(
            _coords(geom.exterior),
            tuple(_coords(r) for r in geom.interiors),
        )
    if isinstance(geom, MultiPolygon):
        return MultiPolygon(
            tuple(transform_geometry(p, fn) for p in geom.polygons)
        )
    raise ValueError(f"unsupported geometry type {type(geom).__name__}")
