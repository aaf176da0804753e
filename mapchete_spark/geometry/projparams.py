"""Proj-parameter front-end: resolve ANY CRS in the implemented
projection families without a per-CRS registration commit.

The reference accepts arbitrary pyproj CRS (mapchete/geometry/
reproject.py:75-229); this sandbox has no proj database, so the honest
equivalent is a parser over the public proj4 parameter language that
instantiates the already-general projection machinery:

- ``+proj=lcc``   -> geometry/conic.LambertConformalConic (1SP or 2SP)
- ``+proj=aea``   -> geometry/conic.AlbersEqualArea
- ``+proj=laea``  -> geometry/conic.LambertAzimuthalEqualArea
- ``+proj=tmerc`` -> geometry/tm.TransverseMercatorGrid (Krüger n^6)
- ``+proj=utm``   -> tmerc with the zone's central meridian
- ``+proj=merc``  -> spherical web-mercator path (reproject)
- ``+proj=stere``/``ups`` -> geometry/conic.PolarStereographic (polar aspects)
- ``+proj=sinu``  -> geometry/pseudocyl.Sinusoidal (MODIS grid et al.)
- ``+proj=eqearth`` -> geometry/pseudocyl.EqualEarth (EPSG:8857)
- ``+proj=longlat`` -> identity (geodetic)

Ellipsoids come from ``+ellps=`` (the standard proj names) or explicit
``+a=/+b=/+rf=/+f=``. ``+towgs84`` 7-parameter Helmert shifts are
parsed and applied through geometry/tm's datum_shift for tmerc (the
only family here whose registered CRS need one — OSGB); for the conic
families the registered codes are all on GRS80/WGS84-compatible
datums, and a non-zero towgs84 raises rather than silently ignoring a
datum shift.

Besides literal proj4 strings, a small built-in EPSG -> proj4 table
covers common codes outside the hand-registered set, and
``register_crs`` lets a user add any code at runtime:

    register_crs("EPSG:9999", "+proj=lcc +lat_1=.. +lat_2=.. ...")

``resolve_projection`` is wired into geometry/reproject.get_transform
as the fallback before "unsupported CRS" raises.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from mapchete_spark.geometry.conic import (
    GRS80_A,
    GRS80_F,
    ConicParams,
    projection_from_params,
)

#: proj ellipsoid name -> (a, f). Public values from the proj registry.
ELLIPSOIDS = {
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "intl": (6378388.0, 1.0 / 297.0),
    "bessel": (6377397.155, 1.0 / 299.1528128),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "clrk66": (6378206.4, 1.0 / 294.9786982),
    "clrk80": (6378249.145, 1.0 / 293.465),
    "krass": (6378245.0, 1.0 / 298.3),
    "sphere": (6370997.0, 0.0),
}

#: built-in EPSG -> proj4 definitions (public proj/EPSG registry
#: strings) for codes NOT in the hand-tuned registries. Anything the
#: user needs beyond this goes through register_crs at runtime.
EPSG_PROJ4 = {
    # ETRS89-extended / LAEA Europe (also hand-registered; kept here so
    # the front-end alone can resolve it)
    "EPSG:3035": (
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
        "+ellps=GRS80 +units=m +no_defs"
    ),
    # NZGD2000 / New Zealand Transverse Mercator 2000
    "EPSG:2193": (
        "+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
        "+y_0=10000000 +ellps=GRS80 +units=m +no_defs"
    ),
    # GDA94 / Australian Albers
    "EPSG:3577": (
        "+proj=aea +lat_0=0 +lon_0=132 +lat_1=-18 +lat_2=-36 +x_0=0 "
        "+y_0=0 +ellps=GRS80 +units=m +no_defs"
    ),
    # NAD83 / Canada Atlas Lambert
    "EPSG:3978": (
        "+proj=lcc +lat_0=49 +lon_0=-95 +lat_1=49 +lat_2=77 +x_0=0 "
        "+y_0=0 +ellps=GRS80 +units=m +no_defs"
    ),
    # ETRS89 / UTM zone 32N (ellipsoid alias of EPSG:32632)
    "EPSG:25832": (
        "+proj=utm +zone=32 +ellps=GRS80 +units=m +no_defs"
    ),
    # NAD83 / Conus Albers sphere-free duplicate of the hand registry
    "EPSG:5070": (
        "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
        "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs"
    ),
    # US National Atlas Equal Area (authalic sphere LAEA)
    "EPSG:2163": (
        "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +a=6370997 "
        "+b=6370997 +units=m +no_defs"
    ),
    # WGS 84 / Antarctic Polar Stereographic (variant B, lat_ts=-71)
    "EPSG:3031": (
        "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
        "+ellps=WGS84 +units=m +no_defs"
    ),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic North
    "EPSG:3413": (
        "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
        "+ellps=WGS84 +units=m +no_defs"
    ),
    # WGS 84 / NSIDC Sea Ice Polar Stereographic South
    "EPSG:3976": (
        "+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +x_0=0 +y_0=0 "
        "+ellps=WGS84 +units=m +no_defs"
    ),
    # WGS 84 / UPS North (variant A, k0=0.994 at the pole)
    "EPSG:5041": (
        "+proj=stere +lat_0=90 +lat_ts=90 +lon_0=0 +k=0.994 "
        "+x_0=2000000 +y_0=2000000 +ellps=WGS84 +units=m +no_defs"
    ),
    # WGS 84 / UPS South
    "EPSG:5042": (
        "+proj=stere +lat_0=-90 +lat_ts=-90 +lon_0=0 +k=0.994 "
        "+x_0=2000000 +y_0=2000000 +ellps=WGS84 +units=m +no_defs"
    ),
    # WGS 84 / Equal Earth Greenwich (Šavrič-Patterson-Jenny 2018)
    "EPSG:8857": (
        "+proj=eqearth +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m "
        "+no_defs"
    ),
    # NASA MODIS sinusoidal grid (sphere R=6371007.181; no EPSG code
    # exists — the community spatialreference.org alias is used)
    "SR-ORG:6974": (
        "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +a=6371007.181 "
        "+b=6371007.181 +units=m +no_defs"
    ),
    # World Sinusoidal on the WGS84 ellipsoid (ESRI registry)
    "ESRI:54008": (
        "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m "
        "+no_defs"
    ),
}

#: runtime registrations (register_crs)
_USER_CRS: Dict[str, str] = {}


def parse_proj4(text: str) -> Dict[str, str]:
    """proj4 string -> {key: value} dict; bare flags map to ''."""
    out: Dict[str, str] = {}
    for tok in text.split():
        if not tok.startswith("+"):
            raise ValueError(f"malformed proj4 token {tok!r} in {text!r}")
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            out[k] = v
        else:
            out[body] = ""
    return out


def _ellipsoid(pp: Dict[str, str]):
    """(a, f) from +R / +ellps / +a,+b / +a,+rf / +a,+f (proj
    precedence: explicit axes override the named ellipsoid; +R
    requests a sphere of that radius)."""
    if "R" in pp:
        return float(pp["R"]), 0.0
    if "a" in pp:
        a = float(pp["a"])
        if "rf" in pp:
            f = 1.0 / float(pp["rf"])
        elif "f" in pp:
            f = float(pp["f"])
        elif "b" in pp:
            b = float(pp["b"])
            f = (a - b) / a
        else:
            f = 0.0  # sphere
        return a, f
    name = pp.get("ellps", "GRS80")
    if name not in ELLIPSOIDS:
        raise ValueError(
            f"unknown ellipsoid {name!r} (known: {sorted(ELLIPSOIDS)})"
        )
    return ELLIPSOIDS[name]


def _check_no_datum_shift(pp: Dict[str, str], family: str) -> None:
    tw = pp.get("towgs84")
    if tw and any(float(v) != 0.0 for v in tw.split(",")):
        raise ValueError(
            f"+towgs84 datum shift not supported for +proj={family} "
            "(register the CRS through geometry/tm for Helmert datums)"
        )


def projection_from_proj4(proj4: Union[str, Dict[str, str]]):
    """Instantiate a projection object (``forward``/``inverse`` methods
    over numpy arrays) from a proj4 string or parsed dict."""
    pp = parse_proj4(proj4) if isinstance(proj4, str) else dict(proj4)
    family = pp.get("proj")
    if family is None:
        raise ValueError("proj4 definition missing +proj=")

    if family in ("lonlat", "longlat", "latlong"):
        return None  # geodetic — identity in the transform pipeline

    a, f = _ellipsoid(pp)
    g = lambda k, d=0.0: float(pp.get(k, d))

    if family in ("lcc", "aea", "laea"):
        _check_no_datum_shift(pp, family)
        lat1 = g("lat_1", g("lat_0"))
        return projection_from_params(
            ConicParams(
                kind=family,
                lat0=g("lat_0"),
                lon0=g("lon_0"),
                lat1=lat1,
                lat2=g("lat_2", lat1),
                x0=g("x_0"),
                y0=g("y_0"),
                a=a,
                f=f,
            )
        )

    if family in ("tmerc", "utm"):
        from mapchete_spark.geometry.tm import (
            Ellipsoid,
            Helmert,
            TransverseMercatorGrid,
        )

        if family == "utm":
            zone = int(pp["zone"])
            lon0 = -183.0 + 6.0 * zone
            lat0, k0 = 0.0, 0.9996
            x0 = 500000.0
            y0 = 10000000.0 if "south" in pp else 0.0
        else:
            lon0, lat0 = g("lon_0"), g("lat_0")
            k0 = g("k", g("k_0", 1.0))
            x0, y0 = g("x_0"), g("y_0")
        helm: Optional[Helmert] = None
        tw = pp.get("towgs84")
        if tw:
            vals = [float(v) for v in tw.split(",")]
            vals += [0.0] * (7 - len(vals))
            if any(v != 0.0 for v in vals):
                # proj4 convention: translations m, rotations arcsec,
                # scale ppm; Helmert wants radians / unitless
                arcsec = 3.141592653589793 / (180.0 * 3600.0)
                helm = Helmert(
                    vals[0], vals[1], vals[2],
                    vals[3] * arcsec, vals[4] * arcsec, vals[5] * arcsec,
                    vals[6] * 1e-6,
                )
        return TransverseMercatorGrid(
            ell=Ellipsoid(a=a, f=f),
            lat0=lat0,
            lon0=lon0,
            k0=k0,
            x0=x0,
            y0=y0,
            to_wgs84=helm,
        )

    if family in ("stere", "ups"):
        _check_no_datum_shift(pp, family)
        from mapchete_spark.geometry.conic import (
            PolarStereographic,
            PolarStereoParams,
        )

        if family == "ups":
            # Universal Polar Stereographic: fixed EPSG parameters
            lat0 = -90.0 if "south" in pp else 90.0
            return PolarStereographic(
                PolarStereoParams(
                    lat0=lat0, lon0=0.0, lat_ts=lat0, k0=0.994,
                    x0=2000000.0, y0=2000000.0, a=a, f=f,
                )
            )
        lat0 = g("lat_0")
        if abs(lat0) != 90.0:
            raise ValueError(
                "+proj=stere is implemented for the polar aspects only "
                "(+lat_0=90 or -90); oblique stereographic is not "
                "supported"
            )
        return PolarStereographic(
            PolarStereoParams(
                lat0=lat0,
                lon0=g("lon_0"),
                lat_ts=g("lat_ts", lat0),
                k0=g("k", g("k_0", 1.0)),
                x0=g("x_0"),
                y0=g("y_0"),
                a=a,
                f=f,
            )
        )

    if family == "sterea":
        # Oblique (double) Stereographic, EPSG method 9809 — distinct
        # from +proj=stere (polar 9810/9829), matching proj's split
        from mapchete_spark.geometry.sterea import (
            ObliqueStereographic,
            ObliqueStereoParams,
        )
        from mapchete_spark.geometry.tm import Ellipsoid, Helmert

        helm: Optional[Helmert] = None
        tw = pp.get("towgs84")
        if tw:
            vals = [float(v) for v in tw.split(",")]
            vals += [0.0] * (7 - len(vals))
            if any(v != 0.0 for v in vals):
                arcsec = 3.141592653589793 / (180.0 * 3600.0)
                helm = Helmert(
                    vals[0], vals[1], vals[2],
                    vals[3] * arcsec, vals[4] * arcsec, vals[5] * arcsec,
                    vals[6] * 1e-6,
                )
        return ObliqueStereographic(
            ObliqueStereoParams(
                lat0=g("lat_0"),
                lon0=g("lon_0"),
                k0=g("k", g("k_0", 1.0)),
                x0=g("x_0"),
                y0=g("y_0"),
                ell=Ellipsoid(a=a, f=f),
            ),
            to_wgs84=helm,
        )

    if family in ("sinu", "eqearth"):
        _check_no_datum_shift(pp, family)
        from mapchete_spark.geometry.pseudocyl import (
            EqualEarth,
            PseudocylParams,
            Sinusoidal,
        )

        cls = Sinusoidal if family == "sinu" else EqualEarth
        return cls(
            PseudocylParams(
                lon0=g("lon_0"), x0=g("x_0"), y0=g("y_0"), a=a, f=f
            )
        )

    if family == "omerc":
        # Hotine Oblique Mercator, EPSG 9812/9815 (proj's omerc;
        # +no_uoff selects variant A per proj semantics)
        _check_no_datum_shift(pp, family)
        from mapchete_spark.geometry.omerc import (
            HotineObliqueMercator,
            ObliqueMercatorParams,
        )
        from mapchete_spark.geometry.tm import Ellipsoid

        alpha = g("alpha", 90.0)
        return HotineObliqueMercator(
            ObliqueMercatorParams(
                latc=g("lat_0"),
                lonc=g("lonc", g("lon_0")),
                alphac=alpha,
                gammac=g("gamma", alpha),
                kc=g("k", g("k_0", 1.0)),
                x0=g("x_0"),
                y0=g("y_0"),
                ell=Ellipsoid(a=a, f=f),
                variant="A" if "no_uoff" in pp else "B",
            )
        )

    if family in ("gnom", "ortho"):
        _check_no_datum_shift(pp, family)
        from mapchete_spark.geometry.azimuthal import azimuthal_from_proj4

        return azimuthal_from_proj4(family, pp, a, f)

    if family in ("merc", "webmerc"):
        _check_no_datum_shift(pp, family)
        from mapchete_spark.geometry import reproject as R

        class _Merc:
            forward = staticmethod(R.geodetic_to_mercator)
            inverse = staticmethod(R.mercator_to_geodetic)

        return _Merc()

    raise ValueError(
        f"+proj={family} not implemented (families: lcc aea laea tmerc "
        "utm merc stere sterea omerc ups gnom ortho sinu eqearth "
        "longlat)"
    )


def register_crs(code: str, proj4: str) -> None:
    """Register an EPSG code -> proj4 definition at runtime; validates
    by instantiating immediately so a bad definition fails loudly here,
    not inside a Spark task."""
    projection_from_proj4(proj4)
    _USER_CRS[code] = proj4


def proj4_for(crs: str) -> Optional[str]:
    return _USER_CRS.get(crs) or EPSG_PROJ4.get(crs)


def resolve_projection(crs: str):
    """Projection object for any front-end-resolvable CRS, or None if
    the code is unknown here (callers fall through to their own
    raise)."""
    if crs.lstrip("+").startswith("proj="):
        return projection_from_proj4(crs)
    p4 = proj4_for(crs)
    return projection_from_proj4(p4) if p4 is not None else None
