"""Grid definitions and bounds.

Semantics reference: mapchete/bounds.py:12-240 (Bounds), grid constants
documented at doc/source/tiling.rst:39-52 and mapchete/bounds.py:76-84
(mercator constant).  ROUND mirrors tilematrix._conf.ROUND (imported by
mapchete/tile.py:21 and applied to pixel/tile sizes at tile.py:184-191).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Tuple

# decimal places used when rounding tile / pixel sizes in map units
# (tilematrix._conf.ROUND semantics)
ROUND = 20

# EPSG:3857 half-circumference in meters (mapchete/bounds.py:76-84)
MERCATOR_BOUND = 20037508.3427892


@dataclass(frozen=True)
class Bounds:
    """(left, bottom, right, top) bounds with set-style helpers."""

    left: float
    bottom: float
    right: float
    top: float

    def __iter__(self) -> Iterator[float]:
        yield self.left
        yield self.bottom
        yield self.right
        yield self.top

    @property
    def width(self) -> float:
        return self.right - self.left

    @property
    def height(self) -> float:
        return self.top - self.bottom

    def intersects(self, other: "Bounds") -> bool:
        """Open/closed semantics of mapchete/bounds.py:219-240:
        touching bounds DO intersect (>=/<= comparison)."""
        return (
            self.left <= other.right
            and self.right >= other.left
            and self.bottom <= other.top
            and self.top >= other.bottom
        )

    def intersection(self, other: "Bounds") -> "Bounds":
        return Bounds(
            max(self.left, other.left),
            max(self.bottom, other.bottom),
            min(self.right, other.right),
            min(self.top, other.top),
        )

    def __add__(self, other: "Bounds") -> "Bounds":
        return Bounds(
            min(self.left, other.left),
            min(self.bottom, other.bottom),
            max(self.right, other.right),
            max(self.top, other.top),
        )

    def is_empty(self) -> bool:
        return self.left >= self.right or self.bottom >= self.top


@dataclass(frozen=True)
class GridDef:
    """A tile grid: spatial bounds + base matrix shape + CRS tag.

    ``base_rows`` x ``base_cols`` is the tile matrix at zoom 0 with
    metatiling 1; at zoom z the matrix is (base_rows*2^z, base_cols*2^z).
    """

    name: str
    left: float
    bottom: float
    right: float
    top: float
    base_rows: int
    base_cols: int
    srs: str
    is_global: bool

    @property
    def bounds(self) -> Bounds:
        return Bounds(self.left, self.bottom, self.right, self.top)

    @property
    def x_size(self) -> float:
        return self.right - self.left

    @property
    def y_size(self) -> float:
        return self.top - self.bottom

    def matrix_shape(self, zoom: int) -> Tuple[int, int]:
        return (self.base_rows << zoom, self.base_cols << zoom)


GEODETIC = GridDef(
    name="geodetic",
    left=-180.0,
    bottom=-90.0,
    right=180.0,
    top=90.0,
    base_rows=1,
    base_cols=2,
    srs="EPSG:4326",
    is_global=True,
)

MERCATOR = GridDef(
    name="mercator",
    left=-MERCATOR_BOUND,
    bottom=-MERCATOR_BOUND,
    right=MERCATOR_BOUND,
    top=MERCATOR_BOUND,
    base_rows=1,
    base_cols=1,
    srs="EPSG:3857",
    is_global=True,
)


def grid_from_name_or_dict(grid) -> GridDef:
    """Resolve 'geodetic' / 'mercator' / custom dict to a GridDef.

    Custom grid dict mirrors the reference's custom grid example
    (examples/custom_grid/custom_grid.mapchete:38-50): keys ``shape``
    (rows, cols), ``bounds`` (l, b, r, t), ``srs``, optional ``is_global``.
    """
    if isinstance(grid, GridDef):
        return grid
    if isinstance(grid, str):
        if grid == "geodetic":
            return GEODETIC
        if grid == "mercator":
            return MERCATOR
        raise ValueError(f"unknown grid name: {grid}")
    if isinstance(grid, dict):
        rows, cols = grid["shape"]
        left, bottom, right, top = grid["bounds"]
        srs = grid.get("srs") or grid.get("proj") or "custom"
        if isinstance(srs, dict):
            srs = srs.get("epsg") or srs.get("wkt") or "custom"
        if isinstance(srs, str) and srs.lstrip().startswith("+proj="):
            srs = _srs_from_proj_string(srs)
        return GridDef(
            name=grid.get("grid", "custom"),
            left=float(left),
            bottom=float(bottom),
            right=float(right),
            top=float(top),
            base_rows=int(rows),
            base_cols=int(cols),
            srs=str(srs),
            is_global=bool(grid.get("is_global", False)),
        )
    raise TypeError(f"cannot build grid from {grid!r}")


def _srs_from_proj_string(proj: str) -> str:
    """Resolve a proj4 string to an EPSG code where the engine has a
    closed-form transform — currently the UTM family, matching the
    reference's own custom-grid example
    (examples/custom_grid/custom_grid.mapchete: ``proj: +proj=utm
    +zone=32 +datum=WGS84 +units=m +no_defs``). Other proj strings are
    preserved verbatim as an opaque srs label (grid arithmetic never
    needs the CRS; only cross-CRS feature reprojection does, and
    get_transform will raise with a clear message for labels it cannot
    resolve)."""
    parts = dict(
        kv.split("=", 1) if "=" in kv else (kv, "")
        for kv in proj.replace("+", " ").split()
    )
    if parts.get("proj") == "utm" and "zone" in parts:
        zone = int(parts["zone"])
        south = "south" in parts
        return f"EPSG:{(32700 if south else 32600) + zone}"
    return proj
