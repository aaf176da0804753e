"""Numpy geometry primitives.

Replaces the reference's shapely usage (mapchete/geometry/*) with the
minimal set of exact algorithms the engine needs:

- ``point_in_ring`` / ``points_in_polygon``: crossing-number test,
  vectorized over many points (used for exact tile-intersects filters,
  point-in-polygon clipping, rasterize masks).
- ``clip_ring_to_rect``: Sutherland–Hodgman polygon clipping against an
  axis-aligned rectangle (used for tile-bbox intersection area in
  count_tiles and exact cover tests).
- ``ring_area``: shoelace formula.
- ``segmentize_ring``: densify edges at a max interval
  (mapchete/geometry/segmentize.py:17-65 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np

from mapchete_spark.tilegrid.grid import Bounds


def ring_area(ring: np.ndarray) -> float:
    """Unsigned shoelace area of a closed or open ring (N, 2)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized crossing-number point-in-polygon for many points against
    one ring. Points exactly on an edge may fall either side (consistent
    with float crossing-number tests)."""
    x0 = ring[:-1, 0][:, None]
    y0 = ring[:-1, 1][:, None]
    x1 = ring[1:, 0][:, None]
    y1 = ring[1:, 1][:, None]
    px = np.asarray(px, dtype=np.float64)[None, :]
    py = np.asarray(py, dtype=np.float64)[None, :]
    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xints = (x1 - x0) * (py - y0) / (y1 - y0) + x0
    crossings = cond & (px < xints)
    return (crossings.sum(axis=0) % 2).astype(bool)


def clip_ring_to_rect(
    ring: np.ndarray, left: float, bottom: float, right: float, top: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of a polygon ring against a rectangle.

    Returns the clipped ring (M, 2); empty array if no overlap. The ring
    need not be closed; output is not explicitly closed.
    """
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.allclose(pts[0], pts[-1]):
        pts = pts[:-1]

    def clip_edge(poly, inside_fn, intersect_fn):
        if len(poly) == 0:
            return poly
        out = []
        prev = poly[-1]
        prev_in = inside_fn(prev)
        for cur in poly:
            cur_in = inside_fn(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect_fn(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect_fn(prev, cur))
            prev, prev_in = cur, cur_in
        return np.array(out) if out else np.empty((0, 2))

    def x_intersect(bound):
        def f(p, q):
            t = (bound - p[0]) / (q[0] - p[0])
            return np.array([bound, p[1] + t * (q[1] - p[1])])

        return f

    def y_intersect(bound):
        def f(p, q):
            t = (bound - p[1]) / (q[1] - p[1])
            return np.array([p[0] + t * (q[0] - p[0]), bound])

        return f

    pts = clip_edge(pts, lambda p: p[0] >= left, x_intersect(left))
    pts = clip_edge(pts, lambda p: p[0] <= right, x_intersect(right))
    pts = clip_edge(pts, lambda p: p[1] >= bottom, y_intersect(bottom))
    pts = clip_edge(pts, lambda p: p[1] <= top, y_intersect(top))
    return pts


def segmentize_ring(ring: np.ndarray, max_interval: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_interval (euclidean)."""
    pts = np.asarray(ring, dtype=np.float64)
    out = [pts[0]]
    for i in range(1, len(pts)):
        a, b = pts[i - 1], pts[i]
        d = float(np.hypot(*(b - a)))
        n = max(int(np.ceil(d / max_interval)), 1)
        for k in range(1, n + 1):
            out.append(a + (b - a) * (k / n))
    return np.array(out)


@dataclass(frozen=True)
class Point:
    x: float
    y: float

    @property
    def bounds(self) -> Bounds:
        return Bounds(self.x, self.y, self.x, self.y)

    geom_type = "Point"

    def is_empty(self) -> bool:
        return False


@dataclass(frozen=True)
class LineString:
    coords: np.ndarray  # (N, 2)

    geom_type = "LineString"

    @property
    def bounds(self) -> Bounds:
        c = self.coords
        return Bounds(
            float(c[:, 0].min()),
            float(c[:, 1].min()),
            float(c[:, 0].max()),
            float(c[:, 1].max()),
        )

    def is_empty(self) -> bool:
        return len(self.coords) == 0

    def intersects_rect(self, bounds: Bounds) -> bool:
        """Any segment portion inside the rect (Liang–Barsky)."""
        c = self.coords
        if len(c) < 2:
            return False
        t0, t1, _ = segment_clip_params(
            c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1],
            bounds.left, bounds.bottom, bounds.right, bounds.top,
        )
        return bool((t0 <= t1).any())

    def __eq__(self, other):
        return isinstance(other, LineString) and np.array_equal(
            self.coords, other.coords
        )


def _seg_intersection(p1, p2, p3, p4):
    """Proper intersection point of open segments p1p2 and p3p4, or
    None (touching at endpoints does not count)."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = p3
    x4, y4 = p4
    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if d == 0:
        return None
    t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
    u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / d
    eps = 1e-12
    if eps < t < 1 - eps and eps < u < 1 - eps:
        return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))
    return None


def untangle_ring(ring: np.ndarray) -> List[np.ndarray]:
    """Resolve ring self-intersections into simple loops — the GEOS
    buffer(0) repair analog (mapchete/geometry/repair.py:7-21): insert
    vertices at every proper segment crossing, then walk the ring and
    cut out a loop whenever a point repeats (a bow-tie becomes two
    triangles). Returns the simple sub-rings with positive area;
    already-simple rings come back unchanged (length-1 list)."""
    r = np.asarray(ring, dtype=np.float64)
    if not np.allclose(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    n = len(r) - 1
    # collect crossings per segment (parametric position -> point);
    # crossings AT shared vertices (figure-8s) need no insertion — the
    # revisit walk below catches them
    inserts: dict = {i: [] for i in range(n)}
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or abs(i - j) == 1 or (i == 0 and j == n - 1):
                continue
            pt = _seg_intersection(r[i], r[i + 1], r[j], r[j + 1])
            if pt is not None:
                for k, (a, b) in ((i, (r[i], r[i + 1])), (j, (r[j], r[j + 1]))):
                    dx, dy = b[0] - a[0], b[1] - a[1]
                    t = ((pt[0] - a[0]) * dx + (pt[1] - a[1]) * dy) / (
                        dx * dx + dy * dy
                    )
                    inserts[k].append((t, pt))
    path = []
    for i in range(n):
        path.append(tuple(r[i]))
        for _, pt in sorted(inserts[i]):
            path.append((round(pt[0], 12), round(pt[1], 12)))
    path.append(tuple(r[0]))
    # walk, cutting loops at repeated points
    loops: List[np.ndarray] = []
    stack: list = []
    seen: dict = {}
    for pt in path:
        key = (round(pt[0], 9), round(pt[1], 9))
        if key in seen:
            start = seen[key]
            loop = stack[start:] + [pt]
            if len(loop) >= 4 and ring_area(np.asarray(loop)) > 0:
                loops.append(np.asarray(loop, dtype=np.float64))
            # unwind
            for q in stack[start + 1 :]:
                seen.pop((round(q[0], 9), round(q[1], 9)), None)
            stack = stack[: start + 1]
        else:
            seen[key] = len(stack)
            stack.append(pt)
    if len(stack) >= 3:
        loop = stack + [stack[0]]
        if ring_area(np.asarray(loop)) > 0:
            loops.append(np.asarray(loop, dtype=np.float64))
    return loops


_LB_INF = 1e308  # finite sentinel so the SQL twin can mirror exactly


def segment_clip_params(x1, y1, x2, y2, left, bottom, right, top):
    """Liang–Barsky parametric clip of segments against a rectangle,
    vectorized. Returns (t0, t1, seglen): the segment portion inside is
    p(t) for t in [t0, t1] (empty iff t0 > t1), seglen the full segment
    length. Operation order is mirrored verbatim by the SQL twin in
    __spark_entry__.o_line_clip, so (t1 - t0) * seglen is bit-identical
    across engines."""
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    dx = x2 - x1
    dy = y2 - y1
    with np.errstate(divide="ignore", invalid="ignore"):
        txa = (left - x1) / dx
        txb = (right - x1) / dx
        tya = (bottom - y1) / dy
        tyb = (top - y1) / dy
    x_in = (x1 >= left) & (x1 <= right)
    y_in = (y1 >= bottom) & (y1 <= top)
    tx_min = np.where(dx == 0, np.where(x_in, -_LB_INF, _LB_INF), np.minimum(txa, txb))
    tx_max = np.where(dx == 0, np.where(x_in, _LB_INF, -_LB_INF), np.maximum(txa, txb))
    ty_min = np.where(dy == 0, np.where(y_in, -_LB_INF, _LB_INF), np.minimum(tya, tyb))
    ty_max = np.where(dy == 0, np.where(y_in, _LB_INF, -_LB_INF), np.maximum(tya, tyb))
    t0 = np.maximum(np.maximum(0.0, tx_min), ty_min)
    t1 = np.minimum(np.minimum(1.0, tx_max), ty_max)
    seglen = np.sqrt(dx * dx + dy * dy)
    return t0, t1, seglen


def clip_line_to_rect(coords: np.ndarray, left, bottom, right, top):
    """Clip a polyline to a rectangle: list of polyline pieces (each an
    (N, 2) array). Consecutive segments whose clipped portions join at
    the shared vertex are stitched into one piece."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return []
    t0, t1, _ = segment_clip_params(
        c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1], left, bottom, right, top
    )
    pieces = []
    cur: list = []
    for i in range(len(c) - 1):
        if t0[i] > t1[i]:
            if len(cur) >= 2:
                pieces.append(np.array(cur))
            cur = []
            continue
        dx = c[i + 1, 0] - c[i, 0]
        dy = c[i + 1, 1] - c[i, 1]
        p0 = (c[i, 0] + t0[i] * dx, c[i, 1] + t0[i] * dy)
        p1 = (c[i, 0] + t1[i] * dx, c[i, 1] + t1[i] * dy)
        starts_fresh = not cur or t0[i] > 0.0 or tuple(cur[-1]) != p0
        if starts_fresh:
            if len(cur) >= 2:
                pieces.append(np.array(cur))
            cur = [p0, p1]
        else:
            cur.append(p1)
        if t1[i] < 1.0:
            if len(cur) >= 2:
                pieces.append(np.array(cur))
            cur = []
    if len(cur) >= 2:
        pieces.append(np.array(cur))
    return pieces


@dataclass(frozen=True)
class MultiLineString:
    lines: Tuple["LineString", ...]

    geom_type = "MultiLineString"

    @property
    def bounds(self) -> Bounds:
        bs = [ln.bounds for ln in self.lines]
        return Bounds(
            min(b.left for b in bs),
            min(b.bottom for b in bs),
            max(b.right for b in bs),
            max(b.top for b in bs),
        )

    def is_empty(self) -> bool:
        return not self.lines

    def intersects_rect(self, bounds: Bounds) -> bool:
        return any(ln.intersects_rect(bounds) for ln in self.lines)

    def __eq__(self, other):
        return (
            isinstance(other, MultiLineString)
            and len(self.lines) == len(other.lines)
            and all(a == b for a, b in zip(self.lines, other.lines))
        )


@dataclass(frozen=True)
class Polygon:
    """Polygon with exterior ring and optional interior rings (holes)."""

    exterior: np.ndarray  # (N, 2), open or closed
    interiors: Tuple[np.ndarray, ...] = field(default_factory=tuple)

    geom_type = "Polygon"

    @staticmethod
    def from_bounds(bounds: Bounds) -> "Polygon":
        l, b, r, t = bounds
        return Polygon(
            np.array([[l, b], [r, b], [r, t], [l, t], [l, b]], dtype=np.float64)
        )

    @staticmethod
    def regular(cx: float, cy: float, radius: float, n: int = 8, phase: float = 0.0):
        """Deterministic n-gon 'buffer' of a point — the engine's stand-in
        for shapely buffer() in synthetic fixtures."""
        ang = phase + np.linspace(0.0, 2 * np.pi, n, endpoint=False)
        ring = np.column_stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)])
        return Polygon(np.vstack([ring, ring[:1]]))

    @property
    def bounds(self) -> Bounds:
        e = self.exterior
        return Bounds(
            float(e[:, 0].min()),
            float(e[:, 1].min()),
            float(e[:, 0].max()),
            float(e[:, 1].max()),
        )

    @property
    def area(self) -> float:
        a = ring_area(self.exterior)
        for hole in self.interiors:
            a -= ring_area(hole)
        return a

    def is_empty(self) -> bool:
        return len(self.exterior) < 3

    def intersection_area(self, bounds: Bounds) -> float:
        """Exact area of (polygon ∩ rectangle)."""
        clipped = clip_ring_to_rect(self.exterior, *bounds)
        if len(clipped) < 3:
            return 0.0
        a = ring_area(clipped)
        for hole in self.interiors:
            hc = clip_ring_to_rect(hole, *bounds)
            if len(hc) >= 3:
                a -= ring_area(hc)
        return max(a, 0.0)

    def intersects_rect(self, bounds: Bounds) -> bool:
        """True geometry-vs-rect test (not just bbox): positive clip area,
        or polygon contains the rect, or rect contains a vertex."""
        if not self.bounds.intersects(bounds):
            return False
        if self.intersection_area(bounds) > 0.0:
            return True
        # degenerate: rect fully inside a hole-free sliver etc.
        cx = (bounds.left + bounds.right) / 2.0
        cy = (bounds.bottom + bounds.top) / 2.0
        return bool(self.contains_points(np.array([cx]), np.array([cy]))[0])

    def contains_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        ext = self.exterior
        if not np.allclose(ext[0], ext[-1]):
            ext = np.vstack([ext, ext[:1]])
        inside = point_in_ring(px, py, ext)
        for hole in self.interiors:
            h = hole
            if not np.allclose(h[0], h[-1]):
                h = np.vstack([h, h[:1]])
            inside &= ~point_in_ring(px, py, h)
        return inside

    def __eq__(self, other):
        return (
            isinstance(other, Polygon)
            and np.array_equal(self.exterior, other.exterior)
            and len(self.interiors) == len(other.interiors)
            and all(
                np.array_equal(a, b) for a, b in zip(self.interiors, other.interiors)
            )
        )


@dataclass(frozen=True)
class MultiPolygon:
    polygons: Tuple[Polygon, ...]

    geom_type = "MultiPolygon"

    @property
    def bounds(self) -> Bounds:
        bs = [p.bounds for p in self.polygons]
        out = bs[0]
        for b in bs[1:]:
            out = out + b
        return out

    @property
    def area(self) -> float:
        return sum(p.area for p in self.polygons)

    def is_empty(self) -> bool:
        return all(p.is_empty() for p in self.polygons)

    def intersection_area(self, bounds: Bounds) -> float:
        return sum(p.intersection_area(bounds) for p in self.polygons)

    def intersects_rect(self, bounds: Bounds) -> bool:
        return any(p.intersects_rect(bounds) for p in self.polygons)

    def contains_points(self, px, py) -> np.ndarray:
        out = np.zeros(len(np.atleast_1d(px)), dtype=bool)
        for p in self.polygons:
            out |= p.contains_points(px, py)
        return out

    def __eq__(self, other):
        return (
            isinstance(other, MultiPolygon)
            and len(self.polygons) == len(other.polygons)
            and all(a == b for a, b in zip(self.polygons, other.polygons))
        )


def geometry_bounds(geom) -> Bounds:
    return geom.bounds


def filter_by_geometry_type(geoms: Sequence, geom_type: str) -> List:
    """Single/multi-equivalent type filter
    (mapchete/geometry/filter.py:18-121 semantics)."""
    singles = {"Polygon": ("Polygon", "MultiPolygon")}
    accepted = singles.get(geom_type, (geom_type,))
    if geom_type.startswith("Multi"):
        accepted = (geom_type, geom_type[5:])
    return [g for g in geoms if g.geom_type in accepted]


def multipart_to_singleparts(geom) -> List:
    if isinstance(geom, MultiPolygon):
        return list(geom.polygons)
    return [geom]
