"""Exact polygon overlay (union / difference) for ARBITRARY simple
polygons — the GEOS-free dissolve that closes V3/V7.

The reference dissolves through shapely's ``unary_union``
(mapchete/io/vector/indexed_features.py:190-217) and repairs invalid
polygons with ``buffer(0)`` (mapchete/geometry/repair.py:7-21). This
module re-derives both measures with a vertical slab decomposition
instead of a GEOS overlay graph:

1. cut the x-axis at every edge endpoint and every pairwise proper
   edge intersection (plus the clip box's left/right) — between two
   consecutive cuts NO boundaries cross, so the covered-region measure
   is LINEAR in x across the slab;
2. at each slab midpoint, compute the inside y-intervals per feature
   by even-odd crossing parity, clamp to the clip box, union the
   intervals across features (sort + sweep);
3. the slab's exact contribution is covered_length(midpoint) * width
   (linearity makes the midpoint value the exact average).

Every arithmetic step is plain +-*/ and sqrt-free, so a DuckDB SQL
twin can mirror it operation-for-operation for the contract oracle
(same breakpoints, same midpoints, same interval sweep). Difference
(for overlapping-ring repair) subtracts the hole-union intervals from
the shell-union intervals inside step 3. ``union_trapezoids`` returns
the region itself as one trapezoid per (slab, island) — a valid
non-overlapping MultiPolygon cover usable by the mask/clip path.

Complexity is O(E^2) in the number of edges per call; the engine only
ever calls this per tile group inside applyInPandas, where E is small
— at 100 TB the quadratic term stays bounded by tile granularity, not
corpus size. As a guard against pathological tiles, calls exceeding
``MAX_OVERLAY_EDGES`` raise instead of silently burning quadratic work
(callers should subdivide the tile or use the linear-cost rasterized
measure, operators/vector.tile_union_mask_area).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from mapchete_spark.tilegrid.grid import Bounds

Feature = Sequence[np.ndarray]  # one polygon = list of rings (Nx2)

# edge-count guard: beyond this the O(E^2) intersection pass would burn
# quadratic work silently — fail loudly so callers subdivide or switch
# to the linear rasterized union measure
MAX_OVERLAY_EDGES = 20_000


def _edges_of(features: Sequence[Feature]):
    """Flatten features into parallel edge arrays (fid, x0, y0, x1, y1).

    Rings are closed implicitly; zero-length edges are dropped.
    Even-odd parity within a feature makes interior rings behave as
    holes automatically."""
    fid, x0, y0, x1, y1 = [], [], [], [], []
    for fi, rings in enumerate(features):
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 3:
                continue
            if r[0][0] != r[-1][0] or r[0][1] != r[-1][1]:
                r = np.vstack([r, r[:1]])
            a, b = r[:-1], r[1:]
            keep = (a[:, 0] != b[:, 0]) | (a[:, 1] != b[:, 1])
            a, b = a[keep], b[keep]
            fid.append(np.full(len(a), fi, dtype=np.int64))
            x0.append(a[:, 0])
            y0.append(a[:, 1])
            x1.append(b[:, 0])
            y1.append(b[:, 1])
    if not fid:
        z = np.zeros(0)
        return np.zeros(0, dtype=np.int64), z, z, z, z
    return (
        np.concatenate(fid),
        np.concatenate(x0),
        np.concatenate(y0),
        np.concatenate(x1),
        np.concatenate(y1),
    )


def _pairwise_intersection_xs(x0, y0, x1, y1) -> np.ndarray:
    """x coordinates of all PROPER pairwise segment intersections
    (0 < t < 1 and 0 < u < 1 strictly; endpoint touches are already
    breakpoints). Raises beyond MAX_OVERLAY_EDGES. Mirrored in SQL:
        den = dx1*dy2 - dy1*dx2
        t = ((cx-ax)*dy2 - (cy-ay)*dx2) / den
        u = ((cx-ax)*dy1 - (cy-ay)*dx1) / den
        xint = ax + t*dx1
    """
    n = len(x0)
    if n > MAX_OVERLAY_EDGES:
        raise ValueError(
            f"overlay input has {n} edges (> {MAX_OVERLAY_EDGES}): the "
            "O(E^2) exact union would be quadratic here — subdivide the "
            "tile or use the rasterized union measure "
            "(operators/vector.tile_union_mask_area)"
        )
    if n < 2:
        return np.zeros(0)
    i, j = np.triu_indices(n, k=1)
    ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
    cx, cy, dx, dy = x0[j], y0[j], x1[j], y1[j]
    dx1, dy1 = bx - ax, by - ay
    dx2, dy2 = dx - cx, dy - cy
    den = dx1 * dy2 - dy1 * dx2
    # over= too: near-parallel segments make den denormal and t/u
    # overflow before the den != 0 mask drops them (property-test
    # finding; values are masked, the warning was noise)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        t = ((cx - ax) * dy2 - (cy - ay) * dx2) / den
        u = ((cx - ax) * dy1 - (cy - ay) * dx1) / den
        ok = (den != 0) & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
        xint = ax + t * dx1
    return xint[ok]


def _feature_intervals(fid, x0, y0, x1, y1, xm: float):
    """Per-feature inside y-intervals at x = xm by even-odd parity.

    Returns (lo, hi) arrays over all features. Mirrored in SQL:
        yv = y0 + ((xm - x0) / (x1 - x0)) * (y1 - y0)
    sorted per feature, consecutive pairs form intervals. The division
    comes FIRST: (xm - x0)/(x1 - x0) lies in (0, 1) whenever xm is
    strictly between the endpoints, so near-vertical edges (subnormal
    dx from e.g. a ~1e-311 rotation angle) cannot overflow the slope
    to inf — the slope-first order returned inf areas on such input
    (hypothesis-found)."""
    lo_x = np.minimum(x0, x1)
    hi_x = np.maximum(x0, x1)
    m = (lo_x < xm) & (xm < hi_x)
    if not m.any():
        return np.zeros(0), np.zeros(0)
    f = fid[m]
    yv = y0[m] + ((xm - x0[m]) / (x1[m] - x0[m])) * (y1[m] - y0[m])
    order = np.lexsort((yv, f))
    f, yv = f[order], yv[order]
    # consecutive pairs within each feature (parity is even per feature)
    lo, hi = [], []
    start = 0
    n = len(f)
    for k in range(1, n + 1):
        if k == n or f[k] != f[start]:
            ys = yv[start:k]
            # pair consecutive sorted crossings; an (ulp-degenerate) odd
            # count drops the unpaired last crossing — mirrors the SQL
            # twin's LEAD(yv) pairing where the last row's hi IS NULL
            pairs = len(ys) // 2
            lo.append(ys[0 : 2 * pairs : 2])
            hi.append(ys[1 : 2 * pairs : 2])
            start = k
    return np.concatenate(lo), np.concatenate(hi)


def _union_intervals(lo: np.ndarray, hi: np.ndarray):
    """Merge intervals (sort by (lo, hi), sweep). Returns merged
    (lo, hi) arrays."""
    if len(lo) == 0:
        return lo, hi
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    out_lo, out_hi = [lo[0]], [hi[0]]
    for a, b in zip(lo[1:], hi[1:]):
        if a > out_hi[-1]:
            out_lo.append(a)
            out_hi.append(b)
        elif b > out_hi[-1]:
            out_hi[-1] = b
    return np.asarray(out_lo), np.asarray(out_hi)


def _subtract_intervals(plo, phi, nlo, nhi):
    """Set difference (plo,phi) \\ (nlo,nhi); both inputs merged and
    sorted. Returns (lo, hi) arrays."""
    out_lo, out_hi = [], []
    for a, b in zip(plo, phi):
        cur = a
        for c, d in zip(nlo, nhi):
            if d <= cur or c >= b:
                continue
            if c > cur:
                out_lo.append(cur)
                out_hi.append(c)
            cur = max(cur, d)
            if cur >= b:
                break
        if cur < b:
            out_lo.append(cur)
            out_hi.append(b)
    return np.asarray(out_lo), np.asarray(out_hi)


def _slab_cuts(x0, y0, x1, y1, box: Optional[Bounds]) -> np.ndarray:
    """Sorted unique x cuts: edge starts (every ring vertex is some
    edge's start), proper pairwise intersections, box left/right, and
    — when clipping — every edge's crossing with the box's HORIZONTAL
    boundaries (y = bottom / top). Without those last cuts the clamped
    interval GREATEST(lo, bottom)/LEAST(hi, top) kinks inside a slab
    and the midpoint measure stops being the exact average (mirrored
    in functions/overlaysql's ``bpy`` CTE)."""
    cuts = [x0, x1, _pairwise_intersection_xs(x0, y0, x1, y1)]
    if box is not None:
        for yb in (box.bottom, box.top):
            m = (np.minimum(y0, y1) < yb) & (yb < np.maximum(y0, y1))
            if m.any():
                # division first: (yb - y0)/(y1 - y0) in (0, 1), no
                # slope overflow on near-horizontal edges
                cuts.append(
                    x0[m] + ((yb - y0[m]) / (y1[m] - y0[m])) * (x1[m] - x0[m])
                )
    cuts = np.concatenate(cuts) if cuts else np.zeros(0)
    if box is not None:
        cuts = cuts[(cuts > box.left) & (cuts < box.right)]
        cuts = np.concatenate([cuts, [box.left, box.right]])
    return np.unique(cuts)


def union_area(
    features: Sequence[Feature],
    box: Optional[Bounds] = None,
    holes: Sequence[Feature] = (),
) -> float:
    """Exact area of (union of ``features``) minus (union of ``holes``),
    optionally restricted to axis-aligned ``box``. Arbitrary simple
    polygons (any rotation); interior rings inside one feature are
    honored by even-odd parity."""
    total = 0.0
    for (x0c, x1c), covered in _slab_coverage(features, box, holes):
        total += covered * (x1c - x0c)
    return total


def union_trapezoids(
    features: Sequence[Feature],
    box: Optional[Bounds] = None,
    holes: Sequence[Feature] = (),
) -> List[np.ndarray]:
    """The region itself as non-overlapping trapezoid rings (one per
    slab island): a valid MultiPolygon cover for mask/clip consumers.
    Boundaries are linear inside a slab, so each island's lo/hi at the
    slab edges are recovered by linear evaluation of the island's
    bounding values at the midpoint (constant structure per slab)."""
    out: List[np.ndarray] = []
    for (xa, xb), intervals in _slab_intervals(features, box, holes):
        for lo_a, hi_a, lo_b, hi_b in intervals:
            ring = np.array(
                [
                    [xa, lo_a],
                    [xb, lo_b],
                    [xb, hi_b],
                    [xa, hi_a],
                    [xa, lo_a],
                ]
            )
            out.append(ring)
    return out


def repair_polygon(
    exterior: np.ndarray, interiors: Sequence[np.ndarray] = ()
) -> Tuple[float, List[np.ndarray]]:
    """V7 buffer(0) analog covering overlapping-ring invalidity: the
    exterior (possibly self-intersecting) is untangled into simple
    loops, each interior ring likewise, and the repaired region is
    (union of exterior loops) minus (union of hole loops) — holes may
    overlap each other or leak outside the exterior without
    double-subtracting (reference mapchete/geometry/repair.py:7-21
    delegates all of this to GEOS buffer(0)).

    Returns (exact area, DISSOLVED boundary rings of the region —
    CCW shells / CW holes from :func:`union_rings`, the GEOS-style
    merged output; use :func:`union_polygons` semantics to attach
    holes to shells)."""
    from mapchete_spark.geometry.core import untangle_ring

    feats = [[lp] for lp in untangle_ring(np.asarray(exterior, dtype=np.float64))]
    hole_feats = []
    for h in interiors:
        hole_feats.extend(
            [lp] for lp in untangle_ring(np.asarray(h, dtype=np.float64))
        )
    return (
        union_area(feats, holes=hole_feats),
        union_rings(feats, holes=hole_feats),
    )


def _slab_coverage(features, box, holes):
    """Yield ((x0, x1), covered_length_at_midpoint) per slab."""
    fid, ex0, ey0, ex1, ey1 = _edges_of(features)
    hfid, hx0, hy0, hx1, hy1 = _edges_of(holes)
    ax0 = np.concatenate([ex0, hx0])
    ay0 = np.concatenate([ey0, hy0])
    ax1 = np.concatenate([ex1, hx1])
    ay1 = np.concatenate([ey1, hy1])
    cuts = _slab_cuts(ax0, ay0, ax1, ay1, box)
    for xa, xb in zip(cuts[:-1], cuts[1:]):
        if xb <= xa:
            continue
        xm = xa + (xb - xa) / 2.0
        lo, hi = _clamped_union(fid, ex0, ey0, ex1, ey1, xm, box)
        if len(lo) == 0:
            continue
        if len(hfid):
            nlo, nhi = _clamped_union(hfid, hx0, hy0, hx1, hy1, xm, box)
            lo, hi = _subtract_intervals(lo, hi, nlo, nhi)
            if len(lo) == 0:
                continue
        yield (xa, xb), float(np.sum(hi - lo))


def _clamped_union(fid, x0, y0, x1, y1, xm, box):
    lo, hi = _feature_intervals(fid, x0, y0, x1, y1, xm)
    if box is not None and len(lo):
        lo = np.maximum(lo, box.bottom)
        hi = np.minimum(hi, box.top)
        keep = hi > lo
        lo, hi = lo[keep], hi[keep]
    if len(lo) == 0:
        return lo, hi
    return _union_intervals(lo, hi)


def _slab_intervals(features, box, holes):
    """Yield ((xa, xb), [(lo_a, hi_a, lo_b, hi_b), ...]) per slab — the
    island intervals evaluated at BOTH slab edges (for trapezoids).
    Structure is constant inside a slab, so islands at xa/xb are read
    off at offsets epsilon-free by re-evaluating the interval sweep at
    points xa + w/4 and xa + 3w/4 and extrapolating linearly."""
    fid, ex0, ey0, ex1, ey1 = _edges_of(features)
    hfid, hx0, hy0, hx1, hy1 = _edges_of(holes)
    ax0 = np.concatenate([ex0, hx0])
    ay0 = np.concatenate([ey0, hy0])
    ax1 = np.concatenate([ex1, hx1])
    ay1 = np.concatenate([ey1, hy1])
    cuts = _slab_cuts(ax0, ay0, ax1, ay1, box)

    def isl(xq):
        lo, hi = _clamped_union(fid, ex0, ey0, ex1, ey1, xq, box)
        if len(hfid) and len(lo):
            nlo, nhi = _clamped_union(hfid, hx0, hy0, hx1, hy1, xq, box)
            lo, hi = _subtract_intervals(lo, hi, nlo, nhi)
        return lo, hi

    for xa, xb in zip(cuts[:-1], cuts[1:]):
        if xb <= xa:
            continue
        w = xb - xa
        q1, q3 = xa + w / 4.0, xa + 3.0 * w / 4.0
        lo1, hi1 = isl(q1)
        lo3, hi3 = isl(q3)
        if len(lo1) == 0 or len(lo1) != len(lo3):
            # structure degenerate at quarter points (vanishing island):
            # fall back to the midpoint islands as a flat trapezoid
            lom, him = isl(xa + w / 2.0)
            yield (xa, xb), [(l, h, l, h) for l, h in zip(lom, him)]
            continue
        rows = []
        for a1, b1, a3, b3 in zip(lo1, hi1, lo3, hi3):
            # linear extrapolation from quarter points to slab edges
            lo_a = a1 - (a3 - a1) / 2.0
            lo_b = a3 + (a3 - a1) / 2.0
            hi_a = b1 - (b3 - b1) / 2.0
            hi_b = b3 + (b3 - b1) / 2.0
            rows.append((lo_a, hi_a, lo_b, hi_b))
        yield (xa, xb), rows


# ---------------------------------------------------------------------------
# Dissolve: trapezoid cover -> minimal merged rings (GEOS-style output)
# ---------------------------------------------------------------------------


def _cluster_snap(values: np.ndarray, tol: float) -> dict:
    """Map each float in ``values`` to a cluster representative (the
    cluster's first value in sorted order); values within ``tol`` of
    their sorted neighbor share a representative."""
    if len(values) == 0:
        return {}
    vs = np.unique(values)
    rep = {}
    cur = vs[0]
    for v in vs:
        if v - cur > tol:
            cur = v
        rep[v] = cur
    return rep


def union_rings(
    features: Sequence[Feature],
    box: Optional[Bounds] = None,
    holes: Sequence[Feature] = (),
) -> List[np.ndarray]:
    """Dissolve the union region into MERGED boundary rings — the
    GEOS-style ``unary_union`` output shape (reference
    mapchete/io/vector/indexed_features.py:190-217) that
    ``union_trapezoids``'s per-slab cover is not: seam edges between
    adjacent slabs are cancelled and collinear runs are merged, so a
    union of two touching squares comes back as ONE 4-corner ring.

    Returns closed rings (first point == last point): CCW rings are
    exterior shells, CW rings are holes of the region (classify with
    :func:`ring_signed_area` / :func:`union_polygons`). The signed
    shoelace areas of all rings sum to exactly :func:`union_area` of
    the same inputs (the dissolve is a reshaping of the same exact
    slab decomposition, not a new approximation).

    Algorithm: each slab trapezoid contributes its two slanted edges
    (bottom rightward, top leftward — CCW). At every slab cut the
    vertical sides of the left and right slabs overlap where the
    region is continuous; a signed interval sweep (+1 for the left
    slab's up-going right side, -1 for the right slab's down-going
    left side) cancels the shared portions and emits only net-boundary
    vertical segments. Directed edges then chain start->end into
    closed rings. Endpoint y-values are snap-clustered per cut (the
    quarter-point extrapolation in ``_slab_intervals`` reconstructs
    the same exact value from both sides up to float ulps)."""
    slabs = [
        (xa, xb, rows)
        for (xa, xb), rows in _slab_intervals(features, box, holes)
        if rows
    ]
    if not slabs:
        return []
    scale = max(
        1.0,
        max(
            max(abs(xa), abs(xb), *(abs(v) for r in rows for v in r))
            for xa, xb, rows in slabs
        ),
    )
    tol = 1e-9 * scale

    # per-cut snap clustering of every y value that lands on that cut
    cut_ys: dict = {}
    for xa, xb, rows in slabs:
        for lo_a, hi_a, lo_b, hi_b in rows:
            cut_ys.setdefault(xa, []).append(lo_a)
            cut_ys.setdefault(xa, []).append(hi_a)
            cut_ys.setdefault(xb, []).append(lo_b)
            cut_ys.setdefault(xb, []).append(hi_b)
    snap = {x: _cluster_snap(np.asarray(ys), tol) for x, ys in cut_ys.items()}

    edges: List[Tuple[Tuple[float, float], Tuple[float, float]]] = []
    # signed vertical events per cut: (y_lo, y_hi, sign)
    events: dict = {}
    for xa, xb, rows in slabs:
        sa, sb = snap[xa], snap[xb]
        for lo_a, hi_a, lo_b, hi_b in rows:
            la, ha = sa[lo_a], sa[hi_a]
            lb, hb = sb[lo_b], sb[hi_b]
            if ha <= la and hb <= lb:
                continue  # fully degenerate sliver
            # slanted CCW edges (skip zero-length)
            if (xa, la) != (xb, lb):
                edges.append(((xa, la), (xb, lb)))  # bottom, rightward
            if (xb, hb) != (xa, ha):
                edges.append(((xb, hb), (xa, ha)))  # top, leftward
            # vertical sides as signed sweep events
            if hb > lb:
                events.setdefault(xb, []).append((lb, hb, +1))  # right side up
            if ha > la:
                events.setdefault(xa, []).append((la, ha, -1))  # left side down

    for x, evs in events.items():
        bps = sorted({y for lo, hi, _ in evs for y in (lo, hi)})
        deltas = {y: 0 for y in bps}
        for lo, hi, s in evs:
            deltas[lo] += s
            deltas[hi] -= s
        c = 0
        for y0, y1 in zip(bps[:-1], bps[1:]):
            c += deltas[y0]
            if c > 0:
                edges.append(((x, y0), (x, y1)))  # net boundary going up
            elif c < 0:
                edges.append(((x, y1), (x, y0)))  # net boundary going down

    # chain directed edges into closed rings
    out_by_start: dict = {}
    for a, b in edges:
        out_by_start.setdefault(a, []).append(b)
    rings: List[np.ndarray] = []
    while out_by_start:
        start = next(iter(out_by_start))
        pts = [start]
        cur = start
        while True:
            nxts = out_by_start.get(cur)
            if not nxts:
                # open chain (numeric pathology): drop it rather than
                # emit an unclosed ring
                pts = None
                break
            nxt = nxts.pop()
            if not nxts:
                del out_by_start[cur]
            pts.append(nxt)
            cur = nxt
            if cur == start:
                break
        if pts is None or len(pts) < 4:
            continue
        rings.append(_drop_collinear(np.asarray(pts, dtype=np.float64), tol))
    return [r for r in rings if len(r) >= 4]


def _drop_collinear(ring: np.ndarray, tol: float) -> np.ndarray:
    """Remove interior vertices where consecutive edges are collinear
    and co-directed (cross ~ 0, dot > 0); ring closed on input and
    output."""
    pts = ring[:-1]
    n = len(pts)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        p = pts[(i - 1) % n]
        q = pts[i]
        r = pts[(i + 1) % n]
        ux, uy = q[0] - p[0], q[1] - p[1]
        vx, vy = r[0] - q[0], r[1] - q[1]
        cross = ux * vy - uy * vx
        dot = ux * vx + uy * vy
        if abs(cross) <= tol * max(1.0, abs(dot)) and dot > 0.0:
            keep[i] = False
    kept = pts[keep]
    if len(kept) < 3:
        return np.zeros((0, 2))
    return np.vstack([kept, kept[:1]])


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area of a closed ring (CCW positive)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    xn, yn = ring[1:, 0], ring[1:, 1]
    return float(np.sum(x * yn - xn * y) / 2.0)


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    m = (y0 <= py) != (y1 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.sum(xi[m] > px) % 2)


def union_polygons(
    features: Sequence[Feature],
    box: Optional[Bounds] = None,
    holes: Sequence[Feature] = (),
) -> List[Tuple[np.ndarray, List[np.ndarray]]]:
    """Dissolved union as (shell, [holes...]) polygons — the full
    MultiPolygon shape of a GEOS ``unary_union``. Each CW ring from
    :func:`union_rings` is attached to the smallest CCW shell that
    contains its first vertex."""
    rings = union_rings(features, box, holes)
    shells = [(r, ring_signed_area(r)) for r in rings]
    exts = sorted(
        [(r, a) for r, a in shells if a > 0], key=lambda t: t[1]
    )
    result = [(r, []) for r, _ in exts]
    for r, a in shells:
        if a > 0:
            continue
        px, py = r[0]
        for k, (shell, _) in enumerate(exts):
            if _point_in_ring(px, py, shell):
                result[k][1].append(r)
                break
    return result


def union_multipolygon(
    features: Sequence[Feature],
    box: Optional[Bounds] = None,
    holes: Sequence[Feature] = (),
):
    """Dissolved union as a core.MultiPolygon (shells CCW, holes CW) —
    the drop-in twin of the reference's shapely ``unary_union`` return
    value (mapchete/io/vector/indexed_features.py:190-217)."""
    from mapchete_spark.geometry.core import MultiPolygon, Polygon

    return MultiPolygon(
        tuple(
            Polygon(shell, tuple(hs))
            for shell, hs in union_polygons(features, box, holes)
        )
    )
