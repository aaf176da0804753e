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
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((cx - ax) * dy2 - (cy - ay) * dx2) / den
        u = ((cx - ax) * dy1 - (cy - ay) * dx1) / den
        ok = (den != 0) & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
        xint = ax + t * dx1
    return xint[ok]


def _feature_intervals(fid, x0, y0, x1, y1, xm: float):
    """Per-feature inside y-intervals at x = xm by even-odd parity.

    Returns (lo, hi) arrays over all features. Mirrored in SQL:
        yv = y0 + (xm - x0) * ((y1 - y0) / (x1 - x0))
    sorted per feature, consecutive pairs form intervals."""
    lo_x = np.minimum(x0, x1)
    hi_x = np.maximum(x0, x1)
    m = (lo_x < xm) & (xm < hi_x)
    if not m.any():
        return np.zeros(0), np.zeros(0)
    f = fid[m]
    yv = y0[m] + (xm - x0[m]) * ((y1[m] - y0[m]) / (x1[m] - x0[m]))
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
    edge's start), proper pairwise intersections, box left/right."""
    cuts = [x0, x1, _pairwise_intersection_xs(x0, y0, x1, y1)]
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

    Returns (exact area, trapezoid-cover rings of the region)."""
    from mapchete_spark.geometry.core import untangle_ring

    feats = [[lp] for lp in untangle_ring(np.asarray(exterior, dtype=np.float64))]
    hole_feats = []
    for h in interiors:
        hole_feats.extend(
            [lp] for lp in untangle_ring(np.asarray(h, dtype=np.float64))
        )
    return (
        union_area(feats, holes=hole_feats),
        union_trapezoids(feats, holes=hole_feats),
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
