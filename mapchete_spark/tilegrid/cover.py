"""Tile cover enumeration, counting, and AOI snapping.

Re-implements the scan-planner operators G1-G8 of SURVEY.md §2.1:

- ``tiles_from_geom``: tiles intersecting a geometry, with
  ``exact=True`` running a true geometry test, not just bbox
  (mapchete/tile.py:139-147; processing/base.py:113-125).
- ``count_tiles``: recursive quadtree count with the closed-form
  ``sum(4^z)`` shortcut for fully-covered subtrees
  (mapchete/tile.py:354-487, closed form :393-406).
- ``snap_geometry_to_tiles``: snap an AOI outward to tile boundaries
  (mapchete/tile.py:490-552) — numpy cell-grid edition.
- vectorized numpy cover for whole point/bbox arrays (the UDF-side fast
  path used by the Spark operators).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple, Union

import numpy as np

from mapchete_spark.geometry.core import MultiPolygon, Point, Polygon
from mapchete_spark.tilegrid.grid import Bounds
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid

Geometry = Union[Point, Polygon, MultiPolygon, Bounds]


def _geom_bounds(geom: Geometry) -> Bounds:
    if isinstance(geom, Bounds):
        return geom
    return geom.bounds


def _geom_intersects_rect(geom: Geometry, rect: Bounds) -> bool:
    if isinstance(geom, Bounds):
        return geom.intersects(rect)
    if isinstance(geom, Point):
        return (
            rect.left <= geom.x <= rect.right and rect.bottom <= geom.y <= rect.top
        )
    return geom.intersects_rect(rect)


def tiles_from_geom(
    pyramid: TilePyramid, geom: Geometry, zoom: int, exact: bool = True
) -> Iterator[Tile]:
    """Yield tiles intersecting geometry; bbox prefilter + optional exact
    geometry test, row-major order."""
    for tile in pyramid.tiles_from_bounds(_geom_bounds(geom), zoom):
        if not exact or _geom_intersects_rect(geom, tile.bounds(pixelbuffer=0)):
            yield tile


def tiles_from_geom_batches(
    pyramid: TilePyramid, geom: Geometry, zoom: int, batch_by: str = "row", exact=True
):
    """Yield row- (or column-) grouped batches (mapchete/tile.py:149-165)."""
    key = (lambda t: t.row) if batch_by == "row" else (lambda t: t.col)
    batch: List[Tile] = []
    current = None
    tiles = sorted(
        tiles_from_geom(pyramid, geom, zoom, exact=exact),
        key=(lambda t: (t.row, t.col)) if batch_by == "row" else (lambda t: (t.col, t.row)),
    )
    for t in tiles:
        k = key(t)
        if current is None or k == current:
            batch.append(t)
        else:
            yield batch
            batch = [t]
        current = k
    if batch:
        yield batch


def count_tiles(
    geom: Geometry, pyramid: TilePyramid, minzoom: int, maxzoom: int, init_zoom: int = 0
) -> int:
    """Count tiles intersecting geometry across zoom range without
    enumerating them — recursive quadtree with the 4^z closed form for
    fully covered subtrees (mapchete/tile.py:360-407 semantics: the
    intersection test is area-based, so tiles merely touched by the
    geometry boundary do not count)."""
    unbuffered = pyramid.without_pixelbuffer()

    if isinstance(geom, Bounds):
        geom = Polygon.from_bounds(geom)
    if isinstance(geom, Point):
        # a point has no area; the area-based test counts zero tiles,
        # matching the reference's intersection.area check
        return 0

    def _fully_covered(tb, tile_area: float, inter: float) -> bool:
        """The 4^z shortcut is only sound when the tile is genuinely
        covered. MultiPolygon.intersection_area SUMS part areas, so
        overlapping parts can reach tile_area without covering the
        tile (the reference's shapely intersection never double-counts
        — mapchete/tile.py:385-390); demand a single part covering."""
        if inter < tile_area:
            return False
        if isinstance(geom, MultiPolygon):
            return any(
                p.intersection_area(tb) >= tile_area for p in geom.polygons
            )
        return True

    def rec(tile: Tile, parent_area: float) -> int:
        tb = tile.bounds(pixelbuffer=0)
        inter = geom.intersection_area(tb)
        if inter <= 0.0:
            return 0
        count = 1 if tile.zoom >= minzoom else 0
        if tile.zoom < maxzoom:
            children = tile.get_children()
            tile_area = tb.width * tb.height
            if not _fully_covered(tb, tile_area, inter) or len(children) != 4:
                count += sum(rec(c, inter) for c in children)
            else:
                count += sum(
                    4**z
                    for z in range(
                        minzoom - tile.zoom if tile.zoom < minzoom else 1,
                        maxzoom - tile.zoom + 1,
                    )
                )
        return count

    total = 0
    for row in range(unbuffered.matrix_height(init_zoom)):
        for col in range(unbuffered.matrix_width(init_zoom)):
            total += rec(unbuffered.tile(init_zoom, row, col), float("inf"))
    return total


def count_tiles_rasterized(
    geom: Geometry, pyramid: TilePyramid, minzoom: int, maxzoom: int
) -> int:
    """Rasterize-and-pool tile counting — the reference's fallback for
    AOIs where quadtree recursion degenerates (many fragments, high
    zoom: mapchete/tile.py:410-459 _count_cells). The reference
    rasterizes with GDAL all_touched=True on a slightly shrunk
    geometry, then max-resamples up the pyramid; without rasterio this
    implements the same cell semantics EXACTLY (a cell counts iff its
    intersection with the geometry has positive area) via an even-odd
    scanline over tile-row slabs:

    - per maxzoom tile row, the slab is cut at interior vertex ys; in
      each sub-slab a simple polygon's edges cannot cross, so midline
      even-odd crossings pair into trapezoids whose x-projection over
      the sub-slab is exact — every cell overlapping a projection by a
      positive length gains positive intersection area, boundary-touch
      cells never do (the closed-form twin of the reference's negative
      buffer + all_touched trick);
    - counts for coarser zooms come from 2x2 max-pooling (the dyadic
      grid's exact equivalent of Resampling.max), summing per zoom.

    O(rows x edges + marked cells) instead of the quadtree's
    O(fragments x depth) — linear in the grid for shattered AOIs.
    Agrees with count_tiles exactly (golden-tested)."""
    unbuffered = pyramid.without_pixelbuffer()
    if isinstance(geom, Bounds):
        geom = Polygon.from_bounds(geom)
    if isinstance(geom, Point) or geom.is_empty():
        return 0
    polys = geom.polygons if isinstance(geom, MultiPolygon) else [geom]

    mh, mw = unbuffered.matrix_height(maxzoom), unbuffered.matrix_width(maxzoom)
    t00 = unbuffered.tile(maxzoom, 0, 0).bounds(pixelbuffer=0)
    tsx, tsy = t00.right - t00.left, t00.top - t00.bottom
    left, top = t00.left, t00.top
    grid = np.zeros((mh, mw), dtype=bool)

    def _close(ring: np.ndarray) -> np.ndarray:
        if len(ring) and not np.array_equal(ring[0], ring[-1]):
            return np.vstack([ring, ring[:1]])
        return ring

    for poly in polys:
        if poly.is_empty():
            continue
        rings = [_close(poly.exterior)] + [_close(h) for h in poly.interiors]
        xs0 = np.concatenate([r[:-1, 0] for r in rings])
        ys0 = np.concatenate([r[:-1, 1] for r in rings])
        xs1 = np.concatenate([r[1:, 0] for r in rings])
        ys1 = np.concatenate([r[1:, 1] for r in rings])
        keep = ys0 != ys1  # horizontal edges never cross a scanline
        xs0, ys0, xs1, ys1 = xs0[keep], ys0[keep], xs1[keep], ys1[keep]
        if len(xs0) == 0:
            continue
        ylo = np.minimum(ys0, ys1)
        yhi = np.maximum(ys0, ys1)
        vys = np.unique(np.concatenate([ys0, ys1]))
        bb = poly.bounds
        r0 = max(0, int(np.floor((top - bb.top) / tsy)))
        r1 = min(mh - 1, int(np.ceil((top - bb.bottom) / tsy)) - 1)
        for r in range(r0, r1 + 1):
            yt = top - r * tsy
            yb = yt - tsy
            sel = (ylo < yt) & (yhi > yb)
            if not sel.any():
                continue
            ex0, ey0, ex1, ey1 = xs0[sel], ys0[sel], xs1[sel], ys1[sel]
            inner = vys[(vys > yb) & (vys < yt)]
            cuts = np.concatenate([[yb], inner, [yt]])
            for a, b in zip(cuts[:-1], cuts[1:]):
                if b - a <= 0.0:
                    continue
                ym = 0.5 * (a + b)
                # half-open crossing rule at the midline
                cross = ((ey0 <= ym) & (ym < ey1)) | ((ey1 <= ym) & (ym < ey0))
                if not cross.any():
                    continue
                cx0, cy0 = ex0[cross], ey0[cross]
                cx1, cy1 = ex1[cross], ey1[cross]
                tmid = (ym - cy0) / (cy1 - cy0)
                xm = cx0 + tmid * (cx1 - cx0)
                order = np.argsort(xm, kind="stable")
                xa = cx0 + ((a - cy0) / (cy1 - cy0)) * (cx1 - cx0)
                xb = cx0 + ((b - cy0) / (cy1 - cy0)) * (cx1 - cx0)
                xa, xb = xa[order], xb[order]
                n_pairs = len(order) // 2
                for k in range(n_pairs):
                    lo = min(xa[2 * k], xb[2 * k])
                    hi = max(xa[2 * k + 1], xb[2 * k + 1])
                    if hi - lo <= 0.0:
                        continue  # degenerate sliver: zero area
                    c0 = int(np.floor((lo - left) / tsx))
                    if left + (c0 + 1) * tsx <= lo:
                        c0 += 1
                    c1 = int(np.ceil((hi - left) / tsx)) - 1
                    if left + c1 * tsx >= hi:
                        c1 -= 1
                    c0, c1 = max(c0, 0), min(c1, mw - 1)
                    if c1 >= c0:
                        grid[r, c0 : c1 + 1] = True

    count = int(grid.sum()) if maxzoom >= minzoom else 0
    g = grid
    for z in range(maxzoom - 1, minzoom - 1, -1):
        nh, nw = unbuffered.matrix_height(z), unbuffered.matrix_width(z)
        fh, fw = g.shape[0] // nh, g.shape[1] // nw
        g = g.reshape(nh, fh, nw, fw).any(axis=(1, 3))
        count += int(g.sum())
    return count


def snap_geometry_to_tiles(
    geom: Geometry, pyramid: TilePyramid, zoom: int
) -> MultiPolygon:
    """Snap an AOI outward to the tile grid: union of the bounds of all
    tiles the geometry intersects (cell-grid variant of
    mapchete/tile.py:490-552 rasterize→shapes; exact for our purposes
    since the output is only used as a filter predicate).

    Returns a MultiPolygon of merged row-run rectangles.
    """
    cells = {}
    for tile in tiles_from_geom(pyramid, geom, zoom, exact=True):
        cells.setdefault(tile.row, []).append(tile)
    polys = []
    for row, tiles in sorted(cells.items()):
        tiles.sort(key=lambda t: t.col)
        run_start = tiles[0]
        prev = tiles[0]
        for t in tiles[1:] + [None]:
            if t is not None and t.col == prev.col + 1:
                prev = t
                continue
            b0 = run_start.bounds(pixelbuffer=0)
            b1 = prev.bounds(pixelbuffer=0)
            polys.append(Polygon.from_bounds(Bounds(b0.left, b0.bottom, b1.right, b0.top)))
            if t is not None:
                run_start = prev = t
    if pyramid.pixelbuffer:
        # grow by pixelbuffer distance, clipped like the reference
        dist = pyramid.pixelbuffer * pyramid.pixel_x_size(zoom)
        grown = []
        for p in polys:
            b = p.bounds
            left = b.left - dist
            right = b.right + dist
            if not pyramid.is_global:
                left = max(left, pyramid.left)
                right = min(right, pyramid.right)
            grown.append(
                Polygon.from_bounds(
                    Bounds(
                        left,
                        max(b.bottom - dist, pyramid.bottom),
                        right,
                        min(b.top + dist, pyramid.top),
                    )
                )
            )
        polys = grown
    return MultiPolygon(tuple(polys))


# ---- vectorized numpy covers (UDF fast path) --------------------------------


def points_to_tiles(
    pyramid: TilePyramid, lon: np.ndarray, lat: np.ndarray, zoom: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized point->tile assignment. Points on tile boundaries go to
    the right/bottom tile ('rb' edge rule); points on the pyramid
    right/bottom edge are clamped into the last tile."""
    tx = pyramid.tile_x_size(zoom)
    ty = pyramid.tile_y_size(zoom)
    col = np.floor((np.asarray(lon, np.float64) - pyramid.left) / tx).astype(np.int64)
    row = np.floor((pyramid.top - np.asarray(lat, np.float64)) / ty).astype(np.int64)
    np.clip(col, 0, pyramid.matrix_width(zoom) - 1, out=col)
    np.clip(row, 0, pyramid.matrix_height(zoom) - 1, out=row)
    return row, col


def bounds_to_tile_ranges(
    pyramid: TilePyramid,
    left: np.ndarray,
    bottom: np.ndarray,
    right: np.ndarray,
    top: np.ndarray,
    zoom: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized bbox -> inclusive (row0, row1, col0, col1) tile ranges
    (no antimeridian wrap — callers split wrapped boxes first)."""
    tx = pyramid.tile_x_size(zoom)
    ty = pyramid.tile_y_size(zoom)
    mw = pyramid.matrix_width(zoom)
    mh = pyramid.matrix_height(zoom)
    c0 = np.floor((np.asarray(left, np.float64) - pyramid.left) / tx).astype(np.int64)
    c1 = (np.ceil((np.asarray(right, np.float64) - pyramid.left) / tx) - 1).astype(np.int64)
    r0 = np.floor((pyramid.top - np.asarray(top, np.float64)) / ty).astype(np.int64)
    r1 = (np.ceil((pyramid.top - np.asarray(bottom, np.float64)) / ty) - 1).astype(np.int64)
    np.clip(c0, 0, mw - 1, out=c0)
    np.clip(c1, 0, mw - 1, out=c1)
    np.clip(r0, 0, mh - 1, out=r0)
    np.clip(r1, 0, mh - 1, out=r1)
    return r0, r1, c0, c1
