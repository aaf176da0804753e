"""Exact polygon overlay (V3 general dissolve / V7 overlapping-ring
repair): slab-decomposition union against closed forms, an independent
axis-swapped decomposition, and fine-grid rasterization."""

import numpy as np
import pytest

from mapchete_spark.geometry.core import point_in_ring, ring_area
from mapchete_spark.geometry.overlay import (
    repair_polygon,
    union_area,
    union_trapezoids,
)
from mapchete_spark.tilegrid.grid import Bounds


def sq(cx, cy, r, th=0.0):
    c, s = np.cos(th), np.sin(th)
    pts = [(-r, -r), (r, -r), (r, r), (-r, r)]
    ring = np.array(
        [[cx + c * ox - s * oy, cy + s * ox + c * oy] for ox, oy in pts + pts[:1]]
    )
    return [ring]


def ngon(cx, cy, r, n, ph):
    th = ph + np.arange(n) * 2 * np.pi / n
    ring = np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])
    return [np.vstack([ring, ring[:1]])]


def axis_swapped(feats):
    return [[r[:, ::-1].copy() for r in f] for f in feats]


class TestUnionArea:
    def test_two_overlapping_axis_squares_closed_form(self):
        # 4 + 4 - 1x1 overlap = 7
        assert union_area([sq(0, 0, 1), sq(1, 1, 1)]) == pytest.approx(7.0, abs=1e-12)

    def test_disjoint_sums_nested_keeps_outer(self):
        assert union_area([sq(0, 0, 1), sq(10, 0, 1)]) == pytest.approx(8.0, abs=1e-12)
        assert union_area([sq(0, 0, 2), sq(0, 0, 1)]) == pytest.approx(16.0, abs=1e-12)

    def test_rotated_union_matches_fine_grid(self):
        rng = np.random.RandomState(5)
        feats = [
            sq(rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(0.5, 1.5), rng.uniform(0, 3))
            for _ in range(6)
        ]
        ua = union_area(feats)
        n = 1500
        xs = np.linspace(-6 + 4e-3, 6 - 4e-3, n)
        X, Y = np.meshgrid(xs, xs)
        cov = np.zeros(X.size, dtype=bool)
        for f in feats:
            cov |= point_in_ring(X.ravel(), Y.ravel(), f[0])
        assert ua == pytest.approx(cov.mean() * 144.0, abs=0.08)

    def test_axis_swap_invariance_random(self):
        """Union area must be identical under swapping x/y of every
        ring — an independent decomposition path (different slabs,
        different intersections) that only agrees if both are exact."""
        rng = np.random.RandomState(11)
        for _ in range(15):
            feats = [
                ngon(rng.uniform(-3, 3), rng.uniform(-3, 3), rng.uniform(0.3, 1.5),
                     rng.randint(3, 8), rng.uniform(0, 3))
                for _ in range(rng.randint(2, 8))
            ]
            ua = union_area(feats)
            ub = union_area(axis_swapped(feats))
            assert ua == pytest.approx(ub, abs=1e-10)
            areas = [ring_area(f[0]) for f in feats]
            assert max(areas) - 1e-9 <= ua <= sum(areas) + 1e-9

    def test_box_restriction(self):
        # unit box over a 2x2 square centered at origin -> full box
        assert union_area([sq(0, 0, 2)], box=Bounds(-1, -1, 1, 1)) == pytest.approx(
            4.0, abs=1e-12
        )
        # box outside -> 0
        assert union_area([sq(0, 0, 1)], box=Bounds(5, 5, 6, 6)) == 0.0

    def test_holes_difference(self):
        # rotated hole fully inside: 16 - 4
        assert union_area([sq(0, 0, 2)], holes=[sq(0, 0, 1, th=0.3)]) == pytest.approx(
            12.0, abs=1e-9
        )
        # hole half outside the shell must NOT double-subtract
        assert union_area([sq(0, 0, 1)], holes=[sq(1, 0, 1)]) == pytest.approx(
            2.0, abs=1e-9
        )

    def test_overlapping_holes_not_double_subtracted(self):
        # two unit-half-width holes overlapping each other by 1x2:
        # hole union = 4 + 4 - 2 = 6 -> area = 36 - 6 = 30
        got = union_area(
            [sq(0, 0, 3)], holes=[sq(-0.5, 0, 1), sq(0.5, 0, 1)]
        )
        assert got == pytest.approx(30.0, abs=1e-9)

    def test_ulp_sliver_ring_does_not_crash(self):
        # inexact ring closure (cos(th) vs cos(th + 2*pi)) creates a
        # 1-ulp edge; parity pairing must drop the unpaired crossing
        th = 0.7 + np.arange(4) * 2 * np.pi / 3
        ring = np.column_stack([np.cos(th), np.sin(th)])
        ua = union_area([[ring]])
        assert ua == pytest.approx(ring_area(ring[:4]), abs=1e-9)


class TestTrapezoids:
    def test_trapezoids_partition_the_union(self):
        rng = np.random.RandomState(7)
        feats = [
            sq(rng.uniform(-2, 2), rng.uniform(-2, 2), rng.uniform(0.5, 1.2), rng.uniform(0, 3))
            for _ in range(5)
        ]
        ua = union_area(feats)
        traps = union_trapezoids(feats)
        assert sum(ring_area(t) for t in traps) == pytest.approx(ua, abs=1e-6)
        # non-overlap: total point coverage counted once
        n = 400
        xs = np.linspace(-4, 4, n)
        X, Y = np.meshgrid(xs, xs)
        counts = np.zeros(X.size, dtype=int)
        for t in traps:
            counts += point_in_ring(X.ravel(), Y.ravel(), t).astype(int)
        assert counts.max() <= 1


class TestRepairPolygon:
    def test_bowtie_exterior(self):
        bowtie = np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)
        area, traps = repair_polygon(bowtie)
        assert area == pytest.approx(2.0, abs=1e-9)  # two unit triangles
        assert sum(ring_area(t) for t in traps) == pytest.approx(2.0, abs=1e-9)

    def test_overlapping_interior_rings(self):
        shell = sq(0, 0, 3)[0]
        h1, h2 = sq(-0.5, 0, 1)[0], sq(0.5, 0, 1)[0]
        area, _ = repair_polygon(shell, [h1, h2])
        assert area == pytest.approx(30.0, abs=1e-9)

    def test_hole_leaking_outside_shell(self):
        shell = sq(0, 0, 1)[0]
        hole = sq(1, 0, 1)[0]
        area, _ = repair_polygon(shell, [hole])
        assert area == pytest.approx(2.0, abs=1e-9)


class TestClipPolygonalOverlay:
    def test_clip_area_with_overlapping_holes(self, spark):
        """_clip_polygonal must route polygons WITH holes through the
        overlay: overlapping holes are not double-subtracted."""
        import json

        from mapchete_spark.geometry.core import Polygon
        from mapchete_spark.geometry.wkb import to_wkb
        from mapchete_spark.operators.vector import (
            clip_features_to_tiles,
            explode_features_to_tiles,
        )

        outer = np.array([[1.0, 1.0], [10.0, 1.0], [10.0, 10.0], [1.0, 10.0], [1.0, 1.0]])
        h1 = np.array([[3.0, 4.0], [6.0, 4.0], [6.0, 6.0], [3.0, 6.0], [3.0, 4.0]])
        h2 = np.array([[5.0, 4.0], [8.0, 4.0], [8.0, 6.0], [5.0, 6.0], [5.0, 4.0]])
        poly = Polygon(outer, (h1, h2))
        feats = spark.createDataFrame(
            [("ov", bytearray(to_wkb(poly)), "Polygon", json.dumps({}))],
            "feature_id string, geometry binary, geom_type string, properties string",
        )
        rows = clip_features_to_tiles(explode_features_to_tiles(feats, 4)).collect()
        [r] = [c for c in rows if c["tile_row"] == 7 and c["tile_col"] == 16]
        # holes overlap on [5,6]x[4,6]: union of holes = 6+6-2 = 10
        assert r["clipped_area"] == pytest.approx(81.0 - 10.0, abs=1e-9)


class TestUnionRings:
    """Dissolve: trapezoid cover -> merged minimal rings."""

    def test_touching_squares_dissolve_to_one_rect(self):
        from mapchete_spark.geometry.overlay import ring_signed_area, union_rings

        rings = union_rings([sq(0.5, 0.5, 0.5), sq(1.5, 0.5, 0.5)])
        assert len(rings) == 1
        assert len(rings[0]) - 1 == 4  # collinear seam vertices merged
        assert ring_signed_area(rings[0]) == pytest.approx(2.0)

    def test_ring_area_equals_slab_area_random_rotated(self):
        from mapchete_spark.geometry.overlay import (
            ring_signed_area,
            union_area,
            union_rings,
        )

        rng = np.random.RandomState(11)
        for _ in range(10):
            feats = [
                sq(rng.uniform(0, 5), rng.uniform(0, 5),
                   rng.uniform(0.2, 1.5), rng.uniform(0, 3))
                for _ in range(8)
            ]
            a = union_area(feats)
            assert a > 0
            ar = sum(ring_signed_area(r) for r in union_rings(feats))
            assert ar == pytest.approx(a, rel=1e-9, abs=1e-9)

    def test_frame_union_yields_shell_and_hole(self):
        from mapchete_spark.geometry.overlay import (
            ring_signed_area,
            union_polygons,
        )

        bars = [
            [np.array([[0, 0], [3, 0], [3, 0.5], [0, 0.5], [0, 0]], float)],
            [np.array([[0, 2.5], [3, 2.5], [3, 3], [0, 3], [0, 2.5]], float)],
            [np.array([[0, 0], [0.5, 0], [0.5, 3], [0, 3], [0, 0]], float)],
            [np.array([[2.5, 0], [3, 0], [3, 3], [2.5, 3], [2.5, 0]], float)],
        ]
        polys = union_polygons(bars)
        assert len(polys) == 1
        shell, holes = polys[0]
        assert len(holes) == 1
        assert ring_signed_area(shell) == pytest.approx(9.0)
        assert ring_signed_area(holes[0]) == pytest.approx(-4.0)

    def test_disjoint_islands_stay_separate(self):
        from mapchete_spark.geometry.overlay import union_rings

        rings = union_rings([sq(0, 0, 0.4), sq(5, 5, 0.4), sq(10, 0, 1)])
        assert len(rings) == 3

    def test_overlapping_holes_via_multipolygon(self):
        from mapchete_spark.geometry.overlay import (
            union_area,
            union_multipolygon,
        )

        outer = [sq(2, 2, 2)]
        holes = [sq(1.7, 1.7, 0.7), sq(2.6, 2.2, 0.7)]
        mp = union_multipolygon(outer, holes=holes)
        assert mp.area == pytest.approx(union_area(outer, holes=holes))
        assert len(mp.polygons) == 1
        assert len(mp.polygons[0].interiors) >= 1

    def test_box_clip_rings_match_area(self):
        from mapchete_spark.geometry.overlay import (
            ring_signed_area,
            union_area,
            union_rings,
        )

        rng = np.random.RandomState(23)
        box = Bounds(0.5, 0.5, 4.5, 4.5)
        for _ in range(8):
            feats = [
                sq(rng.uniform(0, 5), rng.uniform(0, 5),
                   rng.uniform(0.3, 2.0), rng.uniform(0, 3))
                for _ in range(5)
            ]
            a = union_area(feats, box=box)
            ar = sum(
                ring_signed_area(r) for r in union_rings(feats, box=box)
            )
            assert ar == pytest.approx(a, rel=1e-9, abs=1e-9)


class TestBoxClipExactness:
    """Round-3 fix: box-boundary crossings are slab cuts, so the
    clamped midpoint measure is exact (previously the clamp kinked
    inside a slab and union_area(box=...) drifted from ground truth)."""

    def test_rotated_square_clipped_matches_polygon_clip_area(self):
        from mapchete_spark.geometry.core import clip_ring_to_rect
        from mapchete_spark.geometry.overlay import union_area

        rng = np.random.RandomState(5)
        box = Bounds(1.0, 1.0, 4.0, 4.0)
        for _ in range(10):
            ring = sq(rng.uniform(1, 4), rng.uniform(1, 4),
                      rng.uniform(0.5, 2.5), rng.uniform(0, 3))[0]
            # ground truth: Sutherland-Hodgman clip then shoelace
            clipped = clip_ring_to_rect(ring, *box)
            truth = ring_area(clipped) if len(clipped) >= 3 else 0.0
            got = union_area([[ring]], box=box)
            assert got == pytest.approx(truth, rel=1e-12, abs=1e-12)
