"""Raster kernel tests (prepare/extract/resample/mosaic/clip/terrain).

Goldens are derived from the analytic DEM (FIXTURES.md F2) and from
exactness properties (dyadic average = block mean, nearest = index
lookup, mosaic placement, Horn hillshade on known slopes).
"""

import numpy as np
import numpy.ma as ma
import pytest

from mapchete_spark.geometry.core import Polygon
from mapchete_spark.raster import (
    clip_array_with_vector,
    create_mosaic,
    dem_tile,
    elevation,
    extract_from_array,
    prepare_array,
    rasterize_mask,
    resample_from_array,
)
from mapchete_spark.raster.terrain import (
    generate_contours,
    get_contour_values,
    hillshade,
)
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")


class TestPrepare:
    def test_2d_to_3d(self):
        out = prepare_array(np.zeros((4, 4)), nodata=-1, dtype="float32")
        assert out.shape == (1, 4, 4)
        assert out.dtype == np.float32

    def test_nodata_masked(self):
        a = np.array([[1, -1], [2, 3]])
        out = prepare_array(a, nodata=-1)
        assert out.mask[0, 0, 1]
        assert not out.mask[0, 0, 0]

    def test_band_list(self):
        out = prepare_array([np.zeros((2, 2)), np.ones((2, 2))], nodata=0)
        assert out.shape == (2, 2, 2)


class TestExtractResample:
    def test_extract(self):
        arr = prepare_array(np.arange(64).reshape(8, 8), nodata=-1, dtype="float64")
        b = Bounds(0, 0, 8, 8)  # 1 unit per pixel
        sub = extract_from_array(arr, b, Bounds(2, 2, 6, 6))
        assert sub.shape == (1, 4, 4)
        # top-left of window = row 2 (y=6..5), col 2
        assert sub[0, 0, 0] == arr[0, 2, 2]

    def test_extract_outside_raises(self):
        arr = prepare_array(np.zeros((4, 4)), nodata=-1)
        with pytest.raises(ValueError):
            extract_from_array(arr, Bounds(0, 0, 4, 4), Bounds(-1, 0, 2, 2))

    def test_average_downsample_exact(self):
        data = np.arange(16, dtype=np.float64).reshape(4, 4)
        arr = prepare_array(data, nodata=-999, dtype="float64")
        b = Bounds(0, 0, 4, 4)
        out = resample_from_array(arr, b, b, (2, 2), resampling="average")
        expect = data.reshape(2, 2, 2, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(out[0].data, expect)

    def test_average_respects_mask(self):
        data = np.ma.MaskedArray(
            np.ones((2, 2), dtype=np.float64),
            mask=[[True, False], [False, False]],
        )[np.newaxis]
        out = resample_from_array(data, Bounds(0, 0, 2, 2), Bounds(0, 0, 2, 2), (1, 1),
                                  resampling="average", nodata=-1)
        # nanmean over remaining 3 cells
        assert out[0, 0, 0] == pytest.approx(1.0)
        assert not out.mask.any()

    def test_nearest_identity(self):
        data = np.arange(16, dtype=np.float64).reshape(4, 4)
        arr = prepare_array(data, nodata=-999, dtype="float64")
        b = Bounds(0, 0, 4, 4)
        out = resample_from_array(arr, b, b, (4, 4), resampling="nearest")
        np.testing.assert_array_equal(out[0].data, data)

    def test_nearest_upsample(self):
        data = np.array([[1.0, 2.0], [3.0, 4.0]])
        arr = prepare_array(data, nodata=-999, dtype="float64")
        b = Bounds(0, 0, 2, 2)
        out = resample_from_array(arr, b, b, (4, 4), resampling="nearest")
        assert out[0, 0, 0] == 1.0 and out[0, 3, 3] == 4.0

    def test_bilinear_center_exact(self):
        data = np.array([[0.0, 1.0], [2.0, 3.0]])
        arr = prepare_array(data, nodata=-999, dtype="float64")
        b = Bounds(0, 0, 2, 2)
        out = resample_from_array(arr, b, b, (1, 1), resampling="bilinear")
        assert out[0, 0, 0] == pytest.approx(1.5)

    def test_dyadic_pyramid_step(self):
        # child tiles averaged == parent window of the analytic DEM trend
        t = GEO.tile(5, 10, 20)
        child_arrays = [(c, dem_tile(c, hole=False)) for c in t.get_children()]
        mosaic, mbounds = create_mosaic(child_arrays, nodata=-9999)
        parent = resample_from_array(
            mosaic, mbounds, t.bounds(), t.shape(), resampling="average", nodata=-9999
        )
        direct = dem_tile(t, hole=False)
        # block-averaged children approximate the direct parent sample
        assert float(np.abs(parent[0].data - direct[0].data).mean()) < 1.0


class TestMosaic:
    def test_2x2_placement(self):
        tiles = [GEO.tile(3, r, c) for r in (2, 3) for c in (4, 5)]
        arrays = [
            (t, prepare_array(np.full((256, 256), i, dtype=np.float32), nodata=-1, dtype="float32"))
            for i, t in enumerate(tiles)
        ]
        mosaic, b = create_mosaic(arrays, nodata=-1)
        assert mosaic.shape == (1, 512, 512)
        assert mosaic[0, 0, 0] == 0  # row2,col4 top-left
        assert mosaic[0, 511, 511] == 3
        t0 = tiles[0].bounds()
        assert b.left == t0.left and b.top == t0.top

    def test_antimeridian_wrap(self):
        # tiles on both sides of the antimeridian at zoom 3 (mw=16)
        left_edge = GEO.tile(3, 4, 0)
        right_edge = GEO.tile(3, 4, 15)
        arrays = [
            (t, prepare_array(np.zeros((256, 256), dtype=np.float32), nodata=-1, dtype="float32"))
            for t in (left_edge, right_edge)
        ]
        mosaic, b = create_mosaic(arrays, nodata=-1)
        # wrapped: 2 tiles side by side, not a 16-tile-wide canvas
        assert mosaic.shape == (1, 256, 512)
        assert b.right > 180.0  # overflows the antimeridian

    def test_mixed_zoom_raises(self):
        with pytest.raises(ValueError):
            create_mosaic(
                [
                    (GEO.tile(2, 0, 0), prepare_array(np.zeros((256, 256)), nodata=0)),
                    (GEO.tile(3, 0, 0), prepare_array(np.zeros((256, 256)), nodata=0)),
                ]
            )


class TestMask:
    def test_rasterize_mask_center_rule(self):
        # polygon covering left half of a 4x4 unit grid
        poly = Polygon.from_bounds(Bounds(0, 0, 2, 4))
        m = rasterize_mask([poly], Bounds(0, 0, 4, 4), (4, 4), invert=True)
        assert m[:, :2].all() and not m[:, 2:].any()

    def test_clip_array(self):
        arr = prepare_array(np.ones((4, 4)), nodata=-1, dtype="float64")
        poly = Polygon.from_bounds(Bounds(0, 0, 2, 4))
        out = clip_array_with_vector(arr, Bounds(0, 0, 4, 4), [poly])
        assert not out.mask[0, :, :2].any()
        assert out.mask[0, :, 2:].all()

    def test_clip_inverted(self):
        arr = prepare_array(np.ones((4, 4)), nodata=-1, dtype="float64")
        poly = Polygon.from_bounds(Bounds(0, 0, 2, 4))
        out = clip_array_with_vector(arr, Bounds(0, 0, 4, 4), [poly], inverted=True)
        assert out.mask[0, :, :2].all()
        assert not out.mask[0, :, 2:].any()


class TestTerrain:
    def test_flat_is_uniform(self):
        flat = ma.MaskedArray(np.full((10, 10), 100.0), mask=False)
        hs = hillshade(flat, (1.0, 0, 0, 0, -1.0, 0))
        assert hs.shape == (10, 10)
        inner = hs[1:-1, 1:-1]
        assert (inner == inner[0, 0]).all()
        # flat ground under 45deg sun: sin(45deg)*255 ~ 180
        assert abs(int(inner[0, 0]) - 180) <= 1

    def test_slope_brightness_direction(self):
        # a surface rising toward the southeast has its normal tilted
        # toward the northwest — facing the default 315-azimuth light:
        # bright; the opposite tilt faces away: dark
        ys, xs = np.mgrid[0:20, 0:20]
        rising_se = ma.MaskedArray((xs + ys).astype(np.float64), mask=False)
        rising_nw = ma.MaskedArray((-(xs + ys)).astype(np.float64), mask=False)
        hs_se = hillshade(rising_se, (1.0, 0, 0, 0, -1.0, 0))
        hs_nw = hillshade(rising_nw, (1.0, 0, 0, 0, -1.0, 0))
        assert hs_se[10, 10] > 200 > 50 > hs_nw[10, 10]

    def test_mask_carried(self):
        data = np.full((8, 8), 100.0)
        arr = ma.MaskedArray(data, mask=np.zeros((8, 8), bool))
        arr.mask[2, 2] = True
        hs = hillshade(arr, (1.0, 0, 0, 0, -1.0, 0))
        assert hs.mask[2, 2] and not hs.mask[0, 0]

    def test_contour_values(self):
        assert get_contour_values(-250, 260, base=0, interval=100) == [
            -200,
            -100,
            0,
            100,
            200,
        ]

    def test_contours_of_linear_field(self):
        # f(r,c) = c over a 32x32 grid -> vertical lines at c = levels
        grid = np.tile(np.arange(32, dtype=np.float64), (32, 1))
        feats = generate_contours(
            grid, tile_left=0.0, tile_top=32.0, pixel_x_size=1.0, pixel_y_size=1.0,
            interval=8, field="elev",
        )
        assert feats
        for f in feats:
            xs = f["geometry"].coords[:, 0]
            assert np.allclose(xs, xs[0])  # vertical line
            assert f["properties"]["elev"] == pytest.approx(xs[0])

    def test_contours_on_dem_tile(self):
        t = GEO.tile(6, 20, 30)
        arr = dem_tile(t, hole=False)
        feats = generate_contours(
            arr,
            tile_left=t.bounds().left,
            tile_top=t.bounds().top,
            pixel_x_size=t.pixel_x_size,
            pixel_y_size=t.pixel_y_size,
            interval=100,
        )
        assert feats
        b = t.bounds()
        for f in feats:
            c = f["geometry"].coords
            assert (c[:, 0] >= b.left - 1e-6).all() and (c[:, 0] <= b.right + 1e-6).all()

    def test_contour_level_accuracy(self):
        # on the analytic DEM, contour vertices should sit near the level
        t = GEO.tile(6, 20, 30)
        arr = dem_tile(t, hole=False)
        b = t.bounds()
        feats = generate_contours(
            arr, b.left, b.top, t.pixel_x_size, t.pixel_y_size, interval=200
        )
        for f in feats[:5]:
            pts = f["geometry"].coords
            vals = elevation(pts[:, 0], pts[:, 1])
            # linear interp error bounded by curvature over one pixel
            assert np.abs(vals - f["properties"]["elev"]).max() < 15.0


class TestDem:
    def test_deterministic(self):
        t = GEO.tile(5, 10, 20)
        a = dem_tile(t)
        b = dem_tile(t)
        np.testing.assert_array_equal(a.filled(), b.filled())

    def test_hole_masked(self):
        # find a tile containing low elevation (elev < 150)
        t = GEO.tile(4, 8, 15)
        arr = dem_tile(t, hole=True)
        assert arr.mask.any() or (arr.data >= 150).all()

    def test_buffered_tile_window_consistent(self):
        # the buffered window's interior equals the unbuffered tile
        tp = TilePyramid("geodetic", pixelbuffer=2)
        t = tp.tile(5, 10, 20)
        buf = dem_tile(t, pixelbuffer=2, hole=False)
        unbuf = dem_tile(t, pixelbuffer=0, hole=False)
        np.testing.assert_allclose(
            buf[0, 2:-2, 2:-2], unbuf[0], rtol=0, atol=1e-5
        )


class TestCubicResampling:
    """R2 cubic/max/min kernels (round-2; reference exposes the full
    rasterio Resampling enum, mapchete/io/raster/array.py:84-192)."""

    def _grid(self, fn, n=16):
        import numpy as np

        ys, xs = np.mgrid[0:n, 0:n]
        return fn(xs.astype(np.float64), ys.astype(np.float64))[np.newaxis]

    def test_cubic_reproduces_constant(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = self._grid(lambda x, y: np.full_like(x, 7.25))
        out = resample_from_array(
            arr, Bounds(0, 0, 16, 16), Bounds(2, 2, 14, 14), (24, 24),
            resampling="cubic", nodata=-1,
        )
        np.testing.assert_allclose(np.asarray(out), 7.25, rtol=1e-12)

    def test_cubic_reproduces_linear_ramp(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        # f(x, y) = x + 2y sampled at pixel centers; cubic convolution
        # reproduces polynomials up to degree 1 exactly (interior taps)
        arr = self._grid(lambda x, y: (x + 0.5) + 2 * (y + 0.5), n=32)
        out = resample_from_array(
            arr, Bounds(0, 0, 32, 32), Bounds(8, 8, 24, 24), (32, 32),
            resampling="cubic", nodata=-1,
        )
        px = 16.0 / 32
        xs = 8 + (np.arange(32) + 0.5) * px
        ys = 24 - (np.arange(32) + 0.5) * px
        # array row 0 is the TOP of the bounds: f(fr, fc) = x + 2*(32 - y)
        want = xs[None, :] + 2 * (32.0 - ys[:, None])
        np.testing.assert_allclose(np.asarray(out)[0], want, rtol=1e-10)

    def test_cubic_overshoot_differs_from_bilinear(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = self._grid(lambda x, y: (x >= 8).astype(np.float64) * 100, n=16)
        cub = resample_from_array(
            arr, Bounds(0, 0, 16, 16), Bounds(4, 4, 12, 12), (32, 32),
            resampling="cubic", nodata=-1,
        )
        # cubic convolution overshoots at the step edge
        assert float(np.asarray(cub).max()) > 100.0
        assert float(np.asarray(cub).min()) < 0.0

    def test_max_min_downscale(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = self._grid(lambda x, y: x + y * 16, n=16)
        mx = resample_from_array(
            arr, Bounds(0, 0, 16, 16), Bounds(0, 0, 16, 16), (8, 8),
            resampling="max", nodata=-1,
        )
        mn = resample_from_array(
            arr, Bounds(0, 0, 16, 16), Bounds(0, 0, 16, 16), (8, 8),
            resampling="min", nodata=-1,
        )
        # 2x2 block extremes of f = x + 16y
        assert float(np.asarray(mx)[0, 0, 0]) == 1 + 16 * 1
        assert float(np.asarray(mn)[0, 0, 0]) == 0.0

    def test_unknown_resampling_raises(self):
        import numpy as np
        import pytest

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = self._grid(lambda x, y: x)
        with pytest.raises(ValueError, match="unsupported resampling"):
            resample_from_array(
                arr, Bounds(0, 0, 16, 16), Bounds(0, 0, 16, 16), (8, 8),
                resampling="lanczos5", nodata=-1,
            )

    def test_cubic_through_config_baselevels(self, spark, tmp_path):
        import os

        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        from mapchete_spark.tilegrid import Bounds

        cfg = JobConfig.from_file(os.path.join(here, "configs", "baselevels.mapchete"))
        cfg.baselevels.lower = "cubic"
        # quarter of the config AOI: this test only checks the cubic
        # kernel flows through config->execute->overview; the full-AOI
        # baselevels pipeline is covered by test_config_job
        cfg.bounds = Bounds(0.0, 20.0, 22.5, 31.25)
        cfg.output["path"] = str(tmp_path / "bl_cubic")
        counts = execute(spark, cfg, mode="overwrite")
        assert counts["overview_z4"] > 0


class TestMoreKernels:
    """lanczos / cubic_spline / mode — completing the reference's
    Resampling enum coverage (mapchete/io/raster/array.py:84-192)."""

    def _ramp(self, n=32):
        import numpy as np

        ys, xs = np.mgrid[0:n, 0:n]
        return ((xs + 0.5) + 2 * (ys + 0.5)).astype(np.float64)[np.newaxis]

    def test_lanczos_reproduces_constant(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = np.full((1, 16, 16), 3.5)
        out = resample_from_array(
            arr, Bounds(0, 0, 16, 16), Bounds(4, 4, 12, 12), (24, 24),
            resampling="lanczos", nodata=-1,
        )
        np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-9)

    def test_lanczos_reproduces_linear_interior(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        out = resample_from_array(
            self._ramp(), Bounds(0, 0, 32, 32), Bounds(10, 10, 22, 22), (24, 24),
            resampling="lanczos", nodata=-1,
        )
        px = 12.0 / 24
        xs = 10 + (np.arange(24) + 0.5) * px
        ys = 22 - (np.arange(24) + 0.5) * px
        want = xs[None, :] + 2 * (32.0 - ys[:, None])
        # normalized lanczos-3 approximates (not reproduces) linears:
        # ~2e-3 relative is the kernel's own ripple
        np.testing.assert_allclose(np.asarray(out)[0], want, rtol=5e-3)

    def test_cubic_spline_smooths_but_preserves_constant(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = np.full((1, 16, 16), 9.0)
        out = resample_from_array(
            arr, Bounds(0, 0, 16, 16), Bounds(4, 4, 12, 12), (16, 16),
            resampling="cubic_spline", nodata=-1,
        )
        np.testing.assert_allclose(np.asarray(out), 9.0, rtol=1e-12)
        # B-spline smooths a step (no overshoot, unlike Keys cubic)
        step = np.zeros((1, 16, 16))
        step[:, :, 8:] = 100.0
        sm = resample_from_array(
            step, Bounds(0, 0, 16, 16), Bounds(4, 4, 12, 12), (32, 32),
            resampling="cubic_spline", nodata=-1,
        )
        assert float(np.asarray(sm).max()) <= 100.0 + 1e-9
        assert float(np.asarray(sm).min()) >= -1e-9

    def test_mode_downscale(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        arr = np.zeros((1, 4, 4))
        arr[0, :2, :2] = [[1, 1], [1, 2]]   # block mode 1
        arr[0, :2, 2:] = [[5, 5], [6, 6]]   # tie 5/6 -> smallest (5)
        arr[0, 2:, :2] = [[7, 7], [7, 7]]   # unanimous
        arr[0, 2:, 2:] = [[1, 2], [3, 3]]   # mode 3
        out = resample_from_array(
            arr, Bounds(0, 0, 4, 4), Bounds(0, 0, 4, 4), (2, 2),
            resampling="mode", nodata=-1,
        )
        np.testing.assert_array_equal(
            np.asarray(out)[0], [[1.0, 5.0], [7.0, 3.0]]
        )


class TestIntDtypeMaskedResampling:
    """ADVICE r6 (high): .filled(np.nan) BEFORE the float cast raises
    TypeError on integer-dtype sources with any masked pixel — the
    common uint8/int16 GeoTIFF case through the warp-on-read paths.
    The fix casts first (mask survives astype), so every kernel works
    on masked int arrays; values on float inputs are unchanged."""

    def _masked_int(self, dtype):
        import numpy as np

        arr = np.arange(16, dtype=dtype).reshape(1, 4, 4)
        return np.ma.MaskedArray(arr, mask=(arr == 5), fill_value=0)

    def test_sample_at_fractional_int_all_kernels(self):
        import numpy as np

        from mapchete_spark.raster.array import sample_at_fractional

        fr = np.array([[0.0, 1.6], [2.4, 3.0]])
        fc = np.array([[0.0, 1.2], [2.8, 3.0]])
        for dtype in ("int16", "uint8", "int32"):
            for resampling in (
                "nearest", "bilinear", "cubic", "cubic_spline", "lanczos"
            ):
                out = sample_at_fractional(
                    self._masked_int(dtype), fr, fc, resampling=resampling,
                    nodata=0,
                )
                assert out.shape == (1, 2, 2)
        # nearest on ints must reproduce exact source values
        out = sample_at_fractional(
            self._masked_int("int16"),
            np.array([[0.0]]), np.array([[3.0]]), resampling="nearest",
            nodata=0,
        )
        assert int(np.asarray(out)[0, 0, 0]) == 3

    def test_resample_from_array_int_masked(self):
        import numpy as np

        from mapchete_spark.raster.array import resample_from_array
        from mapchete_spark.tilegrid.grid import Bounds

        src = self._masked_int("int16")
        for resampling in ("average", "mode", "max", "min", "bilinear",
                           "cubic", "cubic_spline", "lanczos"):
            out = resample_from_array(
                src, Bounds(0, 0, 4, 4), Bounds(0, 0, 4, 4), (2, 2),
                resampling=resampling, nodata=-1,
            )
            assert out.shape == (1, 2, 2)

    def test_float_values_unchanged_by_cast_order(self):
        import numpy as np

        from mapchete_spark.raster.array import sample_at_fractional

        arr = np.ma.MaskedArray(
            np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 4, 4),
            mask=np.zeros((1, 4, 4), dtype=bool),
        )
        arr.mask[0, 1, 1] = True
        fr = np.array([[0.5, 2.5]])
        fc = np.array([[0.5, 2.5]])
        out = sample_at_fractional(arr, fr, fc, resampling="bilinear", nodata=-1)
        # fill-then-cast reference (valid for floats)
        d = arr.filled(np.nan).astype(np.float64)
        assert np.isnan(d[0, 1, 1])
        assert out.shape == (1, 1, 2)
