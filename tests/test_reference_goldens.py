"""Additional goldens replicated verbatim from the reference test
suite's assertions (test_processing_base.py, test/io/raster/test_mosaic.py)."""

import numpy as np
import pytest

from mapchete_spark.raster.array import prepare_array
from mapchete_spark.raster.mosaic import _shift_necessary, create_mosaic
from mapchete_spark.tilegrid import Bounds, TilePyramid


class TestShiftRequired:
    """Verbatim cases of reference test_shift_required
    (test_processing_base.py:625-644)."""

    def test_connected_tiles_no_shift(self):
        tp = TilePyramid("mercator")
        tiles = [tp.tile(11, 711, i) for i in range(1, 5)]
        assert not _shift_necessary(tiles)

    def test_antimeridian_neighbor_shifts(self):
        tp = TilePyramid("mercator")
        tiles = [tp.tile(11, 711, i) for i in range(1, 5)]
        tiles.append(tp.tile(11, 711, tp.matrix_width(11) - 1))
        assert _shift_necessary(tiles)

    def test_gaps_without_wrap_no_shift(self):
        tp = TilePyramid("mercator")
        cols = [2, 3, 4, 6, 8, 9]
        tiles = [tp.tile(11, 711, c) for c in cols]
        assert not _shift_necessary(tiles)


@pytest.mark.parametrize("pixelbuffer", [0, 5, 10])
@pytest.mark.parametrize("metatiling", [1, 2, 4])
@pytest.mark.parametrize("zoom", range(3, 5))
def test_snap_bounds_to_zoom(pixelbuffer, metatiling, zoom):
    """Reference test_snap_bounds_to_zoom: snapped bounds equal the
    union of intersecting (buffered) tile bounds."""
    bounds = Bounds(-180, -90, -60, -30)
    pyramid = TilePyramid("geodetic", pixelbuffer=pixelbuffer, metatiling=metatiling)
    snapped = pyramid.snap_bounds(bounds, zoom)
    control = None
    for t in pyramid.tiles_from_bounds(bounds, zoom):
        b = t.bounds()
        control = b if control is None else control + b
    assert tuple(snapped) == tuple(control)


class TestCreateMosaicReference:
    """Reference test_create_mosaic: mosaic bbox equals the union of the
    contributing tile bboxes (top-left AND bottom-right matrix corners,
    edge-cropped tiles included)."""

    @pytest.mark.parametrize("corner", ["tl", "br"])
    def test_corner_mosaics(self, corner):
        zoom = 5
        tp = TilePyramid("geodetic")
        mh, mw = tp.matrix_height(zoom), tp.matrix_width(zoom)
        if corner == "tl":
            rows, cols = range(4), range(4)
        else:
            rows, cols = range(mh - 4, mh), range(mw - 4, mw)
        tiles_arrays = [
            (
                tp.tile(zoom, r, c),
                prepare_array(
                    np.ones(tp.tile(zoom, r, c).shape()), nodata=0, dtype="float64"
                ),
            )
            for r in rows
            for c in cols
        ]
        mosaic, mbounds = create_mosaic(tiles_arrays, nodata=0)
        assert (mosaic.data == 1).all()
        control = None
        for t, _ in tiles_arrays:
            b = t.bounds()
            control = b if control is None else control + b
        assert tuple(mbounds) == pytest.approx(tuple(control))

    def test_single_tile_quick_return_semantics(self):
        tp = TilePyramid("geodetic")
        tile = tp.tile(3, 3, 3)
        data = prepare_array(np.ones(tile.shape()), nodata=0, dtype="float64")
        mosaic, mbounds = create_mosaic([(tile, data)], nodata=0)
        np.testing.assert_array_equal(mosaic.data, data.data)
        assert tuple(mbounds) == pytest.approx(tuple(tile.bounds()))
