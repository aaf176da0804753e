"""TileDirectory (foreign-pyramid) input: mercator DEM tile table read
onto geodetic target tiles with zoom matching + closed-form warp;
values verified against the analytic DEM sampled directly."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.rastertable import materialize_dem, row_to_array
from mapchete_spark.operators.tiledir import read_tiledir, target_source_pairs
from mapchete_spark.raster.dem import elevation
from mapchete_spark.tilegrid import Bounds, TilePyramid
from mapchete_spark.tilegrid.zoom_match import tile_to_zoom_level

GEOD = TilePyramid("geodetic")
MERC = TilePyramid("mercator")
AOI_GEOD = Bounds(5.0, 30.0, 25.0, 45.0)


@pytest.fixture(scope="module")
def merc_dem(spark):
    """Mercator DEM tile table (F4 fixture) covering the AOI at the
    matched zoom for geodetic z5 targets (plus one extra level)."""
    from mapchete_spark.geometry.reproject import geodetic_to_mercator

    x0, y0 = geodetic_to_mercator(np.array([AOI_GEOD.left]), np.array([AOI_GEOD.bottom]))
    x1, y1 = geodetic_to_mercator(np.array([AOI_GEOD.right]), np.array([AOI_GEOD.top]))
    aoi_m = Bounds(float(x0[0]) - 1e5, float(y0[0]) - 1e5, float(x1[0]) + 1e5, float(y1[0]) + 1e5)
    dfs = [
        materialize_dem(spark, z, MERC, bounds=aoi_m, hole=False) for z in (4, 5, 6)
    ]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)
    df = df.cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def targets(spark):
    tiles = list(GEOD.tiles_from_bounds(AOI_GEOD, 5))
    return spark.createDataFrame(
        [(t.zoom, t.row, t.col) for t in tiles],
        "zoom int, tile_row long, tile_col long",
    )


def test_pairs_use_matched_zoom(spark, targets):
    pairs = target_source_pairs(targets, GEOD, MERC).collect()
    assert pairs
    zooms = {r["src_zoom"] for r in pairs}
    # geodetic z5 at mid latitudes should match mercator z4-6
    assert zooms <= {4, 5, 6}
    t = GEOD.tile(5, 10, 32)
    expect = tile_to_zoom_level(t, MERC, matching_method="gdal")
    got = {r["src_zoom"] for r in pairs if r["target_key"] == (5 << 54) | (10 << 27) | 32}
    if got:
        assert got == {expect}


def test_warped_values_match_analytic(spark, targets, merc_dem):
    out = read_tiledir(spark, targets, merc_dem, GEOD, MERC).collect()
    assert out
    r = out[len(out) // 2]
    t = GEOD.tile(r["zoom"], r["tile_row"], r["tile_col"])
    got = row_to_array(r.asDict())
    b = t.bounds()
    h, w = t.shape()
    xs = b.left + (np.arange(w) + 0.5) * (b.width / w)
    ys = b.top - (np.arange(h) + 0.5) * (b.height / h)
    gx, gy = np.meshgrid(xs, ys)
    direct = elevation(gx, gy)
    # nearest-neighbor warp from a pyramid of comparable resolution:
    # mean abs error bounded by the field's variation over one src pixel
    err = np.abs(got[0].data.astype(np.float64) - direct)
    assert float(np.median(err)) < 10.0


def test_output_covers_targets(spark, targets, merc_dem):
    out = read_tiledir(spark, targets, merc_dem, GEOD, MERC)
    n_out = out.select("tile_row", "tile_col").distinct().count()
    assert n_out == targets.count()


def test_fallback_rounds(spark, merc_dem):
    # targets far outside the materialized AOI get nothing, with or
    # without fallback (source has no data there at any zoom)
    far = spark.createDataFrame(
        [(5, 2, 2)], "zoom int, tile_row long, tile_col long"
    )
    out = read_tiledir(
        spark, far, merc_dem, GEOD, MERC, fallback_to_higher_zoom=True,
        max_fallback_rounds=2,
    )
    assert out.count() == 0
