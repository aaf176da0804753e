"""Z4 output-tile split and Z2 overview refresh tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.outputsplit import split_to_output_tiles
from mapchete_spark.operators.overviews import build_overviews
from mapchete_spark.operators.rastertable import (
    encode_array,
    materialize_dem,
    row_to_array,
)
from mapchete_spark.operators.refresh import (
    dirty_parents,
    parent_key_col,
    refresh_overviews,
)
from mapchete_spark.raster.dem import DEM_NODATA, dem_tile
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")
AOI = Bounds(0.0, 20.0, 45.0, 50.0)


class TestOutputSplit:
    def test_meta4_to_base(self, spark):
        meta = TilePyramid("geodetic", metatiling=4)
        dem = materialize_dem(spark, 5, meta, bounds=AOI, hole=False)
        n_meta = dem.count()
        out = split_to_output_tiles(dem, meta, GEO)
        rows = out.collect()
        # interior metatiles split into 16 base tiles each
        assert len(rows) >= n_meta * 4
        # every output tile matches the direct analytic window
        for r in rows[:5]:
            t = GEO.tile(r["zoom"], r["tile_row"], r["tile_col"])
            direct = dem_tile(t, hole=False)
            got = row_to_array(r.asDict())
            assert got.shape == (1, 256, 256)
            np.testing.assert_allclose(
                got.data, direct.filled(DEM_NODATA), atol=1e-5
            )

    def test_bad_metatiling_raises(self, spark):
        meta = TilePyramid("geodetic", metatiling=2)
        bigger = TilePyramid("geodetic", metatiling=4)
        dem = materialize_dem(spark, 4, meta, bounds=AOI, hole=False)
        with pytest.raises(ValueError):
            split_to_output_tiles(dem, meta, bigger)


class TestRefresh:
    def test_parent_key_arithmetic(self, spark):
        df = spark.createDataFrame(
            [((5 << 54) | (11 << 27) | 7,)], "tile_key long"
        )
        got = df.select(parent_key_col(F.col("tile_key")).alias("p")).collect()[0]["p"]
        assert got == (4 << 54) | (5 << 27) | 3

    def test_dirty_parents_dedup(self, spark):
        keys = [
            (5 << 54) | (10 << 27) | 20,
            (5 << 54) | (10 << 27) | 21,  # same parent
            (5 << 54) | (12 << 27) | 20,
        ]
        df = spark.createDataFrame([(k,) for k in keys], "tile_key long")
        assert dirty_parents(df).count() == 2

    def test_refresh_only_affected(self, spark, tmp_path):
        # build z5 level + overviews 4..3
        dem = materialize_dem(spark, 5, GEO, bounds=AOI, hole=False).cache()
        levels = {5: dem}
        for z, df in build_overviews(dem, GEO, 5, 3, resampling="average"):
            levels[z] = df.cache()
            levels[z].count()

        # 'change' two sibling z5 tiles (same parent): scale their data
        base_rows = dem.limit(1).collect()[0]
        r0, c0 = base_rows["tile_row"], base_rows["tile_col"]
        changed = dem.where(
            (F.col("tile_row") == r0) & (F.col("tile_col").isin(c0))
        )
        changed_keys = changed.select("tile_key")

        refreshed = refresh_overviews(
            lambda z: levels[z], changed_keys, GEO, 5, 3, resampling="average"
        )
        zs = [z for z, _ in refreshed]
        assert zs == [4, 3]
        n4 = refreshed[0][1].count()
        n3 = refreshed[1][1].count()
        # exactly one dirty parent per level for a single changed tile
        assert n4 == 1 and n3 == 1
        # refreshed parent equals the originally-built parent (data
        # unchanged -> reduce reproduces the same tile, proving the
        # unchanged SIBLINGS were included in the reduce)
        ref4 = refreshed[0][1].collect()[0]
        orig4 = levels[4].where(
            (F.col("tile_row") == ref4["tile_row"])
            & (F.col("tile_col") == ref4["tile_col"])
        ).collect()[0]
        np.testing.assert_array_equal(
            row_to_array(ref4.asDict()).filled(-9999),
            row_to_array(orig4.asDict()).filled(-9999),
        )
        dem.unpersist()
