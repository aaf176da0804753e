"""Tile-directory export (PNG/npy tree + metadata) and GeoJSON index."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.process import process_hillshade, run_raster_process
from mapchete_spark.operators.rastertable import materialize_dem
from mapchete_spark.sources.tiledir_export import (
    decode_png_gray,
    encode_png,
    tile_index_geojson,
    write_tile_directory,
)
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")
AOI = Bounds(0.0, 20.0, 22.0, 40.0)


def test_png_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48), dtype=np.uint8)
    buf = encode_png(img)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    back = decode_png_gray(buf)
    np.testing.assert_array_equal(back, img)


def test_write_tile_directory_png(spark, tmp_path):
    dem = materialize_dem(spark, 4, GEO, bounds=AOI, hole=False)
    hs = run_raster_process(dem, GEO, process_hillshade, pixelbuffer=1)
    out = str(tmp_path / "tiles")
    n = write_tile_directory(hs, out, GEO, fmt="png")
    assert n > 0
    assert os.path.exists(os.path.join(out, "metadata.json"))
    # every written file decodes back to the engine's array
    rows = hs.collect()
    r = rows[0]
    p = os.path.join(out, str(r["zoom"]), str(r["tile_row"]), f"{r['tile_col']}.png")
    assert os.path.exists(p)
    img = decode_png_gray(open(p, "rb").read())
    expect = np.frombuffer(r["data"], dtype=r["dtype"]).reshape(256, 256)
    np.testing.assert_array_equal(img, expect)


def test_write_guard(spark, tmp_path):
    dem = materialize_dem(spark, 5, GEO, bounds=AOI, hole=False)
    with pytest.raises(ValueError):
        write_tile_directory(dem, str(tmp_path / "x"), GEO, max_tiles=1)


def test_float_tiles_export_npy(spark, tmp_path):
    dem = materialize_dem(spark, 3, GEO, bounds=AOI, hole=False)
    out = str(tmp_path / "npy")
    n = write_tile_directory(dem, out, GEO, fmt="png")  # float32 -> npy fallback
    r = dem.limit(1).collect()[0]
    p = os.path.join(out, str(r["zoom"]), str(r["tile_row"]), f"{r['tile_col']}.npy")
    assert os.path.exists(p)
    arr = np.load(p)
    assert arr.dtype == np.float32



@pytest.fixture(scope="module")
def export_runs(spark, tmp_path_factory):
    """The module's five heavy export scenarios (index job, single-file
    artifact, two compaction jobs, COG) are independent — run them
    CONCURRENTLY on the shared session; assertions run inside the
    thunks, failures re-raise per-test (conftest.run_concurrently)."""
    from tests.conftest import run_concurrently

    base = tmp_path_factory.mktemp("export")

    def tidx_geojson():
        d = base / "tidx"; d.mkdir()
        _run_tile_index_geojson(spark, d)

    def single_artifact():
        d = base / "single"; d.mkdir()
        _run_single_artifact(spark, d)

    def compact_serves():
        d = base / "cmp1"; d.mkdir()
        _run_compact_preserves(spark, d)

    def compact_zoom_subset():
        d = base / "cmp2"; d.mkdir()
        _run_compact_zoom_subset(spark, d)

    def cog():
        d = base / "cog"; d.mkdir()
        _run_cog(spark, d)

    return run_concurrently(dict(
        tidx_geojson=tidx_geojson, single_artifact=single_artifact,
        compact_serves=compact_serves,
        compact_zoom_subset=compact_zoom_subset, cog=cog,
    ), max_workers=5)


def _run_tile_index_geojson(spark, tmp_path):
    from mapchete_spark.plans.config import JobConfig
    from mapchete_spark.plans.job import execute, tile_index

    cfg = JobConfig.from_dict(
        dict(
            process="convert",
            zoom_levels=4,
            pyramid=dict(grid="geodetic"),
            input="dem",
            output=dict(path=str(tmp_path / "job"), dtype="float32", nodata=-9999.0),
            bounds=list(AOI),
        )
    )
    execute(spark, cfg, mode="overwrite")
    idx = tile_index(spark, str(tmp_path / "job"), 4)
    out = str(tmp_path / "index.geojson")
    n = tile_index_geojson(idx, out)
    gj = json.load(open(out))
    assert gj["type"] == "FeatureCollection" and len(gj["features"]) == n > 0
    f0 = gj["features"][0]
    ring = f0["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]


def test_tile_index_geojson(export_runs):
    from tests.conftest import assert_ok

    assert_ok(export_runs, "tidx_geojson")


def _run_single_artifact(spark, tmp_path):
        import json

        import numpy as np

        from mapchete_spark.operators.rastertable import (
            materialize_dem,
            row_to_array,
        )
        from mapchete_spark.sources.singlefile import write_single_artifact
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        pyr = TilePyramid("geodetic")
        aoi = Bounds(0.0, 20.0, 45.0, 50.0)
        dem = materialize_dem(spark, 5, pyr, bounds=aoi, hole=False)
        meta = write_single_artifact(dem, pyr, 5, str(tmp_path / "dem_z5"))
        arr = np.load(str(tmp_path / "dem_z5.npy"))
        assert arr.shape == tuple(meta["shape"])
        with open(str(tmp_path / "dem_z5.json")) as f:
            side = json.load(f)
        assert side["crs"] == "EPSG:4326"
        # golden: a tile's window of the artifact equals the tile payload
        row = dem.orderBy("tile_row", "tile_col").limit(1).collect()[0].asDict()
        tile_arr = np.asarray(row_to_array(row))
        r0 = int((side["bounds"][3] - (90.0 - row["tile_row"] * 5.625)) / -side["pixel_y_size"])
        c0 = int(((-180.0 + row["tile_col"] * 5.625) - side["bounds"][0]) / side["pixel_x_size"])
        window = arr[:, r0 : r0 + 256, c0 : c0 + 256]
        np.testing.assert_array_equal(window, tile_arr)
        # round 4: the sibling single-file GeoTIFF carries the same
        # pixels and georeferencing
        from mapchete_spark.sources.gtiff import decode_gtiff

        with open(str(tmp_path / "dem_z5.tif"), "rb") as f:
            tif_arr, tif_bounds, epsg, _ = decode_gtiff(f.read())
        np.testing.assert_array_equal(tif_arr, arr)
        assert epsg == 4326
        assert np.allclose(list(tif_bounds), side["bounds"])

class TestSingleFile:
    """S6 single-file output analog (reference gtiff.py:390-509)."""

    def test_write_single_artifact_matches_tiles(self, export_runs):
        from tests.conftest import assert_ok

        assert_ok(export_runs, "single_artifact")

    def test_threshold_guard(self, spark):
        import pytest

        from mapchete_spark.operators.rastertable import materialize_dem
        from mapchete_spark.sources.singlefile import (
            SingleFileTooLarge,
            assemble_single_array,
        )
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        pyr = TilePyramid("geodetic")
        dem = materialize_dem(spark, 5, pyr, bounds=Bounds(0.0, 20.0, 45.0, 50.0))
        with pytest.raises(SingleFileTooLarge):
            assemble_single_array(dem, pyr, 5, threshold_bytes=1024)


def test_png_gray_alpha_roundtrip():
    """S8 PNG_hillshade layout: 2-band gray+alpha tiles encode to a
    valid LA PNG (reference png_hillshade.py:40-41: gray + nodata
    alpha)."""
    import struct
    import zlib

    import numpy as np

    from mapchete_spark.sources.tiledir_export import encode_png

    rng = np.random.RandomState(4)
    gray = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    alpha = np.where(gray > 128, 255, 0).astype(np.uint8)
    la = np.dstack([gray, alpha])
    png = encode_png(la)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR color type 4 = grayscale + alpha
    w, h, depth, ctype = struct.unpack_from(">IIBB", png, 16)
    assert (w, h, depth, ctype) == (16, 16, 8, 4)
    # decode the scanlines back
    pos, idat = 8, b""
    while pos < len(png):
        (length,) = struct.unpack_from(">I", png, pos)
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 16 * 2 + 1
    got = np.frombuffer(
        b"".join(raw[i * stride + 1 : (i + 1) * stride] for i in range(16)),
        dtype=np.uint8,
    ).reshape(16, 16, 2)
    np.testing.assert_array_equal(got, la)


def _run_compact_preserves(spark, tmp_path):
        """Compaction shrinks the file count to the target bound, the
        row multiset is bit-identical, and the z-order serve point
        lookup still works on the rewritten layout."""
        import pyspark.sql.functions as F

        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute
        from mapchete_spark.sources.compact import (
            compact_tile_table,
            parquet_file_count,
        )

        out = str(tmp_path / "cj")
        cfg = JobConfig.from_dict(
            dict(
                process="convert",
                zoom_levels={"min": 4, "max": 5},
                pyramid={"grid": "geodetic"},
                input={"source": "dem", "hole": False},
                bounds=[0.0, 20.0, 45.0, 50.0],
                process_parameters={"scale_ratio": 1.0},
                output={"path": out, "format": "parquet_tiles"},
            )
        )
        execute(spark, cfg, mode="overwrite")
        tiles_path = f"{out}/tiles"
        before = spark.read.parquet(tiles_path)
        want = sorted(
            (r["zoom"], r["tile_row"], r["tile_col"], r["digest"])
            for r in before.select(
                "zoom", "tile_row", "tile_col", F.md5("data").alias("digest")
            ).collect()
        )
        n_rows = len(want)
        stats = compact_tile_table(spark, tiles_path, target_rows_per_file=16)
        assert stats["rows"] == n_rows
        assert stats["files_after"] <= math_ceil_files(n_rows, 16) + 2
        assert stats["files_after"] == parquet_file_count(tiles_path)
        after = spark.read.parquet(tiles_path)
        got = sorted(
            (r["zoom"], r["tile_row"], r["tile_col"], r["digest"])
            for r in after.select(
                "zoom", "tile_row", "tile_col", F.md5("data").alias("digest")
            ).collect()
        )
        assert got == want
        # serve point lookup still resolves on the compacted layout
        from mapchete_spark.sources.serve import TileReader

        r0 = after.limit(1).collect()[0]
        reader = TileReader(out)
        arr = reader.read_tile(
            int(r0["zoom"]), int(r0["tile_row"]), int(r0["tile_col"])
        )
        assert arr is not None and arr.size > 0

def _run_compact_zoom_subset(spark, tmp_path):
        """Regression (round-4 ADVICE): compacting only zoom 5 must
        rewrite zoom 5's partition in place and leave zoom 4's files
        and rows completely untouched — the round-3 whole-root swap
        silently deleted every unlisted zoom."""
        import os

        import pyspark.sql.functions as F

        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute
        from mapchete_spark.sources.compact import (
            compact_tile_table,
            parquet_file_count,
        )

        out = str(tmp_path / "cjz")
        cfg = JobConfig.from_dict(
            dict(
                process="convert",
                zoom_levels={"min": 4, "max": 5},
                pyramid={"grid": "geodetic"},
                input={"source": "dem", "hole": False},
                bounds=[0.0, 20.0, 45.0, 50.0],
                process_parameters={"scale_ratio": 1.0},
                output={"path": out, "format": "parquet_tiles"},
            )
        )
        execute(spark, cfg, mode="overwrite")
        tiles_path = f"{out}/tiles"

        def snapshot(zoom):
            return sorted(
                (r["tile_row"], r["tile_col"], r["digest"])
                for r in spark.read.parquet(tiles_path)
                .where(F.col("zoom") == zoom)
                .select(
                    "tile_row", "tile_col", F.md5("data").alias("digest")
                )
                .collect()
            )

        def zoom_files(zoom):
            zdir = os.path.join(tiles_path, f"zoom={zoom}")
            return sorted(
                os.path.join(root, f)
                for root, _d, fs in os.walk(zdir)
                for f in fs
                if f.endswith(".parquet")
            )

        z4_rows, z5_rows = snapshot(4), snapshot(5)
        z4_files_before = zoom_files(4)
        assert z4_rows and z5_rows
        stats = compact_tile_table(
            spark, tiles_path, target_rows_per_file=16, zooms=[5]
        )
        # zoom 4: identical files on disk, identical rows
        assert zoom_files(4) == z4_files_before
        assert snapshot(4) == z4_rows
        # zoom 5: same rows, rewritten files
        assert snapshot(5) == z5_rows
        assert stats["files_after"] == parquet_file_count(tiles_path)
        # no leftover temp/old dirs (parent-level or inside the root)
        parent = os.path.dirname(tiles_path)
        leftovers = [
            p for p in os.listdir(parent)
            if "__compact" in p or "__old" in p
        ]
        assert not leftovers
        assert not [p for p in os.listdir(tiles_path) if p.startswith("_old_")]

        # Crash-window safety (round-4 ADVICE): a stranded staging dir
        # is '_'-prefixed with NO '=' in the name, so partition
        # discovery hides it instead of parsing it as a conflicting
        # partition column — the table stays readable and
        # row-identical mid-swap.
        import shutil

        shutil.copytree(
            os.path.join(tiles_path, "zoom=5"),
            os.path.join(tiles_path, "_old_zoom_5"),
        )
        assert snapshot(5) == z5_rows
        assert snapshot(4) == z4_rows


class TestCompaction:
    def test_compact_preserves_rows_and_serves(self, export_runs):
        from tests.conftest import assert_ok

        assert_ok(export_runs, "compact_serves")

    def test_compact_zoom_subset_keeps_other_zooms(self, export_runs):
        from tests.conftest import assert_ok

        assert_ok(export_runs, "compact_zoom_subset")


def math_ceil_files(n_rows, target):
    import math

    # per-zoom ceil sums can exceed one global ceil by (n_zooms - 1)
    return math.ceil(n_rows / target) + 2


def _run_cog(spark, tmp_path):
        """write_single_cog: IFD 0 equals the base-zoom mosaic; each
        chained reduced-resolution IFD equals the corresponding
        overview zoom's mosaic window over the base bounds; all levels
        share the base georeferencing."""
        import numpy as np

        from mapchete_spark.operators.overviews import build_overviews
        from mapchete_spark.operators.rastertable import materialize_dem
        from mapchete_spark.sources.gtiff import decode_gtiff_all
        from mapchete_spark.sources.singlefile import (
            assemble_single_array,
            write_single_cog,
        )
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        pyr = TilePyramid("geodetic")
        aoi = Bounds(0.0, 20.0, 45.0, 50.0)
        # base zoom 4 (12 tiles) exercises the same 3-IFD chained
        # halving as zoom 5 (48 tiles) at a quarter of the work
        dem = materialize_dem(spark, 4, pyr, bounds=aoi, hole=False)
        levels = build_overviews(dem, pyr, 4, 2, resampling="average")
        table = dem
        for _z, df in levels:
            if _z != 4:
                table = table.unionByName(df)
        # the COG write plus three assemble_single_array reads below
        # would each recompute the synthetic-DEM + overview chain
        table = table.cache()
        meta = write_single_cog(table, pyr, [4, 3, 2], str(tmp_path / "cog"))
        with open(str(tmp_path / "cog.tif"), "rb") as f:
            ifds = decode_gtiff_all(f.read())
        assert len(ifds) == 3
        base_arr, base_bounds, nodata = assemble_single_array(table, pyr, 4)
        np.testing.assert_array_equal(ifds[0][0], base_arr.filled(nodata))
        assert np.allclose(list(ifds[0][1]), list(base_bounds))
        # each overview IFD: same bounds, halved raster, values from
        # that zoom's own mosaic
        prev_shape = ifds[0][0].shape
        for k, (arr, bnds, epsg, nod) in enumerate(ifds[1:], start=1):
            assert np.allclose(list(bnds), list(base_bounds))
            assert arr.shape[1] * 2**k == prev_shape[1]
            z = 4 - k
            ov_arr, ov_bounds, _ = assemble_single_array(table, pyr, z)
            px, py = pyr.pixel_x_size(z), pyr.pixel_y_size(z)
            c0 = int(round((base_bounds.left - ov_bounds.left) / px))
            r0 = int(round((ov_bounds.top - base_bounds.top) / py))
            np.testing.assert_array_equal(
                arr,
                ov_arr.filled(nodata)[
                    :, r0 : r0 + arr.shape[1], c0 : c0 + arr.shape[2]
                ],
            )


class TestSingleCog:
    def test_cog_levels_match_overview_mosaics(self, export_runs):
        from tests.conftest import assert_ok

        assert_ok(export_runs, "cog")
