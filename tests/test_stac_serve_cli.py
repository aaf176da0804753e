"""S12 STAC writer, J10 serve/point-lookup, and CLI breadth (J9)."""

import json
import os
import subprocess

# CLI subprocesses boot their own JVM; a lean one (6 threads, 4g)
# starts seconds faster than the 32-thread default and the smoke
# jobs don't need more
_LEAN_CLI_ENV = dict(os.environ, SPARK_GRAFT_CPUS="6", SPARK_DRIVER_MEM="4g")

import sys

import numpy as np
import pytest

from mapchete_spark.operators.rastertable import materialize_dem, row_to_array
from mapchete_spark.tilegrid import Bounds, TilePyramid

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GEO = TilePyramid("geodetic")
AOI = Bounds(0.0, 20.0, 45.0, 50.0)


@pytest.fixture(scope="module")
def output(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "job")
    dem = materialize_dem(spark, 4, GEO, bounds=AOI, hole=False)
    dem.write.mode("overwrite").partitionBy("zoom").parquet(
        os.path.join(out, "tiles")
    )
    with open(os.path.join(out, "metadata.json"), "w") as f:
        json.dump(dict(pyramid=GEO.to_dict(), dtype="float32", nodata=-9999.0), f)
    return out


class TestStac:
    def test_item_shape(self):
        from mapchete_spark.sources.stac import tile_table_stac_item

        item = tile_table_stac_item(
            "test-item", GEO, [3, 4, 5], "/data/out", bounds=AOI,
            timestamp="2026-01-01T00:00:00Z",
        )
        assert item["stac_version"] == "1.0.0"
        assert "tiled-assets" in item["stac_extensions"][0]
        tms = item["properties"]["tiles:tile_matrix_sets"]["WorldCRS84Quad"]
        assert [m["identifier"] for m in tms["tileMatrix"]] == ["3", "4", "5"]
        m4 = tms["tileMatrix"][1]
        assert m4["matrixWidth"] == 32 and m4["matrixHeight"] == 16
        assert m4["topLeftCorner"] == [-180.0, 90.0]
        # asset template uses the tiled-assets placeholder names
        assert "{TileMatrix}" in item["asset_templates"]["bands"]["href"]
        assert item["bbox"] == [0.0, 20.0, 45.0, 50.0]

    def test_stac_cli(self, output):
        res = subprocess.run(
            [sys.executable, os.path.join(HERE, "jobs", "stac.py"), output],
            capture_output=True, text=True, env=_LEAN_CLI_ENV, timeout=120,
        )
        assert res.returncode == 0, res.stderr[-1000:]
        with open(os.path.join(output, "stac_item.json")) as f:
            item = json.load(f)
        assert item["type"] == "Feature"
        zooms = [
            int(m["identifier"])
            for m in list(item["properties"]["tiles:tile_matrix_sets"].values())[0][
                "tileMatrix"
            ]
        ]
        assert zooms == [4]


class TestServe:
    def test_tile_reader_roundtrip(self, spark, output):
        from mapchete_spark.sources.serve import TileReader

        reader = TileReader(output)
        dem = materialize_dem(spark, 4, GEO, bounds=AOI, hole=False)
        row = dem.orderBy("tile_row", "tile_col").limit(1).collect()[0].asDict()
        got = reader.read_tile(4, row["tile_row"], row["tile_col"])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(row_to_array(row)))
        assert reader.read_tile(4, 0, 0) is None  # outside AOI
        # LRU: second read served from cache
        reader.read_tile(4, row["tile_row"], row["tile_col"])
        assert reader.cache_info().hits >= 1

    def test_tile_png(self, output):
        from mapchete_spark.sources.serve import TileReader
        from mapchete_spark.sources.tiledir_export import decode_png_gray

        reader = TileReader(output)
        png = reader.tile_png(4, 3, 16)
        assert png and png[:8] == b"\x89PNG\r\n\x1a\n"
        arr = decode_png_gray(png)
        assert arr.shape == (256, 256)

    def test_http_serve(self, output):
        import threading
        import time
        import urllib.request

        from mapchete_spark.sources import serve as srv

        port = 58231
        t = threading.Thread(
            target=srv.serve, args=(output, port), daemon=True
        )
        t.start()
        time.sleep(1.0)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/4/3/16.png", timeout=10
        ) as r:
            body = r.read()
        assert r.status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        with pytest.raises(Exception):
            urllib.request.urlopen(f"http://127.0.0.1:{port}/4/0/0.png", timeout=10)


class TestCliBreadth:
    def test_processes_cli(self):
        res = subprocess.run(
            [sys.executable, os.path.join(HERE, "jobs", "processes.py")],
            capture_output=True, text=True, env=_LEAN_CLI_ENV, timeout=60,
        )
        assert res.returncode == 0
        procs = json.loads(res.stdout)
        assert {"convert", "hillshade", "contours", "clip"} <= set(procs)

    def test_formats_cli(self):
        res = subprocess.run(
            [sys.executable, os.path.join(HERE, "jobs", "formats.py")],
            capture_output=True, text=True, env=_LEAN_CLI_ENV, timeout=60,
        )
        assert res.returncode == 0
        fmts = json.loads(res.stdout)
        assert "parquet_tiles" in fmts and "stac_item" in fmts

    def test_create_cli(self, tmp_path):
        cfgp = str(tmp_path / "new.mapchete")
        procp = str(tmp_path / "new_process.py")
        res = subprocess.run(
            [sys.executable, os.path.join(HERE, "jobs", "create.py"), cfgp, procp],
            capture_output=True, text=True, env=_LEAN_CLI_ENV, timeout=60,
        )
        assert res.returncode == 0, res.stderr[-500:]
        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import resolve_process

        cfg = JobConfig.from_file(cfgp)
        kind, fn, _ = resolve_process(cfg)
        assert kind == "raster"

    def test_cp_and_rm_cli(self, spark, output, tmp_path):
        from tests.conftest import run_cli_inproc

        dst = str(tmp_path / "copy")
        rc, out_txt = run_cli_inproc(
            "cp", [output, dst, "--zoom", "4", "--bounds", "0", "20", "22", "50"]
        )
        assert rc == 0
        n_copied = json.loads(out_txt.strip().splitlines()[-1])["tiles_copied"]
        assert 0 < n_copied

        rc, out_txt = run_cli_inproc(
            "rm", [dst, "--zoom", "4", "--bounds", "0", "20", "11", "50"]
        )
        assert rc == 0
        stats = json.loads(out_txt.strip().splitlines()[-1])
        assert stats["tiles_removed"] > 0
        assert stats["tiles_kept"] + stats["tiles_removed"] == n_copied


class TestExecuteIndexCli:
    def test_execute_then_index_cli(self, spark, tmp_path):
        """J9 end-to-end: execute a config, then index the output.
        Runs IN-PROCESS on the shared session — the true spark-submit
        subprocess path is covered once, canonically, by the
        cli_execute contract query (a second ~25s JVM boot here bought
        no extra coverage)."""
        import shutil

        from tests.conftest import run_cli_inproc

        cfg_src = os.path.join(HERE, "configs", "hillshade.mapchete")
        cfg = str(tmp_path / "job.mapchete")
        shutil.copy(cfg_src, cfg)
        out = str(tmp_path / "out")
        rc, out_txt = run_cli_inproc(
            "execute", [cfg, "--mode", "overwrite", "--zoom", "4",
                        "--out", out]
        )
        assert rc == 0
        stages = json.loads(out_txt.strip().splitlines()[-1])["stages"]
        assert stages["process_z4"] > 0

        rc, out_txt = run_cli_inproc(
            "index",
            [out, "--zoom", "4", "--dest", str(tmp_path / "idx"),
             "--geojson", "--gpkg"],
        )
        assert rc == 0
        assert "index rows" in out_txt
        # round 5: footprint index sidecars (reference: mapchete index
        # --geojson/--gpkg writes {zoom}.geojson / {zoom}.gpkg)
        gj = json.load(open(os.path.join(str(tmp_path / "idx"), "4.geojson")))
        assert gj["type"] == "FeatureCollection" and gj["features"]
        from mapchete_spark.sources.gpkg import read_gpkg

        header, feats = read_gpkg(
            os.path.join(str(tmp_path / "idx"), "4.gpkg")
        )
        assert header["geometry_type"] == "POLYGON"
        assert header["features_count"] == len(gj["features"]) == len(feats)


class TestCompactCli:
    def test_compact_cli_smoke(self, spark, tmp_path):
        """jobs/compact.py rewrites a real output in a subprocess and
        reports the file counts; rows conserved."""
        from pyspark.sql import functions as F

        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute as run_job

        out = str(tmp_path / "cjob")
        cfg = JobConfig.from_dict(
            dict(
                process="convert",
                zoom_levels=[4],
                pyramid={"grid": "geodetic"},
                input={"source": "dem", "hole": False},
                bounds=[0.0, 0.0, 90.0, 45.0],
                process_parameters={"scale_ratio": 1.0},
                output={"path": out, "format": "parquet_tiles"},
            )
        )
        run_job(spark, cfg, mode="overwrite")
        n_before = spark.read.parquet(f"{out}/tiles").count()
        from tests.conftest import run_cli_inproc

        rc, out_txt = run_cli_inproc("compact", [out, "--target-rows", "8"])
        assert rc == 0
        stats = json.loads(out_txt.strip().splitlines()[-1])
        assert stats["status"] == "done"
        assert stats["rows"] == n_before
        assert spark.read.parquet(f"{out}/tiles").count() == n_before


def test_parse_tile_path_shapes():
    """Both route shapes resolve to the same tile: the short dev route
    and the reference's WMTS-simple layout
    (mapchete/cli/mapchete/serve.py:116-139)."""
    import pytest as _pytest

    from mapchete_spark.sources.serve import parse_tile_path

    assert parse_tile_path("/5/3/7.png") == (5, 3, 7)
    assert parse_tile_path(
        "/wmts_simple/1.0.0/myjob/default/WGS84/5/3/7.png"
    ) == (5, 3, 7)
    assert parse_tile_path(
        "/wmts_simple/1.0.0/myjob/default/g/0/0/0.tif"
    ) == (0, 0, 0)
    for bad in [
        "/wmts_simple/2.0.0/x/default/g/1/2/3.png",
        "/wmts_simple/1.0.0/x/styled/g/1/2/3.png",
        "/a/b",
        "/wmts_simple/1.0.0/x/default/1/2/3.png",
    ]:
        with _pytest.raises(ValueError):
            parse_tile_path(bad)


def test_execute_cli_single_tile(spark, tmp_path):
    """J9 + §3.2: 'execute --tile Z R C' runs one tile through
    execute_tile and reports its row count — the reference's
    'mapchete execute --tile' (cli/options.py opt_tile)."""
    import json as _json
    import shutil

    from tests.conftest import run_cli_inproc

    cfg_src = os.path.join(HERE, "configs", "hillshade.mapchete")
    cfg = str(tmp_path / "job.mapchete")
    shutil.copy(cfg_src, cfg)
    rc, out_txt = run_cli_inproc(
        "execute", [cfg, "--zoom", "4", "--tile", "4", "4", "17",
                    "--out", str(tmp_path / "o")]
    )
    assert rc == 0
    res = _json.loads(out_txt.strip().splitlines()[-1])
    assert res["tile"] == [4, 4, 17] and res["rows"] == 1
