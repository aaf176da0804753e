"""Continue-mode / resumability tests (FIXTURES.md harness notes:
run job, truncate part of the checkpoint, re-run, assert exactly the
missing tiles are recomputed)."""

import os

import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.checkpoint import JobStore, run_stage
from mapchete_spark.operators.rastertable import materialize_dem
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")
AOI = Bounds(0.0, 20.0, 45.0, 50.0)


@pytest.fixture()
def store(spark, tmp_path):
    return JobStore(spark, str(tmp_path / "job"))


def _dem(spark):
    return materialize_dem(spark, 5, GEO, bounds=AOI, hole=False)


def test_first_run_processes_all(spark, store, tmp_path):
    out = str(tmp_path / "out")
    n = run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
    total = _dem(spark).count()
    assert n == total
    assert spark.read.parquet(out).count() == total
    assert store.checkpoint().count() == total


def test_second_run_processes_zero(spark, store, tmp_path):
    out = str(tmp_path / "out")
    run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
    n2 = run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
    assert n2 == 0
    # output not duplicated
    assert spark.read.parquet(out).count() == _dem(spark).count()


def test_resume_processes_exactly_missing(spark, store, tmp_path):
    out = str(tmp_path / "out")
    run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
    # truncate half the checkpoint (simulate partial failure)
    ck_path = os.path.join(store.path, "checkpoint")
    ck = spark.read.parquet(ck_path)
    keep = ck.where(F.col("tile_key") % 2 == 0)
    kept_keys = {r["tile_key"] for r in keep.select("tile_key").collect()}
    keep.write.mode("overwrite").parquet(ck_path + "_new")
    import shutil

    shutil.rmtree(ck_path)
    shutil.move(ck_path + "_new", ck_path)

    n3 = run_stage(store, "dem_z5", lambda: _dem(spark), out_path=None)
    all_keys = {r["tile_key"] for r in _dem(spark).select("tile_key").collect()}
    assert n3 == len(all_keys - kept_keys)
    # now complete
    assert store.filter_todo(_dem(spark)).count() == 0


def test_overwrite_mode(spark, store):
    n1 = run_stage(store, "s", lambda: _dem(spark), mode="overwrite")
    n2 = run_stage(store, "s", lambda: _dem(spark), mode="overwrite")
    assert n1 == n2 > 0


def test_lineage_and_metrics_recorded(spark, store):
    run_stage(store, "dem_z5", lambda: _dem(spark))
    lin = store.lineage()
    assert lin.count() > 0
    assert lin.select("partition_id").distinct().count() >= 1
    cols = set(lin.columns)
    assert {"tile_key", "zoom", "partition_id", "n_src_rows", "payload_md5", "run_id"} <= cols
    m = store.metrics().collect()
    assert any(r["stage"] == "dem_z5" and r["n_rows"] > 0 for r in m)


def test_changed_since(spark, store):
    run_stage(store, "s1", lambda: _dem(spark).limit(10), mode="overwrite")
    first_run = store.run_id
    store2 = JobStore(spark, store.path)
    run_stage(store2, "s2", lambda: _dem(spark).limit(3), mode="overwrite")
    changed = store2.changed_since(first_run)
    assert changed.count() <= 3
