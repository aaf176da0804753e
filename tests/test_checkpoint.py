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


def test_continue_mode_skips_compute(spark, tmp_path):
    """Resume must skip the PROCESS, not just the write: a counting
    process (accumulator) must not run again for checkpointed tiles
    (ADVICE round 1: anti-join below the UDF only skipped the write)."""
    from mapchete_spark.plans.config import JobConfig
    from mapchete_spark.plans.job import execute, register_process

    acc = spark.sparkContext.accumulator(0)

    def counting_process(ctx):
        acc.add(1)
        return ctx.array

    register_process("counting", "raster", counting_process, 1)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = JobConfig.from_file(os.path.join(here, "configs", "hillshade.mapchete"))
    cfg.process = "counting"
    cfg.output["path"] = str(tmp_path / "cnt")
    cfg.output["dtype"] = None
    cfg.zoom_levels = [4]
    c1 = execute(spark, cfg, mode="continue")
    assert c1["process_z4"] > 0
    v1 = acc.value
    assert v1 >= c1["process_z4"]
    c2 = execute(spark, cfg, mode="continue")
    assert c2["process_z4"] == 0
    assert acc.value == v1, "process ran again for checkpointed tiles"


def test_partial_resume_recomputes_only_missing_with_halo(spark, tmp_path):
    """Truncate part of the checkpoint of a pixelbuffered job: the rerun
    must process exactly the missing tiles, and those tiles must still
    see their neighbors' strips (results equal the fresh run)."""
    from pyspark.sql import functions as F

    from mapchete_spark.plans.config import JobConfig
    from mapchete_spark.plans.job import execute

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = JobConfig.from_file(os.path.join(here, "configs", "hillshade.mapchete"))
    cfg.output["path"] = str(tmp_path / "hsr")
    cfg.zoom_levels = [5]
    execute(spark, cfg, mode="continue", store_path=str(tmp_path / "st"))
    fresh = {
        (r["tile_key"]): r["h"]
        for r in spark.read.parquet(str(tmp_path / "hsr" / "tiles"))
        .select("tile_key", F.md5("data").alias("h"))
        .collect()
    }

    # drop half the checkpoint AND the corresponding outputs
    import shutil

    ck_path = os.path.join(str(tmp_path / "st"), "checkpoint")
    ck = spark.read.parquet(ck_path)
    keep = ck.where(F.col("tile_key") % 2 == 0)
    keep.write.mode("overwrite").parquet(ck_path + "_new")
    shutil.rmtree(ck_path)
    shutil.move(ck_path + "_new", ck_path)
    out2 = str(tmp_path / "hsr2")
    cfg.output["path"] = out2
    counts = execute(spark, cfg, mode="continue", store_path=str(tmp_path / "st"))
    redone = spark.read.parquet(os.path.join(out2, "tiles")).select(
        "tile_key", F.md5("data").alias("h")
    )
    rows = redone.collect()
    assert counts["process_z5"] == len(rows) > 0
    for r in rows:
        assert r["tile_key"] % 2 == 1  # only the missing half recomputed
        assert fresh[r["tile_key"]] == r["h"]  # halo intact on resume
