"""Continue-mode / resumability tests (FIXTURES.md harness notes:
run job, truncate part of the checkpoint, re-run, assert exactly the
missing tiles are recomputed).

The eight scenarios are independent (each owns its JobStore/out dir),
so a module fixture runs them CONCURRENTLY on the shared session (the
parity-pool pattern); a scenario's exception is stored and re-raised
by the owning test only."""

import os
import shutil
import traceback
from concurrent.futures import ThreadPoolExecutor

import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.checkpoint import JobStore, run_stage
from mapchete_spark.operators.rastertable import materialize_dem
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")
AOI = Bounds(0.0, 20.0, 45.0, 50.0)
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dem(spark):
    return materialize_dem(spark, 5, GEO, bounds=AOI, hole=False)


@pytest.fixture(scope="module")
def scenarios(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt")

    def first_run():
        store = JobStore(spark, str(base / "s1" / "job"))
        out = str(base / "s1" / "out")
        n = run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
        return dict(
            n=n,
            total=_dem(spark).count(),
            written=spark.read.parquet(out).count(),
            ck=store.checkpoint().count(),
        )

    def second_run():
        store = JobStore(spark, str(base / "s2" / "job"))
        out = str(base / "s2" / "out")
        run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
        n2 = run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
        return dict(
            n2=n2,
            written=spark.read.parquet(out).count(),
            total=_dem(spark).count(),
        )

    def resume_missing():
        store = JobStore(spark, str(base / "s3" / "job"))
        out = str(base / "s3" / "out")
        run_stage(store, "dem_z5", lambda: _dem(spark), out_path=out)
        ck_path = os.path.join(store.path, "checkpoint")
        ck = spark.read.parquet(ck_path)
        keep = ck.where(F.col("tile_key") % 2 == 0)
        kept_keys = {r["tile_key"] for r in keep.select("tile_key").collect()}
        keep.write.mode("overwrite").parquet(ck_path + "_new")
        shutil.rmtree(ck_path)
        shutil.move(ck_path + "_new", ck_path)
        n3 = run_stage(store, "dem_z5", lambda: _dem(spark), out_path=None)
        all_keys = {
            r["tile_key"] for r in _dem(spark).select("tile_key").collect()
        }
        return dict(
            n3=n3,
            missing=len(all_keys - kept_keys),
            todo=store.filter_todo(_dem(spark)).count(),
        )

    def overwrite():
        store = JobStore(spark, str(base / "s4" / "job"))
        n1 = run_stage(store, "s", lambda: _dem(spark), mode="overwrite")
        n2 = run_stage(store, "s", lambda: _dem(spark), mode="overwrite")
        return dict(n1=n1, n2=n2)

    def lineage():
        store = JobStore(spark, str(base / "s5" / "job"))
        run_stage(store, "dem_z5", lambda: _dem(spark))
        lin = store.lineage()
        return dict(
            n=lin.count(),
            parts=lin.select("partition_id").distinct().count(),
            cols=set(lin.columns),
            metrics=[r.asDict() for r in store.metrics().collect()],
        )

    def changed_since():
        store = JobStore(spark, str(base / "s6" / "job"))
        run_stage(store, "s1", lambda: _dem(spark).limit(10), mode="overwrite")
        first = store.run_id
        store2 = JobStore(spark, store.path)
        run_stage(store2, "s2", lambda: _dem(spark).limit(3), mode="overwrite")
        return dict(changed=store2.changed_since(first).count())

    def continue_skips_compute():
        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute, register_process

        acc = spark.sparkContext.accumulator(0)

        def counting_process(ctx):
            acc.add(1)
            return ctx.array

        register_process("counting", "raster", counting_process, 1)
        cfg = JobConfig.from_file(
            os.path.join(HERE, "configs", "hillshade.mapchete")
        )
        cfg.process = "counting"
        cfg.output["path"] = str(base / "s7" / "cnt")
        cfg.output["dtype"] = None
        cfg.zoom_levels = [4]
        c1 = execute(spark, cfg, mode="continue")
        v1 = acc.value
        c2 = execute(spark, cfg, mode="continue")
        return dict(c1=c1["process_z4"], v1=v1, c2=c2["process_z4"],
                    v2=acc.value)

    def partial_resume_halo():
        from mapchete_spark.plans.config import JobConfig
        from mapchete_spark.plans.job import execute

        d = base / "s8"
        cfg = JobConfig.from_file(
            os.path.join(HERE, "configs", "hillshade.mapchete")
        )
        cfg.output["path"] = str(d / "hsr")
        cfg.zoom_levels = [5]
        execute(spark, cfg, mode="continue", store_path=str(d / "st"))
        fresh = {
            (r["tile_key"]): r["h"]
            for r in spark.read.parquet(str(d / "hsr" / "tiles"))
            .select("tile_key", F.md5("data").alias("h"))
            .collect()
        }
        ck_path = os.path.join(str(d / "st"), "checkpoint")
        ck = spark.read.parquet(ck_path)
        keep = ck.where(F.col("tile_key") % 2 == 0)
        keep.write.mode("overwrite").parquet(ck_path + "_new")
        shutil.rmtree(ck_path)
        shutil.move(ck_path + "_new", ck_path)
        out2 = str(d / "hsr2")
        cfg.output["path"] = out2
        counts = execute(spark, cfg, mode="continue", store_path=str(d / "st"))
        rows = [
            r.asDict()
            for r in spark.read.parquet(os.path.join(out2, "tiles"))
            .select("tile_key", F.md5("data").alias("h"))
            .collect()
        ]
        return dict(fresh=fresh, rows=rows, n=counts["process_z5"])

    thunks = dict(
        first_run=first_run, second_run=second_run,
        resume_missing=resume_missing, overwrite=overwrite,
        lineage=lineage, changed_since=changed_since,
        continue_skips_compute=continue_skips_compute,
        partial_resume_halo=partial_resume_halo,
    )

    def run(item):
        key, fn = item
        try:
            return key, ("ok", fn())
        except Exception:
            return key, ("err", traceback.format_exc())

    with ThreadPoolExecutor(max_workers=6) as pool:
        return dict(pool.map(run, thunks.items()))


def _res(scenarios, key):
    status, payload = scenarios[key]
    assert status == "ok", f"{key} scenario raised:\n{payload}"
    return payload


def test_first_run_processes_all(scenarios):
    r = _res(scenarios, "first_run")
    assert r["n"] == r["total"]
    assert r["written"] == r["total"]
    assert r["ck"] == r["total"]


def test_second_run_processes_zero(scenarios):
    r = _res(scenarios, "second_run")
    assert r["n2"] == 0
    # output not duplicated
    assert r["written"] == r["total"]


def test_resume_processes_exactly_missing(scenarios):
    r = _res(scenarios, "resume_missing")
    assert r["n3"] == r["missing"]
    # now complete
    assert r["todo"] == 0


def test_overwrite_mode(scenarios):
    r = _res(scenarios, "overwrite")
    assert r["n1"] == r["n2"] > 0


def test_lineage_and_metrics_recorded(scenarios):
    r = _res(scenarios, "lineage")
    assert r["n"] > 0
    assert r["parts"] >= 1
    assert {
        "tile_key", "zoom", "partition_id", "n_src_rows", "payload_md5",
        "run_id",
    } <= r["cols"]
    assert any(
        m["stage"] == "dem_z5" and m["n_rows"] > 0 for m in r["metrics"]
    )


def test_changed_since(scenarios):
    assert _res(scenarios, "changed_since")["changed"] <= 3


def test_continue_mode_skips_compute(scenarios):
    """Resume must skip the PROCESS, not just the write: a counting
    process (accumulator) must not run again for checkpointed tiles
    (ADVICE round 1: anti-join below the UDF only skipped the write)."""
    r = _res(scenarios, "continue_skips_compute")
    assert r["c1"] > 0
    assert r["v1"] >= r["c1"]
    assert r["c2"] == 0
    assert r["v2"] == r["v1"], "process ran again for checkpointed tiles"


def test_partial_resume_recomputes_only_missing_with_halo(scenarios):
    """Truncate part of the checkpoint of a pixelbuffered job: the rerun
    must process exactly the missing tiles, and those tiles must still
    see their neighbors' strips (results equal the fresh run)."""
    r = _res(scenarios, "partial_resume_halo")
    assert r["n"] == len(r["rows"]) > 0
    for row in r["rows"]:
        assert row["tile_key"] % 2 == 1  # only the missing half recomputed
        assert r["fresh"][row["tile_key"]] == row["h"]  # halo intact
