#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement; this file holds the §1.4 noop-sink isolation runs, plan
captures, and sub-stage timings cited in OPTIMIZATION_r07.md).

Subcommands:
  sf [names...]        time each sf bench query (noop sink), N repeats
  explain [names...]   dump .explain('formatted') to plans/r07/
  stages               sub-stage timing of the three throughput workloads
  fullmode             bench.py-shaped run to study session-state drag
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
REPEATS = int(os.environ.get("BX_REPEATS", 3))
PLAN_DIR = os.environ.get("BX_PLAN_DIR", "plans/r07")


def _spark():
    os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)
    from mapchete_spark.session import get_spark

    return get_spark(
        "bench_extra", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _bench_query_names():
    import bench

    return list(bench.sf_queries().keys())


def cmd_sf(args):
    import bench

    spark = _spark()
    spark.range(1000).selectExpr("sum(id)").collect()
    names = args or _bench_query_names()
    qs = bench.sf_queries()
    # warm pass at sf0.001 (same as bench.py)
    for n in names:
        qs[n](spark, "/root/testdata/sf0.001").count()
    out = {}
    for n in names:
        ts = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(f"bx:{n}")
            t0 = time.time()
            qs[n](spark, SF_DIR).count()
            ts.append(round(time.time() - t0, 3))
        out[n] = ts
        print(n, ts, flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_explain(args):
    import io
    from contextlib import redirect_stdout

    import bench

    spark = _spark()
    os.makedirs(PLAN_DIR, exist_ok=True)
    suffix = os.environ.get("BX_PLAN_SUFFIX", "before")
    names = args or _bench_query_names()
    qs = bench.sf_queries()
    for n in names:
        df = qs[n](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(PLAN_DIR, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path, flush=True)
    spark.stop()


def cmd_explain_tp(args):
    """Plan capture for the three throughput workloads (the parts that
    are lazy DataFrames; assign_shards' internal passes are actions)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    import bench

    spark = _spark()
    os.makedirs(PLAN_DIR, exist_ok=True)
    suffix = os.environ.get("BX_PLAN_SUFFIX", "before")

    from mapchete_spark.functions.repetition import repetition_stats
    from mapchete_spark.operators.assign import assign_point_tiles
    from mapchete_spark.operators.process import (
        process_hillshade,
        run_raster_process,
    )
    from mapchete_spark.operators.pyramid import (
        reduce_docs_to_tiles,
        rollup_to_zoom,
    )
    from mapchete_spark.operators.rastertable import materialize_dem
    from mapchete_spark.sources.tables import synthetic_docs
    from mapchete_spark.tilegrid import Bounds, TilePyramid

    docs = synthetic_docs(spark, bench.BENCH_DOCS)
    assigned = assign_point_tiles(docs, [12])
    base = reduce_docs_to_tiles(assigned, {"n_docs": F.count(F.lit(1))})
    top = rollup_to_zoom(base, 12, 0, {"n_docs": F.sum("n_docs")})
    pyr = TilePyramid("geodetic")
    dem = materialize_dem(
        spark, bench.HILLSHADE_ZOOM, pyr, bounds=Bounds(-40.0, 0.0, 50.0, 60.0),
        hole=False,
    )
    hs = run_raster_process(dem, pyr, process_hillshade, pixelbuffer=1)
    rep = repetition_stats(bench._synth_text_docs(spark, bench.QP_DOCS))
    for name, df in (
        ("assign_rollup_synth", top.agg(F.sum("n_docs"))),
        ("hillshade_pyramid", hs),
        ("quality_pack_repetition", rep),
    ):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(PLAN_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path, flush=True)
    spark.stop()


def cmd_stages(args):
    """Sub-stage timings of assign_rollup / hillshade / quality_pack."""
    from pyspark.sql import functions as F

    spark = _spark()
    import bench

    bench._warm_raster(spark)
    bench._warm_assign(spark)
    bench._warm_quality_pack(spark)

    from mapchete_spark.functions.repetition import repetition_stats
    from mapchete_spark.operators.assign import assign_point_tiles
    from mapchete_spark.operators.process import (
        process_hillshade,
        run_raster_process,
    )
    from mapchete_spark.operators.pyramid import (
        reduce_docs_to_tiles,
        rollup_to_zoom,
    )
    from mapchete_spark.operators.rastertable import materialize_dem
    from mapchete_spark.operators.sharding import assign_shards
    from mapchete_spark.sources.tables import synthetic_docs
    from mapchete_spark.tilegrid import Bounds, TilePyramid

    res = {}

    def t(name, fn):
        spark.sparkContext.setJobDescription(f"bx:{name}")
        t0 = time.time()
        fn()
        res[name] = round(time.time() - t0, 3)
        print(name, res[name], flush=True)

    # --- assign_rollup sub-stages
    docs = synthetic_docs(spark, bench.BENCH_DOCS)
    t("ar.synth_only", lambda: _noop(docs))
    assigned = assign_point_tiles(docs, [12])
    t("ar.assign_only", lambda: _noop(assigned))
    base = reduce_docs_to_tiles(assigned, {"n_docs": F.count(F.lit(1))})
    t("ar.base_reduce", lambda: _noop(base))
    top = rollup_to_zoom(base, 12, 0, {"n_docs": F.sum("n_docs")})
    t("ar.full", lambda: top.agg(F.sum("n_docs")).collect())
    t("ar.full2", lambda: top.agg(F.sum("n_docs")).collect())

    # --- hillshade sub-stages
    pyr = TilePyramid("geodetic")
    aoi = Bounds(-40.0, 0.0, 50.0, 60.0)
    dem = materialize_dem(spark, bench.HILLSHADE_ZOOM, pyr, bounds=aoi, hole=False)
    t("hs.dem_only", lambda: _noop(dem))
    hs = run_raster_process(dem, pyr, process_hillshade, pixelbuffer=1)
    t("hs.full", lambda: hs.count())
    t("hs.full2", lambda: hs.count())

    # --- quality_pack sub-stages
    qdocs = bench._synth_text_docs(spark, bench.QP_DOCS)
    t("qp.synth_only", lambda: _noop(qdocs))
    t(
        "qp.repetition",
        lambda: repetition_stats(qdocs).where(F.col("gopher_keep")).count(),
    )
    t(
        "qp.shards",
        lambda: assign_shards(qdocs, num_partitions=32)
        .agg(F.max("shard_id"))
        .collect(),
    )
    t(
        "qp.shards2",
        lambda: assign_shards(qdocs, num_partitions=32)
        .agg(F.max("shard_id"))
        .collect(),
    )
    print(json.dumps(res))
    spark.stop()


def cmd_drag(args):
    """Replicate the frozen bench flow while sampling JVM GC time, JIT
    compilation time and code-cache occupancy between phases — the
    instrument for VERDICT r6 'What's wrong' #1 (full-mode session-state
    overhead on the trailing throughput workloads)."""
    import bench

    spark = _spark()
    jvm = spark._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def jstats():
        gc_n = gc_ms = 0
        for b in mf.getGarbageCollectorMXBeans():
            gc_n += b.getCollectionCount()
            gc_ms += b.getCollectionTime()
        jit_ms = mf.getCompilationMXBean().getTotalCompilationTime()
        pools = {}
        for p in mf.getMemoryPoolMXBeans():
            name = p.getName()
            if "Code" in name or "Metaspace" in name or "Old" in name:
                pools[name] = round(p.getUsage().getUsed() / 1e6, 1)
        return {"gc_n": gc_n, "gc_ms": gc_ms, "jit_ms": jit_ms, **pools}

    last = jstats()

    def phase(name, fn):
        nonlocal last
        t0 = time.time()
        fn()
        wall = round(time.time() - t0, 3)
        cur = jstats()
        d = {
            "wall": wall,
            "gc_n": cur["gc_n"] - last["gc_n"],
            "gc_ms": cur["gc_ms"] - last["gc_ms"],
            "jit_ms": cur["jit_ms"] - last["jit_ms"],
        }
        d.update({k: v for k, v in cur.items() if k not in d and k not in ("gc_n", "gc_ms", "jit_ms")})
        print(name, json.dumps(d), flush=True)
        last = cur

    spark.range(1000).selectExpr("sum(id)").collect()
    phase("warm_raster", lambda: bench._warm_raster(spark))
    phase("warm_assign", lambda: bench._warm_assign(spark))
    phase("warm_qp", lambda: bench._warm_quality_pack(spark))
    phase("warm_sf", lambda: bench._warm_sf_queries(spark))
    qs = bench.sf_queries()
    for n, fn in qs.items():
        phase(f"sf.{n}", lambda fn=fn: fn(spark, SF_DIR).count())
    for n, fn in bench.throughput_workloads(spark).items():
        phase(f"tp.{n}", fn)
    # second lap of the throughput group: does aging keep hurting?
    for n, fn in bench.throughput_workloads(spark).items():
        phase(f"tp2.{n}", fn)
    spark.stop()


def cmd_fullmode(args):
    """Replicate the frozen bench.py flow exactly (import and call its
    run_bench) so full-mode numbers are comparable to the driver's."""
    import bench

    print(json.dumps(bench.run_bench(SF_DIR, CPUS)))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "sf"
    fn = {
        "sf": cmd_sf,
        "explain": cmd_explain,
        "stages": cmd_stages,
        "fullmode": cmd_fullmode,
        "drag": cmd_drag,
        "explain_tp": cmd_explain_tp,
    }[cmd]
    fn(sys.argv[2:])
