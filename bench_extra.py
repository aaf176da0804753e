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
    }[cmd]
    fn(sys.argv[2:])
