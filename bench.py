#!/usr/bin/env python
"""Benchmark harness.

Runs the engine's headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf", plus tiles/sec + docs/sec throughput figures}.

--scaling: additionally re-runs the same workloads in fresh JVMs at
N and 4N cores (subprocesses, one JVM each) and reports the scaling
efficiency (T_N / T_4N) / 4 — the sandbox stand-in for the N vs 4N
executor criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def headline_queries():
    """name -> (callable, kind) — the benched subset of __spark_entry__
    plus the pyramid job; chosen to cover scan/explode (assign), wide
    shuffle (rollup), Arrow UDF + groupBy skew (hillshade/overviews),
    joins (minhash LSH), and text/embedding pipelines."""
    import __spark_entry__ as e

    qs = e.queries()
    names = [
        "tile_assign_multizoom",
        "pyramid_rollup",
        "span_roundtrip",
        "dedup_exact",
        "minhash_lsh",
        "text_quality",
        "cosine_topk",
        "hillshade",
        "overviews",
    ]
    return {n: qs[n] for n in names}


def run_bench(sf_dir: str, cpus: int) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from mapchete_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    # warm the JVM/Arrow path once (not timed)
    spark.range(1000).selectExpr("sum(id)").collect()

    timings = {}
    aux = {}
    for name, fn in headline_queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        aux[name] = n

    # throughput figures
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    total = round(sum(timings.values()), 3)
    # tiles processed by the raster stages (hillshade tiles + overview tiles)
    tiles_processed = aux.get("hillshade", 0) + aux.get("overviews", 0)
    raster_sec = timings.get("hillshade", 0) + timings.get("overviews", 0)
    # docs processed by the assignment stage: corpus x 13 zooms
    assign_sec = timings.get("tile_assign_multizoom", 1e-9)
    out = {
        "metric": "headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "tiles_per_sec": round(tiles_processed / raster_sec, 1) if raster_sec else None,
        "docs_per_sec": round(n_docs * 13 / assign_sec, 1),
    }
    spark.stop()
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    if "--scaling" in sys.argv:
        # same input, two parallelism levels, fresh JVM each
        n = max(cpus // 4, 2)
        results = {}
        for c in (n, 4 * n):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
            p = subprocess.run(
                [sys.executable, __file__],
                env=env,
                capture_output=True,
                text=True,
            )
            line = p.stdout.strip().splitlines()[-1]
            results[c] = json.loads(line)
        t_n = results[n]["value"]
        t_4n = results[4 * n]["value"]
        eff = (t_n / t_4n) / 4
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency N->4N",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "n_cores": n,
                    "t_n_sec": t_n,
                    "t_4n_sec": t_4n,
                    "runs": results,
                }
            )
        )
        return

    print(json.dumps(run_bench(sf_dir, cpus)))


if __name__ == "__main__":
    main()
