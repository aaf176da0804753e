"""K-means (Lloyd) over the embeddings table — the iterative-ML shape,
made hash-exact across engines.

Embedding pipelines cluster vectors constantly (corpus dedup pools,
topic balancing, IVF coarse quantizers — operators/similarity.py's IVF
uses a FIXED deterministic quantizer; this is the trained one). The
canonical Spark shape, shared with MLlib's implementation:

- centroids are TINY (K x D) at any corpus size -> driver-held and
  broadcast each iteration;
- assignment is a map-only Arrow pass against the broadcast centroids
  (the corpus is never shuffled for assignment);
- the centroid update is one map-side-combinable groupBy per iteration
  (explode to (cluster, dim, q) then SUM — K*D result rows).

Cross-engine exactness: floating-point Lloyd would diverge in the last
ulp (summation order), so everything runs in INTEGER arithmetic:
embeddings quantize to q = floor(x * 1024) (exact: float32 -> double is
exact, *2^10 exact, floor exact), centroids stay RATIONAL (s = integer
coordinate sums, n = member count), and the assignment compares
||n*x - s||^2 — integer algebra equivalent to comparing squared
distances to s/n. DuckDB re-runs the identical unrolled iterations
relationally; any divergence in init, tie-breaks (lowest cluster id),
empty-cluster handling (dropped) or the update breaks parity.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_CLUSTERS = 8
QUANT = 1024
ITERATIONS = 2
DIM = 64


def _quantized(emb: DataFrame) -> DataFrame:
    """vec_id + q: array<long> of floor(x * QUANT)."""
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast(
                "long"
            ),
        ).alias("q"),
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = K_CLUSTERS,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """(vec_id, cluster) after ``iterations`` Lloyd rounds from the
    deterministic init (centroid j = vector of vec_id j)."""
    spark = emb.sparkSession
    qdf = _quantized(emb)

    # init: rational centroids (s = q-vector, n = 1) from vec_id < k
    init = {
        int(r["vec_id"]): ([int(v) for v in r["q"]], 1)
        for r in qdf.where(F.col("vec_id") < k).collect()
    }
    centroids = [(j, init[j][0], init[j][1]) for j in sorted(init)]
    # embedding dimension comes from the data, not the module constant
    # (DIM only parameterizes the unrolled SQL twin's generate_series)
    d = len(centroids[0][1])

    assigned = None
    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(centroids)

        def fn(batches):
            import numpy as np
            import pandas as pd

            cents = bc.value
            ks = np.array([c[0] for c in cents], dtype=np.int64)
            S = np.array([c[1] for c in cents], dtype=np.int64)  # (K, D)
            N = np.array([c[2] for c in cents], dtype=np.int64)  # (K,)
            for pdf in batches:
                X = np.array(list(pdf["q"]), dtype=np.int64)  # (B, D)
                # cost[b, k] = || N_k * x_b - S_k ||^2, exact int64
                diff = N[None, :, None] * X[:, None, :] - S[None, :, :]
                cost = (diff * diff).sum(axis=2)
                # argmin with lowest-cluster-id tie-break: ks is sorted
                best = ks[np.argmin(cost, axis=1)]
                yield pd.DataFrame(
                    {"vec_id": pdf["vec_id"].astype("int64"), "cluster": best}
                )

        assigned = qdf.mapInPandas(
            fn, "vec_id long, cluster long"
        ).join(qdf, "vec_id")
        # update: one map-side-combinable groupBy -> K*D rows
        sums = (
            assigned.select("cluster", F.posexplode("q").alias("dim", "qv"))
            .groupBy("cluster", "dim")
            .agg(F.sum("qv").alias("s"))
            .collect()
        )
        counts = {
            int(r["cluster"]): int(r["n"])
            for r in assigned.groupBy("cluster")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        by_k = {}
        for r in sums:
            by_k.setdefault(int(r["cluster"]), [0] * d)[int(r["dim"])] = int(
                r["s"]
            )
        centroids = [
            (j, by_k[j], counts[j]) for j in sorted(by_k)
        ]  # empty clusters drop out, matching the SQL twin

    return assigned.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


def kmeans_assign_sql(
    k: int = K_CLUSTERS, iterations: int = ITERATIONS
) -> str:
    """DuckDB twin: the same quantization, init, assignment algebra and
    updates as unrolled CTE rounds."""
    assert iterations == 2, "SQL twin unrolls exactly 2 rounds"
    return f"""
    WITH emb AS (
        SELECT e.vec_id, g.i - 1 AS dim,
               CAST(FLOOR(CAST(e.embedding[g.i] AS DOUBLE) * {QUANT}) AS BIGINT) AS q
        FROM embeddings e, UNNEST(generate_series(1, {DIM})) AS g(i)
    ),
    c0 AS (
        SELECT vec_id AS k, dim, q AS s, CAST(1 AS BIGINT) AS n
        FROM emb WHERE vec_id < {k}
    ),
    a1cost AS (
        SELECT e.vec_id, c.k,
               SUM((c.n * e.q - c.s) * (c.n * e.q - c.s)) AS cost
        FROM emb e JOIN c0 c ON c.dim = e.dim
        GROUP BY e.vec_id, c.k
    ),
    best1 AS (
        SELECT vec_id, k FROM (
            SELECT vec_id, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cost, k)
                       AS rn
            FROM a1cost
        ) WHERE rn = 1
    ),
    n1 AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM best1 GROUP BY k),
    c1 AS (
        SELECT b.k, e.dim, CAST(SUM(e.q) AS BIGINT) AS s, n1.n
        FROM best1 b
        JOIN emb e ON e.vec_id = b.vec_id
        JOIN n1 ON n1.k = b.k
        GROUP BY b.k, e.dim, n1.n
    ),
    a2cost AS (
        SELECT e.vec_id, c.k,
               SUM((c.n * e.q - c.s) * (c.n * e.q - c.s)) AS cost
        FROM emb e JOIN c1 c ON c.dim = e.dim
        GROUP BY e.vec_id, c.k
    ),
    best2 AS (
        SELECT vec_id, k FROM (
            SELECT vec_id, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cost, k)
                       AS rn
            FROM a2cost
        ) WHERE rn = 1
    )
    SELECT vec_id, CAST(k AS INT) AS cluster
    FROM best2
    ORDER BY vec_id
    """
