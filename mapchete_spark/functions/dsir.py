"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection via Importance Resampling (Xie et al. 2023, public):
score every raw document by how target-like it is under two bag-of-
hashed-n-grams unigram models — lambda_b = log p_target(b) - log
p_raw(b) per hash bucket b, document log-weight = sum over its token
buckets. The engine keeps the model BOUNDED by construction (the
rarity-model lesson, functions/rarity.py round 5): features hash into
``N_BUCKETS`` buckets, so the model is <= N_BUCKETS rows no matter the
corpus — broadcastable at any scale, fit is ONE map-side-combinable
groupBy(bucket), scoring is a broadcast join + one per-doc sum.

Determinism: lambda is quantized to integers (1e-6 log units) so the
per-document sum is exact integer arithmetic — independent of Spark's
partial-aggregation order and bit-identical to the DuckDB oracle
(the k-means hash-exact trick, operators/clustering.py). Bucketing
uses the first 8 hex chars of md5 (cross-engine: Spark ``conv(x,16,
10)``, DuckDB ``('0x' || x)::BIGINT``).

The Gumbel-top-k resampling step on top of the weights involves
``-ln(-ln(u))`` floats whose last-ulp may differ across engines, so it
is pinned by pytest goldens (determinism + monotonicity), not by the
value-hash oracle; the weights ARE the DSIR core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hashed feature space size — the model never exceeds this many rows
N_BUCKETS = 8192

#: integer quantization of the log-ratio (1e-6 log units)
LAMBDA_SCALE = 1_000_000

#: docs with this residue form the synthetic "target" corpus in the
#: contract query (same convention as the decontam benchmark split)
TARGET_MOD = 13
TARGET_RESIDUE = 3


def _bucket(h: Column) -> Column:
    """md5-hex -> bucket id in [0, N_BUCKETS)."""
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % N_BUCKETS
    )


def doc_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, bucket) per token occurrence: unigrams + bigrams hashed
    into the bounded feature space (DSIR's hashed n-gram features)."""
    toks = F.split(F.col(text_col), " ")
    grams = F.concat(
        F.transform(toks, lambda t: F.md5(t)),
        F.transform(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda t, i: F.md5(
                F.concat_ws(" ", t, F.element_at(toks, i + 2))
            ),
        ),
    )
    return docs.select(
        "doc_id", F.explode(grams).alias("h")
    ).select("doc_id", _bucket(F.col("h")).alias("bucket"))


def fit_dsir_model(docs: DataFrame, target: Column) -> DataFrame:
    """(bucket, lambda_q): integer-quantized log-ratio of the target
    vs raw hashed-n-gram unigram models, add-1 smoothed over the FULL
    bucket space. ONE groupBy(bucket) with conditional counts
    (map-side combinable, <= N_BUCKETS output rows); totals ride along
    via a window-free grouping sets trick: a second tiny aggregate."""
    marked = doc_buckets(docs).join(
        docs.select("doc_id", target.alias("__t")), "doc_id"
    )
    counts = marked.groupBy("bucket").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("__t"), 0).otherwise(1)).alias("cr"),
    )
    totals = marked.agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("T"),
        F.sum(F.when(F.col("__t"), 0).otherwise(1)).alias("R"),
    )
    lam = (
        F.log((F.col("ct") + 1.0) / (F.col("T") + float(N_BUCKETS)))
        - F.log((F.col("cr") + 1.0) / (F.col("R") + float(N_BUCKETS)))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(lam * LAMBDA_SCALE).cast("bigint").alias("lambda_q"),
        )
    )


def dsir_logweights(
    docs: DataFrame, model: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_grams, logweight_q): per-document importance
    log-weight in 1e-6 log units — integer-exact, order-independent.
    Scale shape: model is <= N_BUCKETS rows (broadcast), scoring is
    map-only until ONE per-doc sum with map-side combine."""
    b = doc_buckets(docs, text_col)
    joined = b.join(F.broadcast(model), "bucket", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("lambda_q"), F.lit(0))).alias(
                "logweight_q"
            ),
        )
    )


def dsir_select_topk(weights: DataFrame, k: int, temperature: float = 1.0,
                     seed_a: int = 1103515245, seed_c: int = 12345) -> DataFrame:
    """Gumbel-top-k resampling over the importance weights: select k
    docs by logweight/1e6 + T*g where g = -ln(-ln(u)) and u is the
    deterministic LCG uniform on doc_id (retry-stable like
    operators/sampling.py). Covered by pytest goldens (float ulp may
    differ across engines; see module docstring)."""
    M31 = 2147483647
    u = ((F.col("doc_id") * seed_a + seed_c) % M31).cast("double") / M31
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    g = -F.log(-F.log(u))
    score = F.col("logweight_q") / float(LAMBDA_SCALE) + float(temperature) * g
    return (
        weights.withColumn("gumbel_score", score)
        .orderBy(F.desc("gumbel_score"), "doc_id")
        .limit(k)
    )


def dsir_sql(text: str = "text") -> str:
    """DuckDB twin of fit + logweights over the documents table with
    the doc_id-residue target split — identical bucketing, smoothing,
    quantization, and integer summation."""
    target = f"doc_id % {TARGET_MOD} = {TARGET_RESIDUE}"
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split({text}, ' ') AS t FROM documents
    ), grams AS (
        SELECT doc_id, md5(t[CAST(i AS INT)]) AS h
        FROM toks CROSS JOIN LATERAL UNNEST(generate_series(1, len(t))) AS u(i)
        UNION ALL
        SELECT doc_id, md5(t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]) AS h
        FROM toks CROSS JOIN LATERAL UNNEST(generate_series(1, len(t) - 1)) AS u(i)
    ), buckets AS (
        SELECT doc_id,
               ('0x' || substring(h, 1, 8))::BIGINT % {N_BUCKETS} AS bucket,
               {target} AS is_t
        FROM grams
    ), counts AS (
        SELECT bucket,
               SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
               SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
        FROM buckets GROUP BY bucket
    ), totals AS (
        SELECT SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tt,
               SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS rr
        FROM buckets
    ), model AS (
        SELECT bucket,
               CAST(ROUND((ln((ct + 1.0) / (tt + {N_BUCKETS}.0))
                    - ln((cr + 1.0) / (rr + {N_BUCKETS}.0)))
                    * {LAMBDA_SCALE}) AS BIGINT) AS lambda_q
        FROM counts CROSS JOIN totals
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(COALESCE(m.lambda_q, 0)) AS BIGINT) AS logweight_q
    FROM buckets b LEFT JOIN model m ON b.bucket = m.bucket
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """
