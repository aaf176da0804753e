"""Deterministic corpus sampling + distribution summaries.

Training-data pipeline ops the reference has no analog for but a
100-TB corpus run needs constantly:

- ``stratified_sample``: language-balanced deterministic subsampling —
  every doc keeps/drops by pure integer arithmetic on its id (the
  repo's exact LCG, functions/geo.lcg_col), with a per-language keep
  rate so rare languages survive downsampling. No RNG state, so the
  sample is reproducible across runs/retries/partitionings (the
  property Spark's ``df.sample`` does NOT give you under retries), and
  the filter is a plain Column predicate evaluated at the scan.

- ``quality_quantiles``: exact per-language quantiles of document
  length and token count via SQL ``percentile`` (exact linear
  interpolation, matching DuckDB's ``quantile_cont``). At corpus scale
  the exact percentile is a sort-based agg per group; for sketch-based
  approximation Spark's approx_percentile drops in unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mapchete_spark.functions.geo import M31, lcg_sql
from mapchete_spark.functions.geo import _lcg as lcg_col

# per-language keep rates in percent: downsample the dominant language
# hard, keep the tail intact
SAMPLE_RATES = {"en": 10, "de": 40, "fr": 40, "es": 60, "zh": 80}
SAMPLE_DEFAULT_RATE = 100
SAMPLE_A, SAMPLE_C = 1_664_525, 1_013_904_223  # Numerical Recipes LCG


def stratified_sample(docs: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Deterministic language-stratified sample: keep doc when
    lcg(doc_id) % 100 < rate(lang)."""
    rate = F.lit(SAMPLE_DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col(lang_col) == lang, F.lit(r)).otherwise(rate)
    draw = lcg_col(F.col("doc_id"), SAMPLE_A, SAMPLE_C) % 100
    return docs.where(draw < rate)


def stratified_sample_summary(docs: DataFrame) -> DataFrame:
    """Contract shape: per-language kept count + an order-insensitive
    exact digest of the kept ids (sum and xor-like mod-sum)."""
    kept = stratified_sample(docs)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
        # Overflow-safe modular square: reduce doc_id mod p BEFORE squaring so
        # ids above ~3.04e9 cannot wrap signed 64-bit (Spark wraps silently,
        # DuckDB promotes to HUGEINT -- they would diverge otherwise).
        F.sum(
            (F.col("doc_id") % F.lit(1_000_000_007))
            * (F.col("doc_id") % F.lit(1_000_000_007))
            % F.lit(1_000_000_007)
        ).alias("id_checksum"),
    )


def stratified_sample_sql() -> str:
    rate = str(SAMPLE_DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = f"CASE WHEN lang = '{lang}' THEN {r} ELSE {rate} END"
    draw = f"({lcg_sql('doc_id', SAMPLE_A, SAMPLE_C)}) % 100"
    return f"""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(((doc_id % 1000000007) * (doc_id % 1000000007))
                    % 1000000007) AS BIGINT) AS id_checksum
    FROM documents
    WHERE {draw} < ({rate})
    GROUP BY lang
    ORDER BY lang
    """


QUANTILES = (0.1, 0.5, 0.9, 0.99)


def quality_quantiles(docs: DataFrame) -> DataFrame:
    """Exact per-language quantiles of n_chars and whitespace token
    count (SQL ``percentile``: exact, linear interpolation)."""
    toks = F.size(F.split(F.col("text"), " "))
    base = docs.select("lang", F.col("n_chars").cast("double").alias("nc"),
                       toks.cast("double").alias("nt"))
    aggs = []
    for q in QUANTILES:
        tag = str(int(q * 100))
        aggs.append(
            F.round(F.expr(f"percentile(nc, {q!r})"), 4).alias(f"chars_p{tag}")
        )
        aggs.append(
            F.round(F.expr(f"percentile(nt, {q!r})"), 4).alias(f"tokens_p{tag}")
        )
    return base.groupBy("lang").agg(*aggs)


def quality_quantiles_sql() -> str:
    cols = []
    for q in QUANTILES:
        tag = str(int(q * 100))
        cols.append(
            f"ROUND(quantile_cont(CAST(n_chars AS DOUBLE), {q!r}), 4) AS chars_p{tag}"
        )
        cols.append(
            f"ROUND(quantile_cont(CAST(len(string_split(text, ' ')) AS DOUBLE), {q!r}), 4)"
            f" AS tokens_p{tag}"
        )
    cols_sql = ",\n           ".join(cols)
    return f"""
    SELECT lang,
           {cols_sql}
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """
