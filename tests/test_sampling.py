"""Stratified sampling + quantile summaries (operators/sampling)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_sample_deterministic_and_rate_correct(spark, sf_dir):
    from mapchete_spark.operators.sampling import (
        SAMPLE_DEFAULT_RATE,
        SAMPLE_RATES,
        stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r["doc_id"] for r in stratified_sample(docs).select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(docs.repartition(13)).select("doc_id").collect()
    )
    assert a == b  # reproducible under repartitioning
    # realized rate per language tracks the configured rate
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, total in totals.items():
        rate = SAMPLE_RATES.get(lang, SAMPLE_DEFAULT_RATE) / 100.0
        got = kept.get(lang, 0) / total
        assert abs(got - rate) < 0.25 + 3.0 / max(total, 1) ** 0.5


def test_sample_filter_reaches_scan(spark, sf_dir):
    """The keep predicate is a plain Column filter — no shuffle, no UDF
    in the sampling stage."""
    from mapchete_spark.operators.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        stratified_sample(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_quantiles_monotone(spark, sf_dir):
    from mapchete_spark.operators.sampling import quality_quantiles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for r in quality_quantiles(docs).collect():
        assert r["chars_p10"] <= r["chars_p50"] <= r["chars_p90"] <= r["chars_p99"]
        assert r["tokens_p10"] <= r["tokens_p50"] <= r["tokens_p90"] <= r["tokens_p99"]
