"""DSIR data selection (functions/dsir.py): model boundedness, the
Gumbel-top-k resampling layer, and plan shape. Cross-engine weight
parity is the dsir_weights contract query."""

import pytest
from pyspark.sql import functions as F

from mapchete_spark.functions.dsir import (
    N_BUCKETS,
    dsir_logweights,
    dsir_select_topk,
    doc_buckets,
    fit_dsir_model,
)


@pytest.fixture(scope="module")
def weights(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    model = fit_dsir_model(docs, (F.col("doc_id") % 13) == 3)
    return model, dsir_logweights(docs, model).cache()


def test_model_bounded_by_construction(spark, weights):
    """The model can NEVER exceed N_BUCKETS rows, independent of
    corpus size (the rarity-model lesson): buckets are the feature
    space, not the vocabulary."""
    model, _ = weights
    assert model.count() <= N_BUCKETS
    rng = model.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    ).collect()[0]
    assert rng["lo"] >= 0 and rng["hi"] < N_BUCKETS


def test_target_docs_score_higher(weights):
    """DSIR's point: documents drawn from the target split must get
    higher importance weights than raw docs on average."""
    _, w = weights
    rows = w.collect()
    t = [r["logweight_q"] for r in rows if r["doc_id"] % 13 == 3]
    r_ = [r["logweight_q"] for r in rows if r["doc_id"] % 13 != 3]
    assert sum(t) / len(t) > sum(r_) / len(r_)


def test_gumbel_topk_deterministic(weights):
    _, w = weights
    a = [r["doc_id"] for r in dsir_select_topk(w, 50).collect()]
    b = [r["doc_id"] for r in dsir_select_topk(w, 50).collect()]
    assert a == b and len(a) == 50


def test_zero_temperature_is_pure_topk(weights):
    """T=0 degenerates to deterministic top-k by weight (the Gumbel
    noise vanishes) — selection equals an ORDER BY logweight cut."""
    _, w = weights
    got = {r["doc_id"] for r in dsir_select_topk(w, 30, temperature=0.0).collect()}
    want = {
        r["doc_id"]
        for r in w.orderBy(
            F.desc("logweight_q"), "doc_id"
        ).limit(30).collect()
    }
    # T=0 ties broken by (score, doc_id); scores equal logweight here
    assert got == want


def test_higher_temperature_diversifies(weights):
    """Hotter sampling admits more docs from outside the pure top-k."""
    _, w = weights
    pure = {r["doc_id"] for r in dsir_select_topk(w, 50, temperature=0.0).collect()}
    hot = {r["doc_id"] for r in dsir_select_topk(w, 50, temperature=50.0).collect()}
    assert len(hot - pure) > 0


def test_scoring_plan_shape(spark, weights):
    """Scoring must broadcast the bounded model — never shuffle the
    corpus against it — and contain no cartesian product."""
    _, w = weights
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_bigram_feature_count(spark):
    """n tokens -> n unigrams + (n-1) bigrams hashed features."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "solo")], "doc_id long, text string"
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in doc_buckets(docs)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == {1: 5, 2: 1}
