"""Span-aware training-chunk packing over interleaved documents.

The training-data op the interleaved payload exists for: split each
document's span sequence (text + media, BASELINE.json input_hint) into
token-budgeted chunks WITHOUT breaking span order — the downstream
packer that turns 10^12 interleaved docs into fixed-budget training
rows. Chunk assignment is the deterministic prefix-sum rule

    cost(text span)  = max(1, ceil(len(text) / 4))      (BPE-ish)
    cost(media span) = MEDIA_TOKEN_COST                 (vision tokens)
    chunk_id(span)   = floor(cum_cost_before_span / CHUNK_BUDGET)

so every span lands in exactly one chunk, chunks preserve order, and
concatenating a doc's chunks reproduces its span sequence exactly (the
north-rule span-sequence invariant — asserted via the same
order-sensitive md5 signature as functions/spans).

Engine shape: ENTIRELY per-row Column higher-order functions
(aggregate / zip_with / transform / filter) — the prefix sum runs
inside the spans array, so chunking is a map-only stage with NO
shuffle and no Python UDF; the only explode is the narrow per-chunk
fan-out of the output. At 10^12 docs this is the difference between a
free map stage and a corpus-wide window shuffle (the SQL twin uses the
window form — fine for an oracle, wrong for the engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapchete_spark.functions.spans import spans_col

CHUNK_BUDGET = 32
MEDIA_TOKEN_COST = 16


def _span_cost(s: Column) -> Column:
    return (
        F.when(
            s["kind"] == "text",
            F.greatest(
                F.lit(1), F.floor((F.length(s["text"]) + F.lit(3)) / F.lit(4))
            ),
        )
        .otherwise(F.lit(MEDIA_TOKEN_COST))
        .cast("long")
    )


def chunk_spans(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per (doc_id, chunk_id): n_spans, chunk_tokens and the
    order-sensitive chunk signature. Map-only; see module docstring."""
    spans = spans_col(F.col(id_col), F.col(text_col))
    costs = F.transform(spans, _span_cost)
    # prefix sum INSIDE the array: acc = (cum-before list, running total)
    cums = F.aggregate(
        costs,
        F.struct(
            F.expr("CAST(array() AS array<bigint>)").alias("arr"),
            F.lit(0).cast("long").alias("cum"),
        ),
        lambda acc, c: F.struct(
            F.concat(acc["arr"], F.array(acc["cum"])).alias("arr"),
            (acc["cum"] + c).alias("cum"),
        ),
        lambda acc: acc["arr"],
    )
    chunk_ids = F.transform(cums, lambda c: F.floor(c / F.lit(CHUNK_BUDGET)))
    tagged = F.zip_with(
        spans,
        F.zip_with(chunk_ids, costs, lambda cid, c: F.struct(cid.alias("cid"), c.alias("cost"))),
        lambda s, t: F.struct(
            t["cid"].alias("cid"),
            t["cost"].alias("cost"),
            F.concat_ws("\x01", s["kind"], s["text"], s["media_ref"]).alias("line"),
        ),
    )
    n_chunks = F.element_at(chunk_ids, -1) + 1
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_chunks - 1),
        lambda cid: F.struct(
            cid.alias("chunk_id"),
            F.size(F.filter(tagged, lambda t: t["cid"] == cid)).alias("n_spans"),
            F.aggregate(
                F.filter(tagged, lambda t: t["cid"] == cid),
                F.lit(0).cast("long"),
                lambda acc, t: acc + t["cost"],
            ).alias("chunk_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.filter(tagged, lambda t: t["cid"] == cid),
                        lambda t: t["line"],
                    ),
                    "\x02",
                )
            ).alias("chunk_sig"),
        ),
    )
    # two-step select: referencing the doc_id column both standalone and
    # inside the chunks expression in ONE select trips Spark 4's
    # lateral-column-alias check (INTERNAL_ERROR), so materialize the
    # chunks column first
    return (
        docs.withColumn("__chunks", chunks)
        .select(F.col(id_col).alias("doc_id"), F.explode("__chunks").alias("ch"))
        .select(
            "doc_id",
            F.col("ch.chunk_id").alias("chunk_id"),
            F.col("ch.n_spans").alias("n_spans"),
            F.col("ch.chunk_tokens").alias("chunk_tokens"),
            F.col("ch.chunk_sig").alias("chunk_sig"),
        )
    )


def chunk_spans_sql() -> str:
    """DuckDB twin: flat spans (functions/spans.spans_flat_sql) +
    window prefix sum + per-chunk string_agg/md5."""
    from mapchete_spark.functions.spans import spans_flat_sql

    return f"""
    WITH spans_flat AS ({spans_flat_sql()}),
    costed AS (
        SELECT doc_id, "offset", kind, span_text, media_ref,
               CASE WHEN kind = 'text'
                    THEN GREATEST(1, CAST(FLOOR((len(span_text) + 3) / 4) AS BIGINT))
                    ELSE {MEDIA_TOKEN_COST} END AS cost
        FROM spans_flat
    ), cumd AS (
        SELECT *,
               COALESCE(SUM(cost) OVER (
                   PARTITION BY doc_id ORDER BY "offset"
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM costed
    )
    SELECT doc_id,
           CAST(FLOOR(cum_before / {CHUNK_BUDGET}) AS BIGINT) AS chunk_id,
           COUNT(*) AS n_spans,
           SUM(cost) AS chunk_tokens,
           md5(string_agg(kind || chr(1) || span_text || chr(1) || media_ref,
                          chr(2) ORDER BY "offset")) AS chunk_sig
    FROM cumd
    GROUP BY doc_id, CAST(FLOOR(cum_before / {CHUNK_BUDGET}) AS BIGINT)
    ORDER BY doc_id, chunk_id
    """
