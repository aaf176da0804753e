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

Engine shape: a MAP-ONLY Arrow-batched pass (mapInPandas) — the
prefix sum and chunk grouping run linearly inside each batch, no
shuffle, no corpus-wide window (the SQL twin uses the window form —
fine for an oracle, wrong for the engine at 10^12 docs). A pure
Column-HOF formulation was tried first and REJECTED: the chunk
construction must reference the span/cost/prefix arrays several times
per chunk, and Catalyst inlines (duplicates) the whole derivation
subtree at every reference — per-row evaluation went quadratic in
expression size and 5k docs took minutes. The Arrow path is the
engine-correct shape here (vectorized batches, linear work), exactly
the trade the raster pipeline already makes.
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
    order-sensitive chunk signature (md5 over kind\\x01text\\x01media_ref
    joined by \\x02 — the functions/spans signature alphabet). Map-only
    Arrow pass; see module docstring for why this is not Column HOFs."""

    def gen(batches):
        import hashlib

        import pandas as pd

        from mapchete_spark.functions.spans import KIND_CYCLE

        for pdf in batches:
            out = {
                "doc_id": [],
                "chunk_id": [],
                "n_spans": [],
                "chunk_tokens": [],
                "chunk_sig": [],
            }
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = ("" if text is None else str(text)).split(" ")
                cum = 0
                cur_cid = 0
                cur_lines = []
                cur_cost = 0
                for i, tok in enumerate(toks):
                    kind = KIND_CYCLE[i % 7]
                    if kind == "text":
                        line = f"text\x01{tok}\x01"
                        cost = max(1, (len(tok) + 3) // 4)
                    else:
                        line = f"{kind}\x01\x01media://{did}-{i}"
                        cost = MEDIA_TOKEN_COST
                    cid = cum // CHUNK_BUDGET
                    if cid != cur_cid and cur_lines:
                        out["doc_id"].append(int(did))
                        out["chunk_id"].append(int(cur_cid))
                        out["n_spans"].append(len(cur_lines))
                        out["chunk_tokens"].append(int(cur_cost))
                        out["chunk_sig"].append(
                            hashlib.md5(
                                "\x02".join(cur_lines).encode("utf-8")
                            ).hexdigest()
                        )
                        cur_lines, cur_cost = [], 0
                    cur_cid = cid
                    cur_lines.append(line)
                    cur_cost += cost
                    cum += cost
                if cur_lines:
                    out["doc_id"].append(int(did))
                    out["chunk_id"].append(int(cur_cid))
                    out["n_spans"].append(len(cur_lines))
                    out["chunk_tokens"].append(int(cur_cost))
                    out["chunk_sig"].append(
                        hashlib.md5(
                            "\x02".join(cur_lines).encode("utf-8")
                        ).hexdigest()
                    )
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(
        gen,
        schema=(
            "doc_id long, chunk_id long, n_spans long, "
            "chunk_tokens long, chunk_sig string"
        ),
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
           CAST(SUM(cost) AS BIGINT) AS chunk_tokens,
           md5(string_agg(kind || chr(1) || span_text || chr(1) || media_ref,
                          chr(2) ORDER BY "offset")) AS chunk_sig
    FROM cumd
    GROUP BY doc_id, CAST(FLOOR(cum_before / {CHUNK_BUDGET}) AS BIGINT)
    ORDER BY doc_id, chunk_id
    """
