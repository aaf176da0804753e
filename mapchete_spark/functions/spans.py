"""Interleaved text+media spans: derivation, flattening, invariant hash.

BASELINE.json input_hint: the engine's input is an Iceberg-style table
``(doc_id, spans:array<struct<kind,text,media_ref,offset>>)``.  The
sandbox testdata ships a flat ``documents`` table, so the engine derives
the interleaved spans table deterministically from it (FIXTURES.md F1):
token i of ``text`` becomes span i; ``kind`` cycles through the 7-cycle
(text, image, text, audio, text, video, text); media spans carry a
``media_ref`` and empty text; offsets are strictly increasing.

The per-row invariant (the graft's correctness gate, BASELINE.json:15):
after any pipeline, re-collecting a doc must yield the exact span
sequence (kind, text, media_ref, order).  ``span_signature_col`` is the
canonical order-sensitive hash used to assert it; its SQL twin lets the
DuckDB oracle compute the identical signature.

All expressions are built-in Column functions (transform / md5 /
concat_ws) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KIND_CYCLE = ("text", "image", "text", "audio", "text", "video", "text")


def spans_col(doc_id: Column, text: Column) -> Column:
    """array<struct<kind,text,media_ref,offset>> derived from the doc text."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)))
    kinds = F.array(*[F.lit(k) for k in KIND_CYCLE])

    def make_span(i: Column) -> Column:
        kind = F.element_at(kinds, (i % 7 + 1).cast("int"))
        is_text = kind == "text"
        return F.struct(
            kind.alias("kind"),
            F.when(is_text, F.element_at(toks, (i + 1).cast("int")))
            .otherwise(F.lit(""))
            .alias("text"),
            F.when(
                is_text, F.lit("")
            )
            .otherwise(
                F.concat(F.lit("media://"), doc_id.cast("string"), F.lit("-"), i.cast("string"))
            )
            .alias("media_ref"),
            i.cast("int").alias("offset"),
        )

    return F.transform(idx, make_span)


def with_spans(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.withColumn("spans", spans_col(F.col(id_col), F.col(text_col)))


def span_signature_col(spans: Column) -> Column:
    """Order-sensitive md5 over the flattened (kind, text, media_ref)
    sequence — the span-sequence-equality invariant."""
    flat = F.array_join(
        F.transform(
            spans,
            lambda s: F.concat_ws(
                "\x01", s["kind"], s["text"], s["media_ref"]
            ),
        ),
        "\x02",
    )
    return F.md5(flat)


# ---- DuckDB SQL twins --------------------------------------------------------

_KINDS_SQL = "['text','image','text','audio','text','video','text']"


def spans_flat_sql(id_expr: str = "doc_id", text_expr: str = "text") -> str:
    """DuckDB SELECT fragment producing one row per span:
    (doc_id, offset, kind, span_text, media_ref). Use inside a CTE over
    the documents view."""
    return f"""
    SELECT
        doc_id,
        CAST(pos - 1 AS INT) AS "offset",
        {_KINDS_SQL}[((pos - 1) % 7) + 1] AS kind,
        CASE WHEN {_KINDS_SQL}[((pos - 1) % 7) + 1] = 'text'
             THEN tok ELSE '' END AS span_text,
        CASE WHEN {_KINDS_SQL}[((pos - 1) % 7) + 1] = 'text'
             THEN ''
             ELSE 'media://' || CAST(doc_id AS VARCHAR) || '-' || CAST(pos - 1 AS VARCHAR)
        END AS media_ref
    FROM (
        SELECT {id_expr} AS doc_id,
               UNNEST(string_split({text_expr}, ' ')) AS tok,
               UNNEST(generate_series(1, len(string_split({text_expr}, ' ')))) AS pos
        FROM documents
    )
    """


def span_signature_sql() -> str:
    """DuckDB fragment: per-doc md5 signature equivalent to
    span_signature_col, computed from the flat spans CTE named ``spans_flat``."""
    return """
    SELECT doc_id,
           md5(string_agg(kind || chr(1) || span_text || chr(1) || media_ref,
                          chr(2) ORDER BY "offset")) AS span_sig
    FROM spans_flat
    GROUP BY doc_id
    """
