"""Intra-document repetition statistics — the Gopher/MassiveText
repetition quality rules (Rae et al. 2021, §A1.1: documents dominated
by repeated lines/paragraphs/n-grams are removed before pretraining).

Per document, over whitespace tokens:

- ``dup_word_frac``   1 - distinct/total — bulk repetition;
- ``top_bigram_frac`` occurrences of the most frequent bigram over all
  bigrams — loop/boilerplate detection;
- ``max_word_run``    longest run of one token repeated back-to-back —
  pathological generation artifacts;
- ``gopher_keep``     the composite keep decision at fixed thresholds.

Scale shape: ONE Arrow ``mapInPandas`` pass — map-only, zero shuffle,
no corpus-wide state (same design as functions/chunking.py; a
posexplode + per-doc groupBy would shuffle the full token stream —
~10^15 rows at corpus scale — for a statistic each doc can compute
locally). The DuckDB oracle re-derives every statistic relationally
(UNNEST + windows), so the two engines cross-check algorithm, not
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: keep thresholds (fixed, documented; Gopher's are 0.63/0.2/—)
MAX_DUP_WORD_FRAC = 0.70
MAX_TOP_BIGRAM_FRAC = 0.20
MAX_WORD_RUN = 4

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, dup_word_frac double, "
    "top_bigram_frac double, max_word_run long, gopher_keep boolean"
)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """One row per document with the repetition statistics (rounded to
    6 digits like every ratio-valued oracle in the contract)."""

    def fn(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "n_tokens": [],
                "dup_word_frac": [],
                "top_bigram_frac": [],
                "max_word_run": [],
                "gopher_keep": [],
            }
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                toks = str(text).split(" ")
                n = len(toks)
                dup = round(1.0 - len(set(toks)) / n, 6) if n else 0.0
                if n > 1:
                    bigrams = Counter(zip(toks, toks[1:]))
                    top_bi = round(max(bigrams.values()) / (n - 1), 6)
                else:
                    top_bi = 0.0
                run = best = 1 if n else 0
                for a, b in zip(toks, toks[1:]):
                    run = run + 1 if a == b else 1
                    if run > best:
                        best = run
                keep = (
                    dup <= MAX_DUP_WORD_FRAC
                    and top_bi <= MAX_TOP_BIGRAM_FRAC
                    and best <= MAX_WORD_RUN
                )
                out["doc_id"].append(int(did))
                out["n_tokens"].append(n)
                out["dup_word_frac"].append(dup)
                out["top_bigram_frac"].append(top_bi)
                out["max_word_run"].append(best)
                out["gopher_keep"].append(bool(keep))
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(fn, _OUT_SCHEMA)


def repetition_stats_sql() -> str:
    """DuckDB twin: UNNEST + windows re-derive the same statistics."""
    return f"""
    WITH tok AS (
        SELECT d.doc_id, g.i AS pos, string_split(d.text, ' ')[g.i] AS tok,
               len(string_split(d.text, ' ')) AS n
        FROM documents d,
             UNNEST(generate_series(1, len(string_split(d.text, ' ')))) AS g(i)
    ),
    base AS (
        SELECT doc_id, MAX(n) AS n_tokens,
               ROUND(1.0 - COUNT(DISTINCT tok) * 1.0 / COUNT(*), 6)
                   AS dup_word_frac
        FROM tok GROUP BY doc_id
    ),
    bi AS (
        SELECT doc_id,
               tok || CHR(1) || LEAD(tok) OVER w AS bigram
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    bi_cnt AS (
        SELECT doc_id, COUNT(*) AS c
        FROM bi WHERE bigram IS NOT NULL GROUP BY doc_id, bigram
    ),
    top_bi AS (
        SELECT b.doc_id,
               ROUND(MAX(b.c) * 1.0 / (base.n_tokens - 1), 6)
                   AS top_bigram_frac
        FROM bi_cnt b JOIN base ON base.doc_id = b.doc_id
        WHERE base.n_tokens > 1
        GROUP BY b.doc_id, base.n_tokens
    ),
    runs AS (
        -- islands: consecutive equal tokens share pos - row_number
        SELECT doc_id, tok,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY doc_id, tok ORDER BY pos
               ) AS grp
        FROM tok
    ),
    max_run AS (
        SELECT doc_id, MAX(run_len) AS max_word_run
        FROM (
            SELECT doc_id, COUNT(*) AS run_len
            FROM runs GROUP BY doc_id, tok, grp
        ) GROUP BY doc_id
    )
    SELECT base.doc_id,
           base.n_tokens,
           base.dup_word_frac,
           COALESCE(top_bi.top_bigram_frac, 0.0) AS top_bigram_frac,
           max_run.max_word_run,
           (base.dup_word_frac <= {MAX_DUP_WORD_FRAC!r}
            AND COALESCE(top_bi.top_bigram_frac, 0.0) <= {MAX_TOP_BIGRAM_FRAC!r}
            AND max_run.max_word_run <= {MAX_WORD_RUN}) AS gopher_keep
    FROM base
    JOIN max_run ON max_run.doc_id = base.doc_id
    LEFT JOIN top_bi ON top_bi.doc_id = base.doc_id
    ORDER BY base.doc_id
    """
