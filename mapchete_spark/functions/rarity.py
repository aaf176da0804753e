"""Corpus-model document scoring — the broadcast-side-model shape.

Quality pipelines score each document against a CORPUS-LEVEL
statistical model (classically a unigram/KenLM perplexity filter, as
in CCNet/Gopher). The scalable shape has two phases:

1. build the model: corpus-wide token counts — one shuffle with
   map-side combine; the resulting vocabulary is BOUNDED (natural
   language vocab ~10^6-10^7 entries) regardless of corpus size;
2. score documents: broadcast the model and score each doc in a
   map-only Arrow pass — the corpus is never shuffled for scoring.

Exactness: a log-probability sum would hinge on libm ulp agreement
between engines, so the score is integer rarity — each token
contributes ``floor(1e9 / corpus_count)`` (rare tokens score high),
summed per document in int64. Both engines derive it from the same
integers with exact arithmetic, making the contract hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RARITY_SCALE = 1_000_000_000


def corpus_vocab(docs: DataFrame) -> DataFrame:
    """token -> corpus count (one shuffle, map-side combine)."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )


def rarity_scores(docs: DataFrame) -> DataFrame:
    """Per doc: n_tokens and the exact integer rarity sum under the
    corpus unigram model (broadcast dict + mapInPandas scoring)."""
    spark = docs.sparkSession
    vocab = {r["tok"]: int(r["cnt"]) for r in corpus_vocab(docs).collect()}
    bc = spark.sparkContext.broadcast(vocab)

    def fn(batches):
        import pandas as pd

        v = bc.value
        for pdf in batches:
            out = {"doc_id": [], "n_tokens": [], "rarity_q": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                toks = str(text).split(" ")
                out["doc_id"].append(int(did))
                out["n_tokens"].append(len(toks))
                out["rarity_q"].append(
                    sum(RARITY_SCALE // v[t] for t in toks)
                )
            yield pd.DataFrame(out)

    return docs.select("doc_id", "text").mapInPandas(
        fn, "doc_id long, n_tokens long, rarity_q long"
    )


def rarity_scores_sql() -> str:
    return f"""
    WITH tok AS (
        SELECT d.doc_id, string_split(d.text, ' ')[g.i] AS tok
        FROM documents d,
             UNNEST(generate_series(1, len(string_split(d.text, ' ')))) AS g(i)
    ),
    vocab AS (
        SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM({RARITY_SCALE} // v.cnt) AS BIGINT) AS rarity_q
    FROM tok t JOIN vocab v ON v.tok = t.tok
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """
