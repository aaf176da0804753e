"""Corpus-model document scoring — the broadcast-side-model shape.

Quality pipelines score each document against a CORPUS-LEVEL
statistical model (classically a unigram/KenLM perplexity filter, as
in CCNet/Gopher). The scalable shape has two phases:

1. build the model: corpus-wide token counts — one shuffle with
   map-side combine — then PRUNE to a bounded vocabulary before it
   ever reaches the driver. Clean-language vocab is ~10^6-10^7, but
   at web scale the raw whitespace-token stream (URLs, numbers,
   typos, unicode junk) has billions of distincts, so CCNet-class
   filters cap the model: tokens below ``VOCAB_MIN_COUNT`` are
   dropped, and a hard ``VOCAB_TOP_N`` cap (deterministic order:
   count desc, token asc) bounds the broadcast INDEPENDENT of corpus
   size;
2. score documents: broadcast the bounded model and score each doc in
   a map-only Arrow pass — the corpus is never shuffled for scoring.
   Tokens outside the model (pruned tail or unseen at scoring time)
   get the deterministic maximum rarity ``RARITY_SCALE // 1`` — the
   count-1 score — so pruning count-1 tokens does not change any
   document's score versus the unpruned model.

Null policy: docs with NULL text are dropped in BOTH phases (the
Spark explode and the DuckDB UNNEST both produce no token rows for
them), so the engines agree row-for-row.

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
#: tokens seen fewer than this many times are pruned from the model
VOCAB_MIN_COUNT = 2
#: hard cap on model size (broadcast bound, independent of corpus size)
VOCAB_TOP_N = 262_144
#: score for any token outside the model — the count-1 rarity, so the
#: min-count prune is score-neutral for count-1 tokens
TAIL_RARITY = RARITY_SCALE // 1


def corpus_vocab(
    docs: DataFrame,
    min_count: int = VOCAB_MIN_COUNT,
    top_n: int = VOCAB_TOP_N,
) -> DataFrame:
    """token -> corpus count, PRUNED to a bounded model: one shuffle
    with map-side combine, then ``cnt >= min_count`` and a
    deterministic top-``top_n`` cap (count desc, token asc) so the
    result is at most ``top_n`` rows at any corpus size."""
    counts = (
        docs.where(F.col("text").isNotNull())
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.where(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(top_n)
    )


def rarity_scores(docs: DataFrame) -> DataFrame:
    """Per doc: n_tokens and the exact integer rarity sum under the
    bounded corpus unigram model (broadcast dict + mapInPandas
    scoring). Out-of-model tokens score ``TAIL_RARITY``; null-text
    docs are dropped (matching the SQL twin)."""
    spark = docs.sparkSession
    vocab = {r["tok"]: int(r["cnt"]) for r in corpus_vocab(docs).collect()}
    rarity = {t: RARITY_SCALE // c for t, c in vocab.items()}
    bc = spark.sparkContext.broadcast(rarity)

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
                    sum(v.get(t, TAIL_RARITY) for t in toks)
                )
            yield pd.DataFrame(out)

    return (
        docs.where(F.col("text").isNotNull())
        .select("doc_id", "text")
        .mapInPandas(fn, "doc_id long, n_tokens long, rarity_q long")
    )


def vocab_cte_sql(
    relation: str = "tok",
    min_count: int = VOCAB_MIN_COUNT,
    top_n: int = VOCAB_TOP_N,
) -> str:
    """The DuckDB twin of the bounded model build, as a CTE body over a
    ``<relation>(doc_id, tok)`` relation (shared by rarity_scores_sql
    and the pipeline_quality oracle so the pruning rule has one
    definition)."""
    return f"""
        SELECT tok, cnt FROM (
            SELECT tok, COUNT(*) AS cnt FROM {relation} GROUP BY tok
        ) WHERE cnt >= {min_count}
        ORDER BY cnt DESC, tok LIMIT {top_n}
    """


def rarity_scores_sql() -> str:
    return f"""
    WITH tok AS (
        SELECT d.doc_id, string_split(d.text, ' ')[g.i] AS tok
        FROM documents d,
             UNNEST(generate_series(1, len(string_split(d.text, ' ')))) AS g(i)
        WHERE d.text IS NOT NULL
    ),
    vocab AS ({vocab_cte_sql()})
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE({RARITY_SCALE} // v.cnt, {TAIL_RARITY})) AS BIGINT)
               AS rarity_q
    FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """
