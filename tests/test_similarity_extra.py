"""IVF ANN recall vs the brute-force baseline."""

import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk
from mapchete_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_ivf_cells_cover_all(spark):
    emb = load_table(spark, SF, "embeddings")
    cells = ivf_assign(emb)
    assert cells.count() == emb.count()
    n_cells = cells.select("cell").distinct().count()
    assert 2 <= n_cells <= 8


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=3, nprobe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 8 cells, probe 2: reasonable recall without being exact
    assert recall >= 0.4, f"recall {recall}"


def test_ivf_more_probes_no_worse(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=3).collect()
    }

    def recall(nprobe):
        a = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, queries, k=3, nprobe=nprobe).collect()
        }
        return len(exact & a) / len(exact)

    assert recall(8) >= recall(2)
    assert recall(8) == 1.0  # probing every cell == brute force
