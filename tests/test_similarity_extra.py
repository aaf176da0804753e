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


class TestKMeans:
    def test_tiny_handchecked(self, spark):
        """Two well-separated groups, K=2: both Lloyd rounds keep the
        obvious assignment and the tie-break stays deterministic."""
        import numpy as np

        from mapchete_spark.operators.clustering import kmeans_assign

        rows = []
        rng = np.random.RandomState(5)
        for i in range(10):
            center = 0.9 if i % 2 else -0.9
            v = (center + rng.uniform(-0.05, 0.05, 64)).astype("float32")
            rows.append((i, [float(x) for x in v], i % 2))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=2).collect()}
        # init: centroid 0 = vec 0 (negative group), centroid 1 = vec 1
        # (positive group) -> evens to 0, odds to 1
        for i in range(10):
            assert got[i] == i % 2, (i, got[i])

    def test_non_default_dimension(self, spark):
        """The Lloyd update infers D from the data (ADVICE round-4):
        an 8-dim table must cluster, not IndexError on the module's
        DIM=64 constant."""
        import numpy as np

        from mapchete_spark.operators.clustering import kmeans_assign

        rows = []
        rng = np.random.RandomState(7)
        for i in range(12):
            center = 0.9 if i % 2 else -0.9
            v = (center + rng.uniform(-0.05, 0.05, 8)).astype("float32")
            rows.append((i, [float(x) for x in v]))
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=2).collect()
        }
        for i in range(12):
            assert got[i] == i % 2, (i, got[i])

    def test_assignment_is_map_only(self, spark, sf_dir):
        """The FINAL assignment stage must not shuffle the corpus (the
        updates between iterations are the only exchanges)."""
        from mapchete_spark.operators.clustering import kmeans_assign

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = kmeans_assign(emb)
        n = out.count()
        assert n == emb.count()
        # every vector assigned to an existing cluster id
        ks = {r["cluster"] for r in out.select("cluster").distinct().collect()}
        assert ks <= set(range(8)) and len(ks) >= 2
