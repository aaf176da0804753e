"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force top-k neighbors — the correctness
  baseline. Dot products via F.aggregate/zip_with (JVM, codegen); the
  query set is broadcast (small side), so the scan is one pass over the
  corpus with no shuffle besides the final per-query top-k.
- ``lsh_buckets`` / ``lsh_topk``: random-hyperplane LSH — the scale
  path. Deterministic pseudo-hyperplanes from an LCG in (k, dim), so
  the DuckDB oracle reproduces the exact buckets. At 100 TB the bucket
  join replaces the full cross product; brute force stays as the
  in-bucket re-ranker.
- ``cosine_neardup_pairs``: embedding near-duplicate detection
  (cosine >= threshold) over LSH candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# deterministic pseudo-hyperplane: component (k, i) of plane k
# = frac(((k*2654435761 + i*40503 + 12345) % 65536) / 65536) - 0.5
LSH_PLANES = 16
_PLANE_MOD = 65536
_PLANE_A, _PLANE_B, _PLANE_C = 2654435761, 40503, 12345


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the corpus. Output: (query_id, rank, neighbor_id, cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def plane_component(k: Column, i: Column) -> Column:
    h = (k.cast("long") * _PLANE_A + i.cast("long") * _PLANE_B + _PLANE_C) % _PLANE_MOD
    return h.cast("double") / _PLANE_MOD - 0.5


def lsh_signature_col(vec: Column, n_planes: int = LSH_PLANES) -> Column:
    """int signature: bit k = 1 iff dot(vec, plane_k) > 0."""
    ks = F.sequence(F.lit(0), F.lit(n_planes - 1))

    def bit(k: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(1), F.size(vec)),
                lambda v, i: v.cast("double") * plane_component(k, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(dot > 0, F.pow(F.lit(2.0), k.cast("double")).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    return F.aggregate(F.transform(ks, bit), F.lit(0).cast("long"), lambda a, b: a + b)


def lsh_buckets(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = LSH_PLANES,
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"),
        lsh_signature_col(F.col(vec_col), n_planes).alias("bucket"),
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: LSH bucket join prunes candidates, exact
    cosine confirms. Output: (vec_a, vec_b, cosine >= threshold)."""
    b = lsh_buckets(df, id_col, vec_col)
    vecs = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    cand = (
        b.alias("a")
        .join(b.alias("b"), on="bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    scored = (
        cand.join(vecs.withColumnRenamed("vec_id", "vec_a").withColumnRenamed("v", "va"), "vec_a")
        .join(vecs.withColumnRenamed("vec_id", "vec_b").withColumnRenamed("v", "vb"), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))).alias("cosine"),
        )
    )
    return scored.where(F.col("cosine") >= threshold).select(
        "vec_a", "vec_b", F.round("cosine", 6).alias("cosine")
    )


# ---- IVF (inverted-file) ANN: the scale path beyond LSH ----------------------
#
# Deterministic pseudo-centroids (LCG in (centroid, dim)) make the
# coarse quantizer reproducible in SQL. At 100 TB the cell assignment
# is the partition key: queries probe nprobe cells -> the candidate
# scan touches only those partitions (partition pruning), brute-force
# re-rank runs inside.

IVF_CENTROIDS = 8
_IVF_A, _IVF_B, _IVF_C = 48271, 16807, 7


def ivf_centroid_component(c: Column, i: Column) -> Column:
    h = (c.cast("long") * _IVF_A + i.cast("long") * _IVF_B + _IVF_C) % _PLANE_MOD
    return h.cast("double") / _PLANE_MOD - 0.5


def ivf_cell_col(vec: Column, n_centroids: int = IVF_CENTROIDS) -> Column:
    """argmax-dot centroid id (ties -> lowest id)."""
    def dot_with(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(1), F.size(vec)),
                lambda v, i: v.cast("double") * ivf_centroid_component(c, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scores = F.transform(
        F.sequence(F.lit(0), F.lit(n_centroids - 1)), lambda c: dot_with(c)
    )
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


def ivf_assign(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    n_centroids: int = IVF_CENTROIDS,
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"),
        ivf_cell_col(F.col(vec_col), n_centroids).alias("cell"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = IVF_CENTROIDS,
) -> DataFrame:
    """IVF ANN: probe the query's top-nprobe cells, exact-cosine re-rank
    inside. Output schema matches cosine_topk (may differ from exact
    top-k when true neighbors live outside probed cells — that recall
    trade IS the operator)."""
    def dots(vec: Column) -> Column:
        def dot_with(c: Column) -> Column:
            return F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(1), F.size(vec)),
                    lambda v, i: v.cast("double") * ivf_centroid_component(c, i),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )

        return F.transform(
            F.sequence(F.lit(0), F.lit(n_centroids - 1)), lambda c: dot_with(c)
        )

    # corpus cells
    cells = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        ivf_cell_col(F.col(vec_col), n_centroids).alias("cell"),
    )
    # query probe cells: indexes of the nprobe largest centroid dots
    scores = dots(F.col(vec_col))
    ranked = F.slice(
        F.reverse(F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                lambda c: F.struct(
                    F.element_at(scores, c.cast("int") + 1).alias("score"),
                    (-c).cast("int").alias("neg_cell"),
                ),
            )
        )),
        1,
        nprobe,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            F.transform(ranked, lambda s: (-s["neg_cell"]).cast("int"))
        ).alias("cell"),
    )
    cand = cells.join(F.broadcast(q), on="cell").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec")))
        ).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


# ---- DuckDB SQL twins --------------------------------------------------------


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def cosine_topk_sql(k: int = 3, query_filter: str = "vec_id < 5") -> str:
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = f"sqrt({_dot_sql('q.embedding', 'q.embedding')})"
    nc = f"sqrt({_dot_sql('c.embedding', 'c.embedding')})"
    return f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {dot} / ({nq} * {nc}) AS cosine
        FROM embeddings q, embeddings c
        WHERE ({query_filter.replace('vec_id', 'q.vec_id')}) AND q.vec_id <> c.vec_id
    ), ranked AS (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cosine
    FROM ranked WHERE rank <= {k}
    """


def lsh_bucket_sql(n_planes: int = LSH_PLANES) -> str:
    plane = (
        f"(CAST(k AS BIGINT) * {_PLANE_A} + CAST(i AS BIGINT) * {_PLANE_B} + {_PLANE_C}) "
        f"% {_PLANE_MOD}"
    )
    dot = (
        f"list_sum(list_transform(generate_series(1, len(embedding)), "
        f"i -> CAST(embedding[i] AS DOUBLE) * (CAST(({plane}) AS DOUBLE) / {_PLANE_MOD} - 0.5)))"
    )
    return f"""
    SELECT vec_id,
           CAST(list_sum(list_transform(generate_series(0, {n_planes - 1}),
               k -> CASE WHEN {dot} > 0
                    THEN CAST(POWER(2.0, k) AS BIGINT) ELSE 0 END)) AS BIGINT) AS bucket
    FROM embeddings
    """


def _ivf_scores_sql(vec: str = "embedding", n_centroids: int = IVF_CENTROIDS) -> str:
    comp = (
        f"(CAST((CAST(c AS BIGINT) * {_IVF_A} + CAST(i AS BIGINT) * {_IVF_B} + {_IVF_C}) "
        f"% {_PLANE_MOD} AS DOUBLE) / {_PLANE_MOD} - 0.5)"
    )
    dot = (
        f"list_sum(list_transform(generate_series(1, len({vec})), "
        f"i -> CAST({vec}[i] AS DOUBLE) * {comp}))"
    )
    return f"list_transform(generate_series(0, {n_centroids - 1}), c -> {dot})"


def ivf_assign_sql(n_centroids: int = IVF_CENTROIDS) -> str:
    scores = _ivf_scores_sql("embedding", n_centroids)
    return f"""
    SELECT vec_id,
           CAST(list_position({scores}, list_max({scores})) - 1 AS INT) AS cell
    FROM embeddings
    """


def ivf_topk_sql(
    k: int = 3, nprobe: int = 2, query_filter: str = "vec_id < 5",
    n_centroids: int = IVF_CENTROIDS,
) -> str:
    scores = _ivf_scores_sql("embedding", n_centroids)
    dot = _dot_sql("q.embedding", "c.embedding")
    nq = f"sqrt({_dot_sql('q.embedding', 'q.embedding')})"
    nc = f"sqrt({_dot_sql('c.embedding', 'c.embedding')})"
    return f"""
    WITH cells AS (
        SELECT vec_id,
               CAST(list_position({scores}, list_max({scores})) - 1 AS INT) AS cell,
               embedding
        FROM embeddings
    ), probe AS (
        SELECT vec_id AS query_id, embedding, s.cell
        FROM (
            SELECT vec_id, embedding,
                   UNNEST(list_transform({scores}, x -> x)) AS score,
                   UNNEST(generate_series(0, {n_centroids - 1})) AS cell
            FROM embeddings
            WHERE {query_filter}
        ) s
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, cell ASC) <= {nprobe}
    ), cand AS (
        SELECT DISTINCT p.query_id, p.embedding AS qemb, cl.vec_id AS neighbor_id,
               cl.embedding AS cemb
        FROM probe p JOIN cells cl USING (cell)
        WHERE p.query_id <> cl.vec_id
    ), scored AS (
        SELECT query_id, neighbor_id,
               {_dot_sql('qemb', 'cemb')} /
               (sqrt({_dot_sql('qemb', 'qemb')}) * sqrt({_dot_sql('cemb', 'cemb')})) AS cosine
        FROM cand
    )
    SELECT query_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank,
           neighbor_id, ROUND(cosine, 6) AS cosine
    FROM scored
    QUALIFY rank <= {k}
    """


def cosine_neardup_sql(threshold: float = 0.95, n_planes: int = LSH_PLANES) -> str:
    dot = _dot_sql("va.embedding", "vb.embedding")
    na = f"sqrt({_dot_sql('va.embedding', 'va.embedding')})"
    nb = f"sqrt({_dot_sql('vb.embedding', 'vb.embedding')})"
    return f"""
    WITH buckets AS ({lsh_bucket_sql(n_planes)}),
    cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM buckets a JOIN buckets b USING (bucket)
        WHERE a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, ROUND({dot} / ({na} * {nb}), 6) AS cosine
    FROM cand
    JOIN embeddings va ON va.vec_id = vec_a
    JOIN embeddings vb ON vb.vec_id = vec_b
    WHERE {dot} / ({na} * {nb}) >= {threshold}
    """
