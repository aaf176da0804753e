"""Deduplication family over the documents table.

Exact (hash-groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
(shingle -> K minhashes -> banded buckets -> bucket join), SimHash
(per-bit majority of token hashes).  Every op is pure Column algebra —
shingling is explode/transform, min-hashing is a groupBy(min), LSH is
an equi-join on band keys — so the whole family scales as ordinary
shuffles and stays SQL-expressible for the DuckDB oracle.

Hash function note: both engines share md5; all hashes here are md5
strings (string MIN is a valid uniform minhash order) so Spark and
DuckDB produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_SIZE = 3
MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows


def _spread_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Spread a few-partition input before the md5-heavy token/shingle
    explodes (measured: minhash_lsh over a 5000-doc single-row-group
    parquet 6.1s serial -> 1.6s spread; see operators/partitioning.py
    for the scale argument)."""
    from mapchete_spark.operators.partitioning import spread_small_input

    return spread_small_input(df, id_col)


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct 3-token shingle md5s per doc (explode of a slide window).

    Docs with fewer than SHINGLE_SIZE tokens are dropped on BOTH the
    Spark side and the SQL twin: Spark's concat_ws would silently skip
    NULL element_at lookups while the SQL twin's ``||`` propagates NULL,
    so short docs are guarded identically instead (oracle-twin
    guarantee)."""
    df = _spread_by_id(df, id_col)
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (SHINGLE_SIZE - 1), F.lit(1)))
    sh = F.transform(
        idx,
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(toks, (i + k).cast("int")) for k in range(SHINGLE_SIZE)]
            )
        ),
    )
    return df.where(n >= SHINGLE_SIZE).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(sh)).alias("shingle"),
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


MAX_SHINGLE_DF = 1000  # stop-shingle cap: drop shingles shared by more docs


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = MAX_SHINGLE_DF,
    eager_release: bool = True,
) -> DataFrame:
    """Candidate pairs sharing >= 1 shingle with Jaccard >= threshold.

    Self-join on the shingle key (the inverted index IS the join).
    Shingles with document frequency > ``max_shingle_df`` are dropped
    BEFORE the self-join (and from the per-doc sizes, so jaccard is
    computed over the filtered shingle universe): one stop-shingle
    shared by 10^8 docs would otherwise make the join quadratic.
    The SQL twin applies the same cap. Output: (doc_a, doc_b, jaccard)."""
    from pyspark import StorageLevel

    # the exploded shingle table is corpus-sized: spill to disk rather
    # than pinning executor memory (used by df-filter + both join sides)
    sh_all = shingles(df, id_col, text_col).persist(StorageLevel.DISK_ONLY)
    # hot shingles via groupBy (map-side combine absorbs the hot keys —
    # a window over `shingle` would re-create the very skew this avoids),
    # then a broadcast anti-join (the hot set is tiny by construction)
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > max_shingle_df)
        .select("shingle")
    )
    sh = sh_all.join(F.broadcast(hot), on="shingle", how="left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    # materialize the (small, post-threshold) pair set so the
    # corpus-sized shingle persist can be released before returning —
    # otherwise repeated calls leak DISK_ONLY storage entries for the
    # lifetime of the session. eager_release=False returns the lazy
    # plan instead; the caller then owns triggering + unpersisting.
    if eager_release:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            sh_all.unpersist()
    return out


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, k, minhash): K independent min-hashes; hash_k(s) =
    md5(k || ':' || shingle), minimum taken as string order.

    Computed as K parallel MIN aggregates over one shingle pass (no
    K-times row explode: 16 agg columns cost one shuffle of one row
    per doc instead of 16x the shingle table), then unpivoted."""
    sh = shingles(df, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat_ws(":", F.lit(k), F.col("shingle")))).alias(f"mh{k}")
        for k in range(MINHASH_K)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("k"), F.col(f"mh{k}").alias("minhash"))
            for k in range(MINHASH_K)
        ]
    )
    return wide.select(
        "doc_id", F.explode(pairs).alias("kv")
    ).select("doc_id", F.col("kv.k").alias("k"), F.col("kv.minhash").alias("minhash"))


def lsh_band_buckets(signatures: DataFrame) -> DataFrame:
    """(doc_id, band, bucket): md5 of the band's concatenated minhashes."""
    rows_per_band = MINHASH_K // LSH_BANDS
    # floor division on BOTH engines (DuckDB CAST(x AS INT) rounds,
    # Spark cast truncates — see the '//' in the SQL twin)
    banded = signatures.withColumn(
        "band", F.floor(F.col("k") / rows_per_band).cast("int")
    )
    return (
        banded.groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(F.array_sort(F.collect_list(F.concat_ws("|", "k", "minhash"))), ",")
            ).alias("bucket")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eager_release: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any LSH band bucket.

    The bucket table feeds BOTH sides of the self-join; without a
    persist the whole shingle -> 16-minhash -> band pipeline is planned
    (and executed) twice — once per join side (measured 1.5s -> 1.0s at
    sf0.1 with the persist, and at corpus scale it halves the dominant
    hashing pass). Mirrors ngram_jaccard_pairs: persist the buckets,
    materialize the (small, post-filter) pair set, release the persist
    before returning; ``eager_release=False`` returns the lazy
    twice-planned form and the caller owns persistence."""
    from pyspark import StorageLevel

    buckets = lsh_band_buckets(minhash_signatures(df, id_col, text_col))
    if eager_release:
        buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a = buckets.alias("a")
    b = buckets.alias("b")
    out = (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    if eager_release:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            buckets.unpersist()
    return out


def minhash_lsh_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_iterations: int = 20,
    buckets: DataFrame = None,
) -> DataFrame:
    """Near-dup CLUSTERS via connected components over the LSH-bucket
    graph: every doc gets the MIN doc_id of its component as cluster id.

    This is the at-scale shape of dedup output: emitting PAIRS is
    quadratic in cluster size (a 10^6-doc duplicate cluster would emit
    5*10^11 pairs), while labels are linear. Components are computed by
    alternating min-label propagation through the (doc, bucket)
    bipartite graph (two shuffles: groupBy bucket, then groupBy doc)
    PLUS a pointer-doubling shortcut per round (label <- label[label],
    one more join) — propagation alone walks one hop per round
    (O(diameter) rounds); with path doubling the label graph's depth
    halves every round, giving O(log(diameter)) rounds total. Each
    round's result is localCheckpoint()ed so the plan doesn't grow.
    If ``max_iterations`` is exhausted without convergence a
    RuntimeWarning is emitted (labels may split one component).

    ``buckets`` (optional): a precomputed (doc_id, bkey) bipartite edge
    table — callers with their own signatures/blocking keys reuse the
    CC machinery directly; default derives LSH band buckets from text.

    Output: (doc_id, cluster) — cluster == doc_id for singletons."""
    if buckets is None:
        buckets = lsh_band_buckets(minhash_signatures(df, id_col, text_col)).select(
            "doc_id", F.concat_ws("|", "band", "bucket").alias("bkey")
        )
    docs = df.select(F.col(id_col).alias("doc_id")).distinct()
    labels = docs.withColumn("label", F.col("doc_id"))
    edges = buckets.persist()
    converged = False
    try:
        for _ in range(max_iterations):
            # doc label -> bucket min -> back to docs
            bucket_min = (
                edges.join(labels, "doc_id")
                .groupBy("bkey")
                .agg(F.min("label").alias("bmin"))
            )
            propagated = (
                edges.join(bucket_min, "bkey")
                .groupBy("doc_id")
                .agg(F.min("bmin").alias("via_bucket"))
                .join(labels, "doc_id", "right")
                .select(
                    "doc_id",
                    F.least(
                        F.coalesce(F.col("via_bucket"), F.col("label")), F.col("label")
                    ).alias("label"),
                )
            )
            # pointer doubling: label <- label[label]. Labels only ever
            # decrease and label(x) <= x, so the label graph is a forest
            # pointing at component minima; shortcutting halves its
            # depth each round -> logarithmic total rounds even for
            # path-shaped duplicate chains.
            grand = propagated.select(
                F.col("doc_id").alias("label"), F.col("label").alias("glabel")
            )
            new_labels = (
                propagated.join(grand, "label", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("label"), F.coalesce(F.col("glabel"), F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .where(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if not changed:
                converged = True
                break
    finally:
        edges.unpersist()
    if not converged:
        import warnings

        warnings.warn(
            f"minhash_lsh_clusters: not converged after {max_iterations} "
            "iterations — some duplicate chains may carry split cluster "
            "labels; raise max_iterations",
            RuntimeWarning,
        )
    return labels.select("doc_id", F.col("label").alias("cluster"))


def minhash_lsh_clusters_sql() -> str:
    """Recursive-CTE twin: transitive min-label closure over the
    LSH-bucket edges (doc -- bucket -- doc)."""
    return f"""
    WITH RECURSIVE sig AS ({minhash_signatures_sql()}),
    buckets AS (
        SELECT doc_id, CAST(k // {MINHASH_K // LSH_BANDS} AS INT) AS band,
               md5(array_to_string(list_sort(list(CAST(k AS VARCHAR) || '|' || minhash)), ',')) AS bucket
        FROM sig GROUP BY doc_id, band
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        FROM buckets a JOIN buckets b USING (band, bucket)
    ),
    reach (doc_id, label) AS (
        SELECT src, MIN(dst) FROM pairs GROUP BY src
        UNION
        SELECT p.src, r.label
        FROM reach r JOIN pairs p ON p.dst = r.doc_id
        WHERE r.label < p.src
    )
    SELECT d.doc_id, COALESCE(MIN(r.label), d.doc_id) AS cluster
    FROM documents d LEFT JOIN reach r ON r.doc_id = d.doc_id
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


SIMHASH_BITS = 64


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash: bit i (1-based) = majority over tokens of bit i
    of md5(token) — extracted from the hex string as 2 bits per hex
    char (high bit and second bit of the nibble), deterministic and
    identical in SQL. Bit 64 carries the sign (weight -2^63), so the
    full 64-bit space is used without unsigned arithmetic.

    64 bits (vs 32) keep the banded near-dup join selective at corpus
    scale: with 8 banded bytes each (band, byte) bucket stays small
    even at 10^12 docs, while 4 bytes of a 32-bit hash would put ~10^9
    docs in every bucket.

    Output: (doc_id, simhash:long)."""
    tok_md5 = _spread_by_id(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select("doc_id", F.md5("tok").alias("h"))
    # bit i lives in hex char ceil(i/2): odd i -> nibble high bit (>=8),
    # even i -> nibble second bit (in 4-7 or c-f)
    bits = tok_md5.withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.lit(SIMHASH_BITS)))
    ).select(
        "doc_id",
        "i",
        F.when(
            (F.col("i") % 2 == 1)
            & F.substring(F.col("h"), ((F.col("i") + 1) / 2).cast("int"), 1).isin(*"89abcdef"),
            1,
        )
        .when(
            (F.col("i") % 2 == 0)
            & F.substring(F.col("h"), ((F.col("i") + 1) / 2).cast("int"), 1).isin(*"4567cdef"),
            1,
        )
        .otherwise(0)
        .alias("bit"),
    )
    agg = bits.groupBy("doc_id", "i").agg(
        F.sum("bit").alias("ones"), F.count(F.lit(1)).alias("n")
    )
    return (
        agg.withColumn(
            "weighted",
            F.when(
                F.col("ones") * 2 >= F.col("n"),
                F.when(F.col("i") == 64, F.lit(-(2**63)).cast("long")).otherwise(
                    F.pow(F.lit(2.0), (F.col("i") - 1).cast("double")).cast("long")
                ),
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("doc_id")
        .agg(F.sum("weighted").cast("long").alias("simhash"))
    )


SIMHASH_BANDS = 8  # 8 bytes of the 64-bit simhash
SIMHASH_MAX_HAMMING = 3


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    id_col: str = "doc_id",
    text_col: str = "text",
    eager_release: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit simhash into 8 bytes,
    candidates share >= 1 band (pigeonhole: any pair within hamming 7
    must agree on at least one byte), verify with bit_count(xor).
    Output: (doc_a, doc_b, hamming).

    Same self-join persist as minhash_lsh_pairs: the 64-bit-majority
    signature pipeline is the dominant cost and feeds both join sides;
    persist it once instead of executing it twice."""
    from pyspark import StorageLevel

    sh = simhash(df, id_col, text_col)
    if eager_release:
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    # arithmetic shift + & 255 extracts the byte regardless of sign
    # (identical semantics in DuckDB's >> / &)
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), band * 8).bitwiseAND(F.lit(255))
            for band in range(SIMHASH_BANDS)
        ]
    )
    banded = sh.select(
        "doc_id", "simhash", F.posexplode(band_vals).alias("band", "band_val")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, on=["band", "band_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    out = (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
    if eager_release:
        try:
            out = out.localCheckpoint(eager=True)
        finally:
            sh.unpersist()
    return out


# ---- DuckDB SQL twins --------------------------------------------------------


def shingles_sql(text: str = "text") -> str:
    """CTE body: (doc_id, shingle) distinct 3-gram md5s. Short docs
    (< SHINGLE_SIZE tokens) are dropped, mirroring shingles()."""
    toks = f"string_split({text}, ' ')"
    return f"""
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                   generate_series(1, GREATEST(len({toks}) - {SHINGLE_SIZE - 1}, 1)),
                   i -> md5({toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])
               )) AS shingle
        FROM documents
        WHERE len({toks}) >= {SHINGLE_SIZE}
    )
    """


def dedup_exact_sql(text: str = "text") -> str:
    return f"""
    SELECT md5({text}) AS content_md5,
           MIN(doc_id) AS keeper,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """


def ngram_jaccard_sql(threshold: float = 0.5, max_shingle_df: int = MAX_SHINGLE_DF) -> str:
    return f"""
    WITH sh_all AS ({shingles_sql()}),
    sh AS (
        SELECT doc_id, shingle FROM sh_all
        WHERE shingle NOT IN (
            SELECT shingle FROM sh_all GROUP BY 1 HAVING COUNT(*) > {max_shingle_df}
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
    """


def minhash_signatures_sql() -> str:
    return f"""
    WITH sh AS ({shingles_sql()}),
    seeded AS (
        SELECT doc_id, shingle, UNNEST(generate_series(0, {MINHASH_K - 1})) AS k
        FROM sh
    )
    SELECT doc_id, k, MIN(md5(CAST(k AS VARCHAR) || ':' || shingle)) AS minhash
    FROM seeded GROUP BY doc_id, k
    """


def minhash_lsh_pairs_sql() -> str:
    rows_per_band = MINHASH_K // LSH_BANDS
    return f"""
    WITH sig AS ({minhash_signatures_sql()}),
    buckets AS (
        SELECT doc_id, CAST(k // {rows_per_band} AS INT) AS band,
               md5(array_to_string(list_sort(list(CAST(k AS VARCHAR) || '|' || minhash)), ',')) AS bucket
        FROM sig GROUP BY doc_id, band
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b USING (band, bucket)
    WHERE a.doc_id < b.doc_id
    """


def simhash_neardup_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    return f"""
    WITH sh AS ({simhash_sql()}),
    banded AS (
        SELECT doc_id, simhash,
               UNNEST(generate_series(0, {SIMHASH_BANDS - 1})) AS band
        FROM sh
    ), banded2 AS (
        -- arithmetic shift + & 255 == Spark's shiftright + bitwiseAND
        SELECT doc_id, simhash, band,
               (simhash >> (band * 8)) & 255 AS band_val
        FROM banded
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM banded2 a JOIN banded2 b USING (band, band_val)
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


def simhash_sql(text: str = "text") -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, md5(UNNEST(string_split({text}, ' '))) AS h FROM documents
    ),
    bits AS (
        SELECT doc_id, UNNEST(generate_series(1, {SIMHASH_BITS})) AS i, h FROM tok
    ),
    agg AS (
        SELECT doc_id, i,
               SUM(CASE
                   WHEN i % 2 = 1 AND substr(h, CAST((i + 1) // 2 AS INT), 1) IN
                       ('8','9','a','b','c','d','e','f') THEN 1
                   WHEN i % 2 = 0 AND substr(h, CAST((i + 1) // 2 AS INT), 1) IN
                       ('4','5','6','7','c','d','e','f') THEN 1
                   ELSE 0 END) AS ones,
               COUNT(*) AS n
        FROM bits GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN ones * 2 >= n THEN
                    CASE WHEN i = 64 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                         ELSE CAST(POWER(2.0, i - 1) AS BIGINT) END
                    ELSE 0 END) AS BIGINT) AS simhash
    FROM agg GROUP BY doc_id
    """


# ---- benchmark decontamination ----------------------------------------------

# docs whose id satisfies this residue form the synthetic "benchmark"
# set (the blocklist); everything else is training corpus
BENCHMARK_RESIDUE = 5
BENCHMARK_MOD = 17


def ngram_contamination(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    3-token shingle with the benchmark set — the standard n-gram
    overlap check run before LLM training to drop eval contamination.

    Plan shape (the 100-TB posture): the benchmark side is tiny
    relative to the corpus, so its distinct shingle set is BROADCAST
    and the probe is a map-side hash join over the corpus shingles —
    no shuffle of the corpus, no pair materialization. Output is one
    row per contaminated doc with the match count and the number of
    distinct benchmark docs hit.

    Returns (doc_id, n_matched_shingles, n_benchmark_docs)."""
    is_bench = (F.col(id_col) % BENCHMARK_MOD) == BENCHMARK_RESIDUE
    bench_sh = shingles(
        docs.where(is_bench), id_col=id_col, text_col=text_col
    ).select(F.col("doc_id").alias("bench_id"), "shingle")
    corpus_sh = shingles(docs.where(~is_bench), id_col=id_col, text_col=text_col)
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matched_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
    )


def ngram_contamination_sql() -> str:
    """DuckDB twin: identical shingle derivation (md5 over 3-token
    windows, distinct per doc) + blocklist join + per-doc counts."""
    shingle = """
        SELECT DISTINCT doc_id, md5(t1 || ' ' || t2 || ' ' || t3) AS shingle
        FROM (
            SELECT doc_id,
                   toks[CAST(i AS INT)] AS t1,
                   toks[CAST(i AS INT) + 1] AS t2,
                   toks[CAST(i AS INT) + 2] AS t3
            FROM (
                SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents
                WHERE len(string_split(text, ' ')) >= 3 AND ({side})
            ) CROSS JOIN LATERAL UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
        )
    """
    bench = shingle.format(side=f"doc_id % {BENCHMARK_MOD} = {BENCHMARK_RESIDUE}")
    corpus = shingle.format(side=f"doc_id % {BENCHMARK_MOD} <> {BENCHMARK_RESIDUE}")
    return f"""
    WITH bench AS ({bench}), corpus AS ({corpus})
    SELECT c.doc_id AS doc_id,
           COUNT(*) AS n_matched_shingles,
           COUNT(DISTINCT b.doc_id) AS n_benchmark_docs
    FROM corpus c JOIN bench b ON b.shingle = c.shingle
    GROUP BY c.doc_id
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# Line-level dedup (boilerplate removal) — round 5
# ---------------------------------------------------------------------------

#: a line must appear in at least this many distinct docs to count as
#: boilerplate (RefinedWeb uses doc-frequency thresholds of this shape)
LINE_DEDUP_MIN_DF = 8


def dedup_lines(
    docs: DataFrame,
    min_doc_frequency: int = LINE_DEDUP_MIN_DF,
    sep: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level line deduplication: drop every line that occurs in
    >= ``min_doc_frequency`` distinct documents (navigation bars,
    cookie banners, license footers — the boilerplate class CCNet's
    paragraph-hash dedup and RefinedWeb's line-level filters remove
    from web corpora). Returns one row per input doc: the rebuilt
    text (kept lines joined in original order), kept/removed counts.

    Scale shape (100 TB): the document-frequency aggregation groups on
    a 64-bit line hash (map-side combinable count over (hash, doc)
    pre-distinct), and the boilerplate set joins back by HASH — never
    the line text — so shuffle width is 8 bytes/line either side. The
    boilerplate table is df-filtered (|boilerplate| <= total_lines /
    min_df) and usually tiny, but the join is left as an equi-join for
    AQE to broadcast WHEN small rather than hard-coding a driver
    collect (the rarity-model lesson, functions/rarity.py). Rebuild is
    one groupBy(doc_id) — a single shuffle of the kept lines.
    """
    # \Q..\E: the separator is LITERAL (F.split takes a Java regex, but
    # array_join rejoins verbatim — they must agree on '|', '.', etc.)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + sep + "\\E")
        ).alias("pos", "line"),
    ).withColumn("line_h", F.xxhash64("line"))
    boiler = (
        lines.select("line_h", id_col)
        .distinct()
        .groupBy("line_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= F.lit(min_doc_frequency))
        .select("line_h")
    )
    kept = lines.join(boiler, "line_h", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (F.col("n_lines") - F.coalesce("n_lines_kept", F.lit(0))).alias(
                "n_lines_removed"
            ),
        )
    )
