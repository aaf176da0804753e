#!/usr/bin/env python
"""spark-submit entry point: run the training-corpus build pipeline.

    spark-submit --py-files mapchete_spark.zip jobs/corpus.py \
        /path/to/documents.parquet /path/to/out \
        [--no-dedup] [--no-quality] [--no-sample] [--shard-tokens N]

Chains the engine's corpus operators the way `__spark_entry__`'s
pipeline contract queries verify them: exact dedup (keep min doc_id per
content hash) -> Gopher repetition filter -> deterministic stratified
sample -> span-aware chunk packing -> fixed-token shard assignment.
Writes:

    out/chunks/          chunk rows with shard_id (parquet, partitioned
                         by shard_id so one shard = one directory)
    out/stats.json       per-stage survivor counts + shard stats

(the corpus-side sibling of jobs/execute.py; SURVEY.md §2.7 J9)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("documents")
    ap.add_argument("out")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--no-quality", action="store_true")
    ap.add_argument("--no-sample", action="store_true")
    ap.add_argument("--shard-tokens", type=int, default=4096)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mapchete_spark.functions.chunking import chunk_spans
    from mapchete_spark.functions.repetition import repetition_stats
    from mapchete_spark.operators.sampling import stratified_sample
    from mapchete_spark.operators.sharding import assign_shards
    from mapchete_spark.session import get_spark, stop_unless_kept

    spark = get_spark("mapchete_spark:corpus")
    docs = spark.read.parquet(args.documents)
    stats = {"input_docs": docs.count()}

    if not args.no_dedup:
        keepers = (
            docs.groupBy(F.md5("text").alias("content_md5"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        docs = docs.join(keepers, "doc_id")
        stats["after_dedup"] = docs.count()
    if not args.no_quality:
        kept = repetition_stats(docs).where(F.col("gopher_keep")).select("doc_id")
        docs = docs.join(kept, "doc_id")
        stats["after_quality"] = docs.count()
    if not args.no_sample:
        docs = stratified_sample(docs)
        stats["after_sample"] = docs.count()

    shards = assign_shards(docs, shard_tokens=args.shard_tokens).select(
        "doc_id", "shard_id"
    )
    chunks = chunk_spans(docs).join(shards, "doc_id")
    chunks.write.mode("overwrite").partitionBy("shard_id").parquet(
        os.path.join(args.out, "chunks")
    )
    out_chunks = spark.read.parquet(os.path.join(args.out, "chunks"))
    agg = out_chunks.agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("shard_id").alias("n_shards"),
        F.sum("chunk_tokens").alias("total_tokens"),
    ).collect()[0]
    stats.update(
        n_chunks=int(agg["n_chunks"]),
        n_shards=int(agg["n_shards"]),
        total_tokens=int(agg["total_tokens"]),
        shard_tokens=args.shard_tokens,
    )
    with open(os.path.join(args.out, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps({"status": "done", **stats}))
    stop_unless_kept(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
