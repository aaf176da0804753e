"""Structured Streaming pipelines.

The reference is batch-only; its 'continue mode' resumability is the
seed of the north rule's 'Structured-Streaming-style checkpoints'.
This module provides the true streaming path:

- ``stream_events_windowed``: watermarked tumbling-window aggregation
  over the events table (readStream file source -> window agg ->
  sink), with exactly-once progress via the streaming checkpoint dir.
- ``stream_docs_to_tiles``: incremental tile assignment — new documents
  stream in, get assigned to tiles, and append to the tile table; a
  downstream batch rollup refreshes overviews from the checkpoint delta
  (Z2 semantics on a stream).

Both run with trigger=availableNow in tests (drain-all-then-stop), the
idiomatic batch-over-stream pattern; on a real cluster the same code
runs continuously.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapchete_spark.functions.geo import lat_col, lon_col, tile_key_col
from mapchete_spark.functions.geo import tile_col_expr, tile_row_expr


def stream_events_windowed(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    schema: Optional[str] = None,
):
    """Watermarked tumbling-window event counts, file-source streaming.

    Returns the StreamingQuery (caller awaits termination). Late rows
    beyond the watermark are dropped; state is bounded.
    """
    schema = schema or (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def batch_events_windowed(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    """Batch twin of stream_events_windowed (same plan, no watermark) —
    used to assert stream==batch equivalence on bounded input."""
    ev = spark.read.parquet(events_path)
    return (
        ev.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def stream_dedup_first_seen(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: Optional[str] = None,
):
    """Custom stateful streaming operator (applyInPandasWithState):
    exact dedup on a document stream — per content-hash state remembers
    whether the hash was seen; only the FIRST occurrence (smallest
    doc_id within a batch) is emitted. State is keyed by md5(text), so
    it shards across executors and survives restarts through the
    streaming checkpoint."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = schema or (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(docs_dir)
        .withColumn("content_md5", F.md5(F.col("text")))
    )

    def dedup_fn(key, pdfs, state: GroupState):
        if state.exists:
            # already emitted for this hash: drop everything
            for _ in pdfs:
                pass
            return iter([])
        best = None
        for pdf in pdfs:
            cand = pdf.loc[pdf["doc_id"].idxmin()]
            if best is None or cand["doc_id"] < best["doc_id"]:
                best = cand
        if best is None:
            return iter([])
        state.update((True,))
        return iter(
            [
                pd.DataFrame(
                    {
                        "content_md5": [key[0]],
                        "doc_id": [int(best["doc_id"])],
                    }
                )
            ]
        )

    deduped = stream.groupBy("content_md5").applyInPandasWithState(
        dedup_fn,
        outputStructType="content_md5 string, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_docs_to_tiles(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    zoom: int = 8,
    schema: Optional[str] = None,
):
    """Incremental tile assignment: documents stream -> geo derivation
    -> tile keys -> append to the tile-assignment table. The streaming
    checkpoint IS the continue-mode state (no anti-join needed: the
    source offset log guarantees each input file is processed once)."""
    schema = schema or (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    did = F.col("doc_id")
    assigned = (
        stream.withColumn("lon", lon_col(did))
        .withColumn("lat", lat_col(did))
        .withColumn("zoom", F.lit(zoom))
        .withColumn("tile_row", tile_row_expr(F.col("lat"), zoom))
        .withColumn("tile_col", tile_col_expr(F.col("lon"), zoom))
        .withColumn(
            "tile_key",
            tile_key_col(F.col("zoom"), F.col("tile_row"), F.col("tile_col")),
        )
        .select("doc_id", "zoom", "tile_row", "tile_col", "tile_key")
    )
    return (
        assigned.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
