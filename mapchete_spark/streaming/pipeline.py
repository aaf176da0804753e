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


def stream_pyramid_maintenance(
    spark: SparkSession,
    base_stream_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    pyramid=None,
    base_zoom: int = 5,
    min_zoom: int = 3,
    resampling: str = "average",
):
    """Incremental pyramid maintenance: a STREAM of base-zoom tiles
    keeps every overview level fresh (Z2 refresh on Structured
    Streaming). Per micro-batch (foreachBatch):

    1. patch the base-level snapshot with the batch (anti-join on
       tile_key + union, dir swap — NOT a blind append: foreachBatch
       can replay a batch after failure, and an append would duplicate
       base rows on replay; the patch recomputes to the same snapshot),
    2. refresh ONLY the overview tiles whose descendants arrived
       (operators/refresh.refresh_overviews — unchanged siblings still
       contribute through the level read-back),
    3. patch each overview snapshot (anti-join + union, atomic dir swap).

    The streaming checkpoint provides exactly-once input progress; every
    level's write (base included) is idempotent under batch replay
    because each is a snapshot recomputation keyed on tile_key, so a
    replayed batch produces the identical patched table. Re-delivered
    tile versions replace the previous row. trigger=availableNow
    drains everything then stops (tests); continuous on a cluster."""
    import shutil

    from mapchete_spark.operators.rastertable import RASTER_SCHEMA
    from mapchete_spark.operators.refresh import refresh_overviews
    from mapchete_spark.tilegrid.pyramid import TilePyramid

    pyr = pyramid or TilePyramid("geodetic")

    def level_path(z: int) -> str:
        return os.path.join(out_dir, f"zoom={z}")

    def swap_in(dst: str, tmp: str) -> None:
        """Replace ``dst`` with ``tmp`` without a window where neither
        exists: rename the old table aside, move the new one in, then
        delete the old copy. ``read_level`` recovers from the aside
        copy if a crash lands between the two moves."""
        aside = dst + "__old"
        if os.path.exists(aside):
            shutil.rmtree(aside)
        if os.path.exists(dst):
            shutil.move(dst, aside)
        shutil.move(tmp, dst)
        if os.path.exists(aside):
            shutil.rmtree(aside)

    def read_level(z: int) -> DataFrame:
        p = level_path(z)
        if not os.path.exists(p) and os.path.exists(p + "__old"):
            shutil.move(p + "__old", p)
        try:
            return spark.read.schema(RASTER_SCHEMA).parquet(p)
        except Exception:
            return spark.createDataFrame([], RASTER_SCHEMA)

    def handle_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        # idempotent base write: patch-and-swap the base snapshot
        # keyed on tile_key (replaying the same batch recomputes the
        # identical table; a blind append would duplicate rows)
        base_existing = read_level(base_zoom)
        base_patched = base_existing.join(
            batch_df.select(F.col("tile_key").alias("__bk")).distinct(),
            on=base_existing["tile_key"] == F.col("__bk"),
            how="left_anti",
        ).unionByName(batch_df)
        base_tmp = level_path(base_zoom) + "__patch"
        base_patched.write.mode("overwrite").parquet(base_tmp)
        swap_in(level_path(base_zoom), base_tmp)
        changed = batch_df.select("tile_key").distinct()
        # phase 1: materialize every patched level to a tmp dir while
        # the OLD snapshots still exist (the refresh plans read them
        # lazily across levels); phase 2: swap all dirs at once
        tmps = []
        for z, refreshed in refresh_overviews(
            read_level, changed, pyr, base_zoom, min_zoom, resampling=resampling
        ):
            existing = read_level(z)
            patched = existing.join(
                refreshed.select(F.col("tile_key").alias("__rk")),
                on=existing["tile_key"] == F.col("__rk"),
                how="left_anti",
            ).unionByName(refreshed)
            tmp = level_path(z) + "__patch"
            patched.write.mode("overwrite").parquet(tmp)
            tmps.append((z, tmp))
        for z, tmp in tmps:
            swap_in(level_path(z), tmp)

    stream = spark.readStream.schema(
        "zoom int, tile_row long, tile_col long, tile_key long, "
        "bands int, height int, width int, dtype string, nodata double, data binary"
    ).parquet(base_stream_dir)
    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session windows per user (the events-axis range
    operator): a new session starts when the inter-event gap exceeds
    ``gap_minutes``. Classic lag + cumulative-sum sessionization —
    the window partitions by user_id, so parallelism is per-user
    (salt bot-grade users by day at corpus scale). Timestamps reduce
    through unix_micros (exact int64 arithmetic, oracle-identical).

    Streaming twin: the same semantics run incrementally with
    applyInPandasWithState keyed by user (see stream_dedup_first_seen
    for the state pattern); the batch form is the oracle-checked one.
    """
    from pyspark.sql import Window

    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events carry TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the cast
    # is a type relabel (driver-local epoch semantics match DuckDB's
    # epoch_us on the same naive timestamps when the session TZ is UTC)
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = events.select(
        "user_id", "event_id", "ts", "value", tus.alias("tus")
    ).withColumn(
        "brk",
        F.when(
            F.lag("tus").over(w).isNull()
            | ((F.col("tus") - F.lag("tus").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_idx",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max("tus") - F.min("tus")).cast("long").alias("duration_us"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def stream_chunk_spans(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: Optional[str] = None,
):
    """Streaming span-aware chunk packing: documents stream in and
    their token-budgeted chunk rows (functions/chunking.chunk_spans —
    a map-only Arrow pass, so it lifts onto a stream unchanged) append
    to the chunk table. Exactly-once via the source offset log; no
    state store needed because chunking is per-document."""
    from mapchete_spark.functions.chunking import chunk_spans

    schema = schema or (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    chunks = chunk_spans(stream)
    return (
        chunks.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_decontaminate(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    blocklist_docs=None,
    schema: Optional[str] = None,
):
    """Streaming benchmark decontamination: incoming documents shingle
    and probe a STATIC broadcast blocklist (stream-static join — the
    static side resolves per micro-batch, the stream side never
    shuffles). Contaminated doc flags append to ``out_dir``; batch twin
    is operators/dedup.ngram_contamination.

    ``blocklist_docs``: static DataFrame of benchmark docs; defaults to
    reading ``docs_dir`` and applying the standard benchmark residue."""
    from mapchete_spark.operators.dedup import (
        BENCHMARK_MOD,
        BENCHMARK_RESIDUE,
        shingles,
    )

    schema = schema or (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    if blocklist_docs is None:
        blocklist_docs = spark.read.schema(schema).parquet(docs_dir).where(
            (F.col("doc_id") % BENCHMARK_MOD) == BENCHMARK_RESIDUE
        )
    bench_sh = shingles(blocklist_docs).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    corpus_sh = shingles(
        stream.where((F.col("doc_id") % BENCHMARK_MOD) != BENCHMARK_RESIDUE)
    )
    # the per-doc aggregation happens INSIDE foreachBatch: a document's
    # row (hence all its shingles) arrives in exactly one micro-batch,
    # so per-batch groupBy(doc_id) is complete without a state store
    def _write_batch(bdf, bid):
        # Idempotent under micro-batch REPLAY: plain mode("append")
        # would re-append rows when a batch is retried after a partial
        # failure. Instead each batch lands at deterministic
        # batch-id-derived file names — a retry overwrites its own
        # previous attempt, never duplicates it. The _tmp staging dir
        # starts with "_" so parquet readers of out_dir ignore it even
        # if a crash strands one. (On an object store, route this
        # through the transactional file sink instead, as
        # stream_chunk_spans does.)
        import glob
        import shutil

        agg = bdf.groupBy("doc_id").agg(
            F.count("*").alias("n_matched_shingles"),
            F.countDistinct("bench_id").alias("n_benchmark_docs"),
        )
        tmp = os.path.join(out_dir, f"_tmp_batch_{bid}")
        agg.write.mode("overwrite").parquet(tmp)
        for old in glob.glob(
            os.path.join(out_dir, f"batch-{bid:05d}-*.parquet")
        ):
            os.remove(old)
        for i, p in enumerate(
            sorted(glob.glob(os.path.join(tmp, "*.parquet")))
        ):
            os.replace(
                p, os.path.join(out_dir, f"batch-{bid:05d}-{i:04d}.parquet")
            )
        shutil.rmtree(tmp, ignore_errors=True)

    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .writeStream.outputMode("append")
        .foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_quality_filter(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: Optional[str] = None,
):
    """Streaming Gopher repetition filter: per-doc repetition stats
    (functions/repetition.repetition_stats — map-only Arrow pass, so it
    lifts onto a stream unchanged) computed as documents arrive; rows
    for KEPT documents append to the survivors table through the
    transactional file sink. Exactly-once via the source offset log; no
    state store (every statistic is per-document)."""
    from pyspark.sql import functions as _F

    from mapchete_spark.functions.repetition import repetition_stats

    schema = schema or (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    stats = repetition_stats(stream).where(_F.col("gopher_keep"))
    return (
        stats.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_pii_scrub(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    schema: Optional[str] = None,
):
    """Streaming PII scrub (round 5): per-doc detection counts +
    redacted text (functions/pii — pure Column regexps, map-only, so
    the batch operator lifts onto a stream unchanged) computed as
    documents arrive. Exactly-once via the source offset log; no state
    store (redaction is per-document)."""
    from pyspark.sql import functions as _F

    from mapchete_spark.functions.pii import pii_count_cols, redact_col

    schema = schema or (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    counts = pii_count_cols(_F.col("text"))
    scrubbed = stream.select(
        "doc_id",
        *[v.alias(k) for k, v in counts.items()],
        redact_col(_F.col("text")).alias("redacted_text"),
    )
    return (
        scrubbed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
