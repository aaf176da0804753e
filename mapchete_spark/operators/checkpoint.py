"""Resumable execution: checkpoint, lineage and metrics tables.

Generalizes the reference's continue-mode (J1/J2: skip-existing via
batched tile listing, mapchete/path.py:944-1183 + write guards
processing/base.py:456-504) into Structured-Streaming-style state
tables (north rule: 'resumable from checkpoint with per-partition
lineage and metrics tables'):

- checkpoint: one row per completed tile (tile_key + payload hash +
  run id). Continue mode = LEFT ANTI JOIN against it — no filesystem
  listing, no per-tile HEADs; at 10^12 docs this is the only shape
  that survives.
- lineage: one row per (tile, run) recording the Spark partition that
  produced it and a content fingerprint — enough to re-trace which
  partition of which run wrote what (overview refresh Z2 propagates
  changed tiles through this table instead of re-reading the world).
- metrics: per-stage row counts + wall time per run (J6 profilers).

All three are plain parquet append tables keyed by run_id — engine
state, not data; small relative to outputs.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHECKPOINT_SCHEMA = "tile_key long, payload_md5 string, run_id string, finished_at double"
LINEAGE_SCHEMA = (
    "tile_key long, zoom int, partition_id int, n_src_rows long, "
    "payload_md5 string, run_id string"
)
METRICS_SCHEMA = (
    "run_id string, stage string, n_rows long, wall_ms double, at double, "
    # J6 task-metrics profile (operators/profilers.StageMetricsProfiler;
    # nulls when no profiler was attached)
    "task_run_ms double, peak_mem_bytes long, shuffle_read_bytes long, "
    "shuffle_write_bytes long, spilled_bytes long"
)

# J7 status lifecycle (reference mapchete/enums.py:34-73 Status):
# pending -> parsing -> initializing -> running -> done | failed
STATUS_SCHEMA = "run_id string, seq int, state string, detail string, at double"
STATUS_ORDER = ("pending", "parsing", "initializing", "running", "done", "failed")


@dataclass
class JobStore:
    """Directory of engine-state tables for one job."""

    spark: SparkSession
    path: str
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    def _table(self, name: str) -> str:
        return os.path.join(self.path, name)

    def _read_or_empty(self, name: str, schema: str) -> DataFrame:
        p = self._table(name)
        try:
            return self.spark.read.schema(schema).parquet(p)
        except Exception:
            return self.spark.createDataFrame([], schema)

    # ---- checkpoint ---------------------------------------------------------

    def checkpoint(self) -> DataFrame:
        return self._read_or_empty("checkpoint", CHECKPOINT_SCHEMA)

    def filter_todo(self, tiles: DataFrame, key: str = "tile_key") -> DataFrame:
        """Continue mode: drop tiles already checkpointed (left anti join;
        replaces tiles_exist batch listing, SURVEY.md §2.2 S11)."""
        done = self.checkpoint().select(F.col("tile_key").alias(key)).distinct()
        return tiles.join(done, on=key, how="left_anti")

    def commit_tiles(self, produced: DataFrame, payload_col: Optional[str] = "data"):
        """Record finished tiles: checkpoint + per-partition lineage.

        ``produced`` must carry tile_key (+ zoom) and optionally a binary
        payload column to fingerprint. One pass computes both tables.
        """
        now = time.time()
        md5 = (
            F.md5(F.col(payload_col))
            if payload_col and payload_col in produced.columns
            else F.lit("")
        )
        snapshot = produced.select(
            "tile_key",
            (F.col("zoom") if "zoom" in produced.columns else F.lit(-1)).alias("zoom"),
            md5.alias("payload_md5"),
            F.spark_partition_id().alias("partition_id"),
        ).cache()
        try:
            snapshot.select(
                "tile_key",
                "payload_md5",
                F.lit(self.run_id).alias("run_id"),
                F.lit(now).alias("finished_at"),
            ).write.mode("append").parquet(self._table("checkpoint"))
            snapshot.groupBy("tile_key", "zoom", "partition_id").agg(
                F.count(F.lit(1)).alias("n_src_rows"),
                F.max("payload_md5").alias("payload_md5"),
            ).select(
                "tile_key",
                "zoom",
                "partition_id",
                "n_src_rows",
                "payload_md5",
                F.lit(self.run_id).alias("run_id"),
            ).write.mode("append").parquet(self._table("lineage"))
        finally:
            snapshot.unpersist()

    def lineage(self) -> DataFrame:
        return self._read_or_empty("lineage", LINEAGE_SCHEMA)

    # ---- metrics ------------------------------------------------------------

    def _append_rows_local(self, name: str, arrow_schema, rows) -> None:
        """Driver-side parquet append for TINY bookkeeping rows
        (status transitions, per-stage metrics). A Spark write job for
        a single metadata row costs ~1s of scheduler + commit-protocol
        overhead per call — with ~10 bookkeeping rows per job run that
        overhead dominated small jobs. Metadata belongs driver-side
        (the same shape as Iceberg/Delta writing manifests from the
        driver); the files are plain parquet parts the Spark readers
        (_read_or_empty) consume unchanged."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = self._table(name)
        os.makedirs(path, exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=arrow_schema),
            os.path.join(path, f"part-{uuid.uuid4().hex}.parquet"),
        )

    def record_metric(
        self, stage: str, n_rows: int, wall_ms: float, profile: dict = None
    ):
        """One metrics row per stage; ``profile`` carries the Spark
        TaskMetrics aggregate from StageMetricsProfiler (J6)."""
        import pyarrow as pa

        p = profile or {}
        self._append_rows_local(
            "metrics",
            pa.schema(
                [
                    ("run_id", pa.string()),
                    ("stage", pa.string()),
                    ("n_rows", pa.int64()),
                    ("wall_ms", pa.float64()),
                    ("at", pa.float64()),
                    ("task_run_ms", pa.float64()),
                    ("peak_mem_bytes", pa.int64()),
                    ("shuffle_read_bytes", pa.int64()),
                    ("shuffle_write_bytes", pa.int64()),
                    ("spilled_bytes", pa.int64()),
                ]
            ),
            [
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "n_rows": int(n_rows),
                    "wall_ms": float(wall_ms),
                    "at": time.time(),
                    "task_run_ms": (
                        float(p["task_run_ms"]) if "task_run_ms" in p else None
                    ),
                    "peak_mem_bytes": p.get("peak_mem_bytes"),
                    "shuffle_read_bytes": p.get("shuffle_read_bytes"),
                    "shuffle_write_bytes": p.get("shuffle_write_bytes"),
                    "spilled_bytes": p.get("spilled_bytes"),
                }
            ],
        )

    def metrics(self) -> DataFrame:
        return self._read_or_empty("metrics", METRICS_SCHEMA)

    # ---- J7 status lifecycle --------------------------------------------------

    def record_status(self, seq: int, state: str, detail: str = ""):
        """Persist one lifecycle transition (reference observer
        ObserverProtocol.update(status=...) + Status enum semantics)."""
        if state not in STATUS_ORDER:
            raise ValueError(f"unknown status {state!r}; have {STATUS_ORDER}")
        import pyarrow as pa

        self._append_rows_local(
            "status",
            pa.schema(
                [
                    ("run_id", pa.string()),
                    ("seq", pa.int32()),
                    ("state", pa.string()),
                    ("detail", pa.string()),
                    ("at", pa.float64()),
                ]
            ),
            [
                {
                    "run_id": self.run_id,
                    "seq": int(seq),
                    "state": state,
                    "detail": detail,
                    "at": time.time(),
                }
            ],
        )

    def status(self) -> DataFrame:
        return self._read_or_empty("status", STATUS_SCHEMA)

    # ---- changed-tile propagation (Z2 overview refresh) ----------------------

    def changed_since(self, run_id: str) -> DataFrame:
        """Tile keys checkpointed by runs AFTER run_id (by finished_at) —
        the seed set for overview refresh."""
        ck = self.checkpoint()
        anchor = (
            ck.where(F.col("run_id") == run_id)
            .agg(F.max("finished_at"))
            .collect()[0][0]
        )
        if anchor is None:
            return ck.select("tile_key").distinct()
        return (
            ck.where(F.col("finished_at") > anchor).select("tile_key").distinct()
        )


def run_stage(
    store: JobStore,
    stage: str,
    df_fn: Callable[[], DataFrame],
    out_path: Optional[str] = None,
    mode: str = "continue",
    payload_col: Optional[str] = "data",
) -> int:
    """Execute one job stage with checkpoint/metrics bookkeeping.

    mode:
      continue  - anti-join checkpoint first, process only missing tiles
      overwrite - process everything, append checkpoint anyway
      readonly  - compute nothing, return checkpointed tile count
    """
    t0 = time.time()
    if mode == "readonly":
        n = store.checkpoint().count()
        store.record_metric(stage, n, (time.time() - t0) * 1000)
        return n
    df = df_fn()
    if mode == "continue":
        df = store.filter_todo(df)
    df = df.cache()
    try:
        n = df.count()
        if out_path and n:
            df.write.mode("append").parquet(out_path)
        if n:
            store.commit_tiles(df, payload_col=payload_col)
    finally:
        df.unpersist()
    store.record_metric(stage, n, (time.time() - t0) * 1000)
    return n
