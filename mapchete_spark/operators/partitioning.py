"""Input-parallelism guard for Python-kernel operators.

A single-file parquet scan (one row group) is ONE Spark partition, so
every mapInPandas kernel chained on it runs on a single task no matter
how many cores the session has — the guide's 'input skew' case (§2.5):
correctness-scale corpora measured 4-6x slower than the same operator
over a spread input. ``spread_small_input`` hash-repartitions such
inputs up to the session parallelism; anything already at or above it
(any real corpus) passes through untouched, so no shuffle is added at
scale. Hash-partitioning by the row id also hands downstream
groupBy(id) consumers their required distribution, saving the exchange
that would otherwise move the EXPLODED rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread_small_input(df: DataFrame, key_col: str) -> DataFrame:
    if df.isStreaming:  # micro-batch sizing is the stream's own knob
        return df
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, F.col(key_col))
    return df
