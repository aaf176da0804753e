"""Loaders for the driver-generated testdata and the engine's derived
document-with-geo table.

The documents parquet is the raw corpus; ``load_docs`` attaches the
deterministic geo columns and interleaved spans (the engine's canonical
input per BASELINE.json input_hint). Loading goes through
``spark.read.parquet`` so Catalyst handles pushdown/pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mapchete_spark.functions.geo import with_geo
from mapchete_spark.functions.spans import with_spans

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name}; have {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def synthetic_docs(spark: SparkSession, n: int) -> DataFrame:
    """Codegen-generated doc corpus of arbitrary size (spark.range +
    the deterministic geo derivation) — no storage, scales to any n;
    used by the bench to measure throughput beyond the tiny sf tables
    and by scale tests (the 10^12 stand-in)."""
    from pyspark.sql import functions as F

    return with_geo(spark.range(n).select(F.col("id").alias("doc_id")))


def load_docs(
    spark: SparkSession,
    sf_dir: str,
    with_spans_col: bool = False,
    geo: bool = True,
) -> DataFrame:
    """documents + derived lon/lat/radius (+ optional interleaved spans)."""
    df = load_table(spark, sf_dir, "documents")
    if geo:
        df = with_geo(df)
    if with_spans_col:
        df = with_spans(df)
    return df


def iceberg_session_conf(catalog: str = "mapchete", warehouse: str = None) -> dict:
    """Session conf enabling a real Iceberg catalog when the
    iceberg-spark-runtime jar is on the classpath (it is NOT in this
    sandbox — the engine reads/writes Iceberg-STYLE parquet table paths
    here, which is schema- and layout-compatible). On a production
    cluster, pass this dict to ``session.get_spark(extra_conf=...)``
    and the same DataFrames go through ``spark.table()`` /
    ``df.writeTo(...)`` against the catalog, gaining Iceberg's snapshot
    isolation + manifests on top of the identical physical layout
    (partition-by-zoom, z-order-sorted row groups — compact.py is the
    rewrite-data-files analog)."""
    conf = {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    if warehouse:
        conf[f"spark.sql.catalog.{catalog}.warehouse"] = warehouse
    return conf
