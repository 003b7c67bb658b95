"""Fixture table loaders.

Reference analog: ``Client.java:51-65`` (JDBC connection factory) +
``WorkerRunnable.java:93-94`` (``select * from audit.logged_actions``).
Our batch source is Parquet (columnar, pushdown-friendly); the driver
fixtures at ``/root/testdata/sf*`` stand in for the monitored ``bmsql_*``
base tables and the audit change log (``events``).

Scale note: ``spark.read.parquet`` plans one task per file split
(``spark.sql.files.maxPartitionBytes``), so the same call that reads a
6 MB fixture reads a 100 TB table across 1000 executors.  Filters and
column prunes written against these frames reach the scan (verified in
tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.  Schemas are embedded in the Parquet
    footer (see FIXTURES.md); no inference happens.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark
    reads as a long (``spark.sql.legacy.parquet.nanosAsLong``, set in
    session.py); it is normalized here to µs-precision TimestampType —
    the same truncation DuckDB applies — so every downstream operator
    sees a plain timestamp column.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        # integer division, NOT `/` (double division loses ±1µs at 1e18 ns
        # magnitudes, which flips ms boundaries vs DuckDB's truncation)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view (mirrors the DuckDB oracle
    environment, where the same names are pre-registered)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
