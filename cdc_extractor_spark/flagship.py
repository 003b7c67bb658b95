"""Flagship query — one micro-batch epoch of the reference pipeline,
end-to-end (SURVEY.md §3.3 "worker extraction" as a declarative plan).

Reference dataflow per task (WorkerRunnable.java:85-200):
  range-scan (lo, hi]  →  monitored-table filter  →  stringify+sink
  →  distinct xids  →  commit-ts lookup  →  per-minute metrics roll.

Here: offset-range + isin filters (pushed to the scan), broadcast
enrichment join against ``customer`` (the commit-ts relation stand-in),
then a per-minute, per-event-type metrics aggregate — counts, value
sums (integer cents), distinct actors, and the freshness watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import TABLE_GROUPS
from .io import load_table


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")

    max_offset = events.agg(F.max("event_id")).collect()[0][0] or 0

    batch = events.filter(
        (F.col("event_id") > 0) & (F.col("event_id") <= F.lit(int(max_offset)))
    ).filter(F.col("event_type").isin(list(TABLE_GROUPS["all"])))

    lookup = customer.select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
    )
    enriched = batch.join(F.broadcast(lookup), "user_id", "left")

    return (
        enriched.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 minute").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
            F.countDistinct("user_id").alias("n_actors"),
            F.max("event_id").alias("max_event_id"),
            F.unix_millis(F.max(F.col("ts").cast("timestamp"))).alias("uptodate_ms"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n_rows",
            "value_cents",
            "n_actors",
            "max_event_id",
            "uptodate_ms",
        )
    )
