"""Group B operators — CDC apply semantics (SURVEY.md §2 group B).

The reference emits raw I/U/D change records whose entire purpose is
downstream state reconstruction (action = col 14, row_data = col 15 of
the audit record, SURVEY.md §1.2); these operators consume that
contract.  The ordering machinery the reference builds per batch
(commit-ts enrichment ``WorkerRunnable.java:133-150``, monotone
``event_id`` ``CoordinatorRunnable.java:87``) exists precisely so that
"latest change per key" is well-defined: order by (commit_ts, event_id).

Scale design (100 TB):
- ``latest_per_key`` uses ``max_by`` over a struct ordering key — ONE
  hash-aggregate shuffle with map-side partials, no global sort.  The
  window-function variant (``latest_per_key_window``) shuffles AND
  sorts every partition; it exists as a semantic cross-check and for
  when the full row (not a projected subset) must survive.
- ``demux`` is metadata-only aggregation; the physical demux at scale
  is ``df.write.partitionBy('table_name')`` (sinks/pipe_text.py), which
  routes rows without an extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def latest_per_key(changes: DataFrame) -> DataFrame:
    """B2 — snapshot materialization: last change per (table, key)
    ordered by (commit_ts, event_id).  Single-shuffle ``max_by``."""
    _LATEST_ORD = F.struct(F.col("commit_ts_ms"), F.col("event_id"))
    payload = F.struct(
        F.col("event_id"), F.col("action"), F.col("val_cents"), F.col("commit_ts_ms")
    )
    return (
        changes.groupBy("table_name", "key")
        .agg(F.max_by(payload, _LATEST_ORD).alias("last"))
        .select(
            "table_name",
            "key",
            F.col("last.event_id").alias("last_event_id"),
            F.col("last.action").alias("last_action"),
            F.col("last.val_cents").alias("last_val_cents"),
            F.col("last.commit_ts_ms").alias("last_commit_ts_ms"),
        )
    )


def latest_per_key_window(changes: DataFrame) -> DataFrame:
    """B2 (window variant) — same semantics via row_number; keeps every
    source column.  Costs a per-partition sort on top of the shuffle, so
    prefer ``latest_per_key`` on large inputs."""
    w = Window.partitionBy("table_name", "key").orderBy(
        F.col("commit_ts_ms").desc(), F.col("event_id").desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_deletes(changes: DataFrame) -> DataFrame:
    """B3 — reconstructed current state: latest per key, dropping keys
    whose final action is ``D`` (anti-semantics)."""
    return latest_per_key(changes).filter(F.col("last_action") != "D")


def demux_summary(changes: DataFrame) -> DataFrame:
    """B1 — per-source-table stream summary (the queryable face of
    demultiplexing; the physical split is a partitioned write)."""
    return changes.groupBy("table_name").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("key").alias("n_keys"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def orderby_commit_ts(changes: DataFrame) -> DataFrame:
    """B4 — event-time sequencing: global order by (commit_ts,
    event_id) surfaced as an explicit sequence number.

    Scale: a global ordered ranking is inherently a total order —
    Spark plans it as a range-partitioned sort; emit it only at the
    edge (exports), never mid-pipeline.
    """
    w = Window.orderBy("commit_ts_ms", "event_id")
    return changes.select("event_id", "commit_ts_ms", "table_name").withColumn(
        "seq_no", F.row_number().over(w).cast("long")
    )


def window_counts_per_table(changes: DataFrame) -> DataFrame:
    """B5 — changes per table per 1-minute window (the reference's
    per-minute counters ``WorkerRunnable.java:158-179`` refined
    per-table)."""
    return changes.groupBy(
        "table_name",
        (F.col("commit_ts_ms") - F.col("commit_ts_ms") % 60000).alias(
            "window_start_ms"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("key").alias("n_keys"),
    )
