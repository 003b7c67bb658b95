"""General analytics operators over the event stream — the remaining
§2-checklist surfaces (ordered-window sessionization, pivot,
bucketed histograms, a vectorized UDAF) that a complete engine offers
on top of the CDC feed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the user's previous event exceeds ``gap_minutes``.

    Plan shape: one shuffle on user, one per-user ordered window pass
    (lag → boundary flag → running sum).  The streaming twin is
    ``F.session_window``; this batch form exists for the oracle and for
    retrospective backfills.
    """
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    gap_ms = gap_minutes * 60_000
    flagged = events.select(
        "event_id", "user_id", ms.alias("at_ms")
    ).withColumn(
        "new_session",
        F.when(
            (F.col("at_ms") - F.lag("at_ms").over(w)) > gap_ms, F.lit(1)
        ).otherwise(F.lit(0)).cast("long"),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("at_ms").alias("start_ms"),
            F.max("at_ms").alias("end_ms"),
        )
        .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms"))
    )


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Pivot: one row per user, one count column per event type.  The
    pivot values are declared (not discovered) so the plan is a single
    aggregation — no extra distinct pass, stable schema at any scale."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


def value_histogram(events: DataFrame, bucket_width: int = 10) -> DataFrame:
    """Fixed-width histogram of the value column per event type — the
    bucketing primitive behind quality-score distributions.  One hash
    aggregate; bucket id is pure arithmetic (floor), so any engine
    agrees."""
    bucket = F.floor(F.col("value") / bucket_width).cast("long")
    return (
        events.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * bucket_width).cast("double").alias("bucket_lo"),
            "n",
        )
    )


@F.pandas_udf(T.LongType())
def _weighted_mean_cents(v_cents: pd.Series, w: pd.Series) -> int:
    """Vectorized grouped-agg UDAF kernel: floor(Σvw / Σw) per group in
    exact int64 — Arrow batch in, scalar out.  Integer arithmetic makes
    the result independent of row order, so the oracle hash-matches
    regardless of shuffle placement."""
    denom = int(w.sum())
    return int(v_cents.mul(w).sum()) // denom if denom else 0


@F.pandas_udf(T.LongType())
def _n_rows(v: pd.Series) -> int:
    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(); the count rides the same Arrow pass
    return len(v)


def udaf_weighted_value(events: DataFrame) -> DataFrame:
    """Weighted mean value (integer cents) per event type, weight =
    1 + user_id % 5 (deterministic from the fixture).  Demonstrates the
    pandas GROUPED_AGG UDAF path: each group's Arrow batches reduce in
    the Python worker, the engine handles the group shuffle."""
    return (
        events.withColumn("w", (F.col("user_id") % 5 + 1))
        .withColumn("v_cents", F.round(F.col("value") * 100).cast("long"))
        .groupBy("event_type")
        .agg(
            _weighted_mean_cents(F.col("v_cents"), F.col("w")).alias(
                "weighted_value_cents"
            ),
            _n_rows(F.col("v_cents")).alias("n_events"),
        )
    )

def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Data-profiling pass: per column — row/non-null/distinct counts
    and lexicographic min/max of the string form.  The standard
    pre-ingestion quality gate of a training-data pipeline (schema
    drift, null explosions, cardinality collapse all surface here).

    Scale: ONE aggregation pass over the table computes every column's
    stats (no per-column rescans); the wide single-row result is then
    unpivoted driver-free with ``stack``.  countDistinct over several
    columns expands to one Expand + aggregate — still a single shuffle.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nonnull, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return row.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nonnull, n_distinct, min_str, max_str)",
    ).select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_nonnull",
        (F.col("__n") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )
