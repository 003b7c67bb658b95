"""Pipeline-trust operators: constraint audits, schema-evolution
ingest, and content fingerprints.

Reference analog: the reference has no verification of its extract at
all — correctness was judged by eyeballing chunk files and run logs
(SURVEY.md §5.1), and its one structural invariant (event_id
monotonicity, ``CoordinatorRunnable.java:87``) is assumed, never
checked.  A CDC pipeline that feeds training data needs the checks to
be operators:

- **constraint audit** — declared expectations (not-null, domain range,
  key uniqueness, referential integrity) evaluated as ONE scan plus one
  broadcast anti-join, emitting a violation count per constraint.
- **schema-evolution read** — a long-lived extract changes shape over
  time; readers must union heterogeneous file generations
  (``mergeSchema``) with absent columns null-filled, not fail or drop.
- **content fingerprint** — an order-insensitive checksum per table
  group, comparable across engines and across sites (anti-entropy:
  source vs extract reconciliation without shipping rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: the fingerprint's modulus.  Per-row terms are
# 48-bit (12 hex chars of md5), summed exactly in decimal(38,0) before
# the final mod — no intermediate overflow at any row count below ~1e25.
FP_MOD = (1 << 61) - 1


def constraint_audit(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Violation count per declared constraint, cheapest-plan form:
    the three row-local constraints (not-null, range, uniqueness-by-
    count-distinct) share a single aggregate scan; referential
    integrity is one anti-join against the (broadcastable) key side.

    Scale: one pass over the fact + one broadcast anti-join — adding a
    constraint adds a column to the same aggregate, not a new scan.
    """
    scan = events.agg(
        F.count_if(F.col("user_id").isNull()).alias("null_user_id"),
        F.count_if(
            (F.col("value") < 0) | (F.col("value") > 10_000)
        ).alias("value_out_of_range"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
            "duplicate_event_id"
        ),
    )
    orphans = (
        events.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("user_id"))),
            "user_id",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("orphan_user_id").alias("constraint_name"),
                F.col("n").alias("n_violations"))
    )
    unpivoted = scan.selectExpr(
        "stack(3, 'null_user_id', null_user_id, "
        "'value_out_of_range', value_out_of_range, "
        "'duplicate_event_id', duplicate_event_id) "
        "AS (constraint_name, n_violations)"
    ).select("constraint_name", F.col("n_violations").cast("long"))
    return unpivoted.unionByName(
        orphans.select("constraint_name", F.col("n_violations").cast("long"))
    )


def read_evolved(spark, paths: list[str]) -> DataFrame:
    """Union heterogeneous parquet generations into the merged schema
    (absent columns null).  ``mergeSchema`` reconciles footers at
    planning time; each file still decodes only the columns it has."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def content_fingerprint(
    df: DataFrame, cols: list[str], group_col: str
) -> DataFrame:
    """Order-insensitive content checksum per group: md5 of the
    canonical pipe-joined row rendering, first 12 hex chars as a 48-bit
    integer, summed exactly (decimal(38,0)) and reduced mod 2^61-1.

    Engine-portable by construction — md5, string concat, and integer
    mod agree between Spark and DuckDB (verified by the oracle), so the
    extract site and the source site can each compute their side and
    compare one row per table.  Commutative + associative sum means
    partition order, shuffle order, and file layout never matter.

    Scale: a map-side partial sum per partition → one tiny final agg;
    bytes shuffled = one decimal per (partition, group).

    NULL canonicalization: every column is rendered through a sentinel
    (``coalesce(cast(c AS string), '\\u2400')``) BEFORE joining.  Bare
    ``concat_ws`` silently SKIPS null arguments, which is doubly wrong
    for a reconciliation checksum: (1, NULL, 2) and (1, 2, NULL) would
    collide, and a SQL site using null-propagating ``||`` would drop
    the whole term — two sites disagreeing on identical data.  The
    sentinel (␀, U+2400) makes the rendering injective for any value
    not containing it."""
    canonical = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("␀"))
            for c in cols
        ],
    )
    term = F.conv(F.substring(F.md5(canonical), 1, 12), 16, 10).cast(
        "decimal(38,0)"
    )
    return (
        df.groupBy(F.col(group_col))
        .agg(
            (F.sum(term) % F.lit(FP_MOD)).cast("long").alias("fingerprint"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def column_profile_drift(events: DataFrame) -> DataFrame:
    """Column-level profile drift between the two alternating-day
    populations (same even/odd epoch-day split as the distributional
    TV monitor): per column, row count, null rate (permille) and exact
    distinct count on each side — the schema-health companion to
    analytics.feature_drift_tv (THAT catches a shifted distribution;
    THIS catches a column going null-heavy or collapsing/exploding in
    cardinality — the failure modes expectation suites alarm on).

    All integers (value profiled in cents); one scan builds every
    column's profile via unpivot-style stacking, so adding a column
    adds no pass.  String columns stack as ``xxhash64`` longs —
    distinct counts are preserved (collision odds are negligible and
    the hash never appears in the output; the oracle counts the raw
    strings).  Scale: per-column exact distincts over the stacked
    stream, all sharing a single scan."""
    side = (F.expr("unix_millis(ts) DIV 86400000") % 2).alias("side")
    stacked = events.select(
        side,
        F.explode(
            F.array(
                F.struct(
                    F.lit("user_id").alias("col_name"),
                    F.col("user_id").cast("long").alias("v"),
                ),
                F.struct(
                    F.lit("event_type").alias("col_name"),
                    F.xxhash64("event_type").alias("v"),
                ),
                F.struct(
                    F.lit("value_cents").alias("col_name"),
                    F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
                ),
            )
        ).alias("c"),
    ).select("side", "c.col_name", "c.v")
    per = stacked.groupBy("col_name").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when((F.col("side") == 0) & F.col("v").isNull(), 1).otherwise(0)
        ).alias("nulls_a"),
        F.sum(
            F.when((F.col("side") == 1) & F.col("v").isNull(), 1).otherwise(0)
        ).alias("nulls_b"),
        F.countDistinct(F.when(F.col("side") == 0, F.col("v"))).alias(
            "distinct_a"
        ),
        F.countDistinct(F.when(F.col("side") == 1, F.col("v"))).alias(
            "distinct_b"
        ),
    )
    return per.select(
        "col_name",
        "n_a",
        "n_b",
        F.expr("nulls_a * 1000 DIV n_a").alias("null_pm_a"),
        F.expr("nulls_b * 1000 DIV n_b").alias("null_pm_b"),
        "distinct_a",
        "distinct_b",
    )
