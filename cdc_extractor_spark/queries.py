"""Query registry: every implemented operator from SURVEY.md §2 as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string over the same parquet views.

Contract (driver verify, __spark_entry__.py): per query the driver
compares row-count + schema + order-insensitive value-hash between the
Spark result and the DuckDB oracle at sf0.01.  Column names are matched
after sorting by name, so every computed column is aliased identically
on both sides.  tests/test_oracle_parity.py runs the same comparison
locally at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .config import TABLE_GROUPS
from .io import load_table
from .operators import cdc, changelog
from .sources.changes import CHANGES_CTE, changes_df

QueryFn = Callable[[SparkSession, str], DataFrame]

# Bound parameters (same values baked into the oracle SQL strings).
ISIN_TABLES = TABLE_GROUPS["first"]  # ('click', 'view')
OFFSET_LO, OFFSET_HI = 100, 5000
TASK_SIZE = 100

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Group A — reference dataflow (operators/changelog.py)
# --------------------------------------------------------------------------

@_q(
    "scan_changelog",
    "SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props "
    "FROM events",
)
def q_scan_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.scan_changelog(load_table(spark, sf_dir, "events"))


@_q(
    "filter_isin",
    "SELECT event_id, event_type, user_id, value FROM events "
    "WHERE event_type IN ('click', 'view')",
)
def q_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.filter_isin(load_table(spark, sf_dir, "events"), ISIN_TABLES)


@_q(
    "filter_offset_range",
    f"SELECT event_id, user_id, event_type, value FROM events "
    f"WHERE event_id > {OFFSET_LO} AND event_id <= {OFFSET_HI}",
)
def q_filter_offset_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.filter_offset_range(
        load_table(spark, sf_dir, "events"), OFFSET_LO, OFFSET_HI
    )


@_q(
    "agg_max_offset",
    "SELECT max(event_id) AS max_event_id, count(*) AS n_events FROM events",
)
def q_agg_max_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.agg_max_offset(load_table(spark, sf_dir, "events"))


@_q(
    "project_cast_string",
    "SELECT CAST(event_id AS VARCHAR) AS event_id, "
    "strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_str, "
    "CAST(user_id AS VARCHAR) AS user_id, event_type, "
    "printf('%.2f', value) AS value_str, props FROM events",
)
def q_project_cast_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.project_cast_string(load_table(spark, sf_dir, "events"))


@_q("distinct_keys", "SELECT DISTINCT user_id FROM events")
def q_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.distinct_keys(load_table(spark, sf_dir, "events"))


@_q(
    "join_lookup_commit_ts",
    "SELECT e.user_id AS user_id, c.c_name AS c_name, c.c_nationkey AS c_nationkey "
    "FROM (SELECT DISTINCT user_id FROM events) e "
    "LEFT JOIN customer c ON e.user_id = c.c_custkey",
)
def q_join_lookup_commit_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.join_lookup_commit_ts(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "customer")
    )


@_q(
    "group_collect_xids",
    "SELECT epoch_ms(date_trunc('minute', ts)) AS commit_minute_ms, "
    "list_sort(list(DISTINCT user_id)) AS xids, "
    "count(DISTINCT user_id) AS n_xids "
    "FROM events GROUP BY 1",
)
def q_group_collect_xids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.group_collect_xids(load_table(spark, sf_dir, "events"))


@_q(
    "watermark_max_commit_ts",
    "SELECT epoch_ms(max(ts)) AS uptodate_ms, epoch_ms(min(ts)) AS oldest_ms, "
    "count(*) AS n_events FROM events",
)
def q_watermark_max_commit_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.watermark_max_commit_ts(load_table(spark, sf_dir, "events"))


@_q(
    "window_tumbling_1min",
    "SELECT window_start_ms, n_rows, value_cents, "
    "CAST(floor(value_cents / n_rows) AS BIGINT) AS avg_value_cents FROM ("
    "  SELECT epoch_ms(date_trunc('minute', ts)) AS window_start_ms, "
    "         count(*) AS n_rows, "
    # CAST around sum: DuckDB sum(BIGINT) yields HUGEINT, which breaks
    # schema/type parity with Spark's long
    "         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents "
    "  FROM events GROUP BY 1) t",
)
def q_window_tumbling_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.window_tumbling_1min(load_table(spark, sf_dir, "events"))


@_q(
    "staleness_lag",
    "SELECT event_id, staleness_ms, "
    "CAST(floor(avg(staleness_ms) OVER "
    "  (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) "
    "AS running_avg_ms FROM ("
    "  SELECT event_id, "
    "  epoch_ms(TIMESTAMP '2024-02-01 00:00:00') - epoch_ms(ts) AS staleness_ms "
    "  FROM events) t",
)
def q_staleness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.staleness_lag(load_table(spark, sf_dir, "events"))


@_q(
    "task_latency_stats",
    f"SELECT CAST(floor(event_id / {TASK_SIZE}) AS BIGINT) AS task_id, "
    "count(*) AS n_rows, min(event_id) AS min_event_id, "
    "max(event_id) AS max_event_id, "
    "epoch_ms(max(ts)) - epoch_ms(min(ts)) AS ts_span_ms "
    "FROM events GROUP BY 1",
)
def q_task_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog.task_latency_stats(
        load_table(spark, sf_dir, "events"), TASK_SIZE
    )


# --------------------------------------------------------------------------
# Group B — CDC apply semantics (operators/cdc.py over the derived
# `changes` fixture; the oracle rebuilds the identical stream via
# CHANGES_CTE so the whole pipeline is verified end-to-end)
# --------------------------------------------------------------------------

_LATEST_SQL = (
    "SELECT table_name, key, event_id AS last_event_id, action AS last_action, "
    "val_cents AS last_val_cents, commit_ts_ms AS last_commit_ts_ms FROM changes "
    "QUALIFY row_number() OVER (PARTITION BY table_name, key "
    "ORDER BY commit_ts_ms DESC, event_id DESC) = 1"
)


@_q("cdc_latest_per_key", CHANGES_CTE + _LATEST_SQL)
def q_cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.latest_per_key(changes_df(spark, sf_dir))


@_q(
    "cdc_apply_deletes",
    CHANGES_CTE + f"SELECT * FROM ({_LATEST_SQL}) t WHERE last_action <> 'D'",
)
def q_cdc_apply_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.apply_deletes(changes_df(spark, sf_dir))


@_q(
    "cdc_demux",
    CHANGES_CTE
    + "SELECT table_name, count(*) AS n_changes, count(DISTINCT key) AS n_keys, "
    "min(event_id) AS min_event_id, max(event_id) AS max_event_id "
    "FROM changes GROUP BY table_name",
)
def q_cdc_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.demux_summary(changes_df(spark, sf_dir))


@_q(
    "orderby_commit_ts",
    CHANGES_CTE
    + "SELECT event_id, commit_ts_ms, table_name, "
    "row_number() OVER (ORDER BY commit_ts_ms, event_id) AS seq_no FROM changes",
)
def q_orderby_commit_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.orderby_commit_ts(changes_df(spark, sf_dir))


@_q(
    "window_counts_per_table",
    CHANGES_CTE
    + "SELECT table_name, commit_ts_ms - commit_ts_ms % 60000 AS window_start_ms, "
    "count(*) AS n_changes, count(DISTINCT key) AS n_keys "
    "FROM changes GROUP BY 1, 2",
)
def q_window_counts_per_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cdc.window_counts_per_table(changes_df(spark, sf_dir))
