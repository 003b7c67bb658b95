"""Physical-plan assertions (SURVEY.md §7 step 5: scale hardening is
enforced by plan review, not fixture size).  Each test pins a property
that keeps the operator viable at 100 TB: filters reaching the parquet
scan, column pruning, broadcast joins for dims, no cartesian products,
whole-stage codegen on the hot paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_extractor_spark.io import load_table
from cdc_extractor_spark.operators import changelog, relational, star


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    return {
        n: load_table(spark, sf_dir, n)
        for n in ("events", "lineitem", "orders", "customer", "nation", "region")
    }


def test_offset_range_filter_pushed_to_scan(t):
    df = changelog.filter_offset_range(t["events"], 100, 5000)
    plan = formatted(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(event_id,100)" in plan
    assert "LessThanOrEqual(event_id,5000)" in plan


def test_isin_filter_pushed_to_scan(t):
    df = changelog.filter_isin(t["events"], ("click", "view"))
    plan = formatted(df)
    assert "In(event_type" in plan


def test_column_pruning_reaches_scan(t):
    # a 2-column projection must not read all 6 event columns
    df = t["events"].select("event_id", "user_id")
    plan = formatted(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "event_id" in read_schema and "user_id" in read_schema
    assert "props" not in read_schema and "value" not in read_schema


def test_star_join_broadcasts_dims(t):
    df = star.revenue_by_region(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the ship-date filter reaches the lineitem scan, and the scan reads
    # only the 4 needed columns of 11
    fplan = formatted(df)
    li_scan = [ln for ln in fplan.splitlines()
               if "ReadSchema" in ln and "l_orderkey" in ln][0]
    assert "l_shipdate" in li_scan and "l_comment" not in li_scan
    assert "LessThan(l_shipdate" in fplan


def test_lookup_join_is_broadcast(t):
    df = changelog.join_lookup_commit_ts(t["events"], t["customer"])
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_range_join_no_cartesian(t):
    df = relational.range_join_prior_events(t["events"], 1)
    plan = plan_of(df)
    # equi key (uid) carries the join; the range predicate is a residual
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_shuffle_no_join_node(t):
    df = relational.asof_join_latest_order(t["events"], t["orders"])
    plan = plan_of(df)
    # the as-of is a union + window pass — no join operator at all
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_whole_stage_codegen_on_agg_path(t):
    df = changelog.window_tumbling_1min(t["events"])
    df.collect()  # AQE finalizes the physical plan only on execution
    plan = plan_of(df)
    # '*(n)' prefixes mark whole-stage-codegen spans; both the scan-side
    # partial agg and the final agg must be inside one
    assert "*(1)" in plan and "*(2)" in plan


def test_bucketed_join_avoids_shuffle(spark, t, tmp_path):
    """Co-located joins via bucketing (SCALE.md): two tables bucketed on
    the join key join without any Exchange — the physical layout carries
    the partitioning a shuffle would otherwise establish."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t["orders"].select("o_orderkey", "o_custkey").write.bucketBy(
            8, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
        t["lineitem"].select("l_orderkey", "l_quantity").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        joined.collect()
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_pricing_summary_single_shuffle(t):
    df = relational.pricing_summary(t["lineitem"])
    plan = plan_of(df)
    # partial agg before the exchange: exactly one shuffle, map-side combine
    assert plan.count("Exchange") == 1
    assert "partial" in plan.lower()
