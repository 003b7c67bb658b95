"""Edge-case unit tests for operators/relational.py (the oracle suite
covers the fixture-scale behavior; these pin the semantics on hand-built
frames)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdc_extractor_spark.operators import relational


def _ts(ms: int):
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        milliseconds=ms
    )


@pytest.fixture(scope="module")
def tiny(spark):
    events = spark.createDataFrame(
        [
            (1, 10, _ts(5_000), "click", 1.0, "{}"),
            (2, 10, _ts(10_000), "view", 1.0, "{}"),
            (3, 20, _ts(1_000), "click", 1.0, "{}"),  # before any order
        ],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    orders = spark.createDataFrame(
        [
            (100, 10, "O", 11.0, _ts(5_000), "1-URGENT"),   # ties event 1 ts
            (101, 10, "O", 22.0, _ts(5_000), "1-URGENT"),   # same instant, higher key
            (102, 10, "O", 33.0, _ts(7_000), "1-URGENT"),
            (103, 20, "O", 44.0, _ts(2_000), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    return events, orders


def test_asof_tie_break_and_missing(tiny):
    events, orders = tiny
    got = {
        r["event_id"]: r
        for r in relational.asof_join_latest_order(events, orders).collect()
    }
    # order ON the event instant is visible; ties resolve to max orderkey
    assert got[1]["last_orderkey"] == 101
    assert got[1]["last_total_cents"] == 2200
    # later order at 7s wins for the 10s event
    assert got[2]["last_orderkey"] == 102
    # no order at-or-before 1s → nulls survive the left as-of
    assert got[3]["last_orderkey"] is None


def test_range_join_window_boundaries(spark):
    events = spark.createDataFrame(
        [
            (1, 7, _ts(0), "click", 1.0, "{}"),
            (2, 7, _ts(3_600_000), "click", 1.0, "{}"),   # exactly 1h later
            (3, 7, _ts(3_600_001), "click", 1.0, "{}"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, "
        "value double, props string",
    )
    got = {
        r["event_id"]: r["n_prior_events"]
        for r in relational.range_join_prior_events(events, 1).collect()
    }
    # event 2: event 1 is exactly at the window's closed lower bound
    assert got[2] == 1
    # event 3: window (0.000001h ago .. now) still contains event 2 only
    assert got[3] == 1
    assert 1 not in got  # no strictly-earlier events


def test_rollup_levels(spark, sf_dir):
    from cdc_extractor_spark.io import load_table

    t = {n: load_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "customer", "nation", "region")}
    df = relational.rollup_revenue(
        t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    )
    levels = {r["grouping_level"] for r in df.select("grouping_level").distinct().collect()}
    assert levels == {0, 1, 3}
    grand = df.filter(F.col("grouping_level") == 3).collect()
    assert len(grand) == 1
    detail_sum = (
        df.filter(F.col("grouping_level") == 0)
        .agg(F.sum("revenue_cents"))
        .first()[0]
    )
    assert grand[0]["revenue_cents"] == detail_sum
