"""Property tests for the round-3 behavioral/maintenance operators:
conversion funnel, cohort retention, incremental JOIN-view maintenance,
and token-weighted systematic sampling.  Cross-engine value equality is
covered by tests/test_oracle_parity.py; these pin the semantic
invariants the oracle comparison alone would not explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_extractor_spark.io import load_table
from cdc_extractor_spark.operators import analytics, maintenance
from cdc_extractor_spark.functions import text


def test_funnel_steps_are_ordered_and_grounded(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = analytics.funnel_steps(ev).collect()
    assert out, "funnel produced no rows"
    viewers = {
        r[0]
        for r in ev.filter(F.col("event_type") == "view")
        .select("user_id").distinct().collect()
    }
    assert {r["user_id"] for r in out} == viewers
    for r in out:
        # step times are monotone when present, and later steps imply
        # earlier ones
        if r["step2_ms"] is not None:
            assert r["step2_ms"] >= r["step1_ms"]
        if r["step3_ms"] is not None:
            assert r["step2_ms"] is not None
            assert r["step3_ms"] >= r["step2_ms"]
        want = 1 + (r["step2_ms"] is not None) + (r["step3_ms"] is not None)
        assert r["steps_completed"] == want


def test_cohort_retention_offset_zero_is_cohort_size(spark, sf_dir):
    out = analytics.cohort_retention(load_table(spark, sf_dir, "events"))
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["week_offset"] >= 0
        assert 0 < r["n_active"] <= r["n_cohort"]
        if r["week_offset"] == 0:
            assert r["n_active"] == r["n_cohort"]


def test_incremental_join_view_equals_full_recompute(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    inc = {
        r["o_orderpriority"]: (r["n_items"], r["revenue_cents"])
        for r in maintenance.incremental_join_view(o, l, order_split=750).collect()
    }
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    full = {
        r["o_orderpriority"]: (r["n"], r["rev"])
        for r in l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("rev"))
        .collect()
    }
    assert inc == full


def test_incremental_join_view_empty_delta_is_base(spark, sf_dir):
    # a split beyond every orderkey makes all three delta terms empty;
    # the merge must still equal the full recompute (no phantom rows)
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    hi = o.agg(F.max("o_orderkey")).first()[0]
    a = maintenance.incremental_join_view(o, l, order_split=int(hi)).collect()
    b = maintenance.incremental_join_view(o, l, order_split=750).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_weighted_sample_pick_budget_and_weighting(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    k = 50
    out = text.weighted_systematic_sample(docs, k=k).collect()
    # systematic sampling spends exactly k picks (total is a multiple
    # boundary case: the last multiple k*total/total lands past the
    # final interval only when total divides exactly — allow k or k-1)
    assert sum(r["n_picks"] for r in out) in (k, k - 1)
    # every picked doc has positive weight, and no doc is picked more
    # times than its token interval can cover
    total = docs.select(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        )
    ).first()[0]
    stride = total / k
    for r in out:
        assert r["n_tokens"] > 0
        assert r["n_picks"] <= r["n_tokens"] / stride + 1


def test_weighted_sample_empty_input(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").where(F.lit(False))
    assert text.weighted_systematic_sample(docs).count() == 0
