"""C5 — star-schema analytics: the "query side" the reference's extract
exists to feed (SURVEY.md §2 group C5).

Join/broadcast strategy (the part that matters at 100 TB):
- ``lineitem ⋈ orders`` is fact-to-fact: Catalyst plans a shuffle join
  on the key; with AQE on, skewed order keys are split at runtime.
- ``customer``, ``nation``, ``region`` are dimensions: broadcast
  explicitly so the fact table never shuffles for them.
- The date filter sits directly on the scan (PushedFilters) and the
  projection prunes lineitem to 4 of 11 columns (ReadSchema) —
  verified in tests/test_plans.py.
- Revenue is summed in integer cents (per-row rounding), so partial
  aggregation order can't perturb the hash-compared result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_by_region(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    ship_before: str = "1999-01-01",
) -> DataFrame:
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.filter(F.col("l_shipdate") < F.lit(ship_before)).select(
        "l_orderkey", rev_cents.alias("rev_cents")
    )
    facts = li.join(orders.select("o_orderkey", "o_custkey"),
                    li.l_orderkey == F.col("o_orderkey"))
    enriched = (
        facts.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return enriched.groupBy("r_name").agg(
        F.sum("rev_cents").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


def part_brand_stats(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Fact ⋈ part dimension: per-brand shipped quantity and revenue.
    ``part`` is a broadcast dim; lineitem prunes to 3 columns."""
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty"),
        rev_cents.alias("rev_cents"),
    )
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum("qty").alias("sum_qty"),
            F.sum("rev_cents").alias("revenue_cents"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


def supplier_nation_volume(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Supply-side rollup: revenue by the supplier's nation (exercises
    the supplier dimension; same broadcast pattern)."""
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.select("l_suppkey", rev_cents.alias("rev_cents"))
    return (
        li.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


def cube_returns(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping sets in one
    expand + single shuffle (§2 checklist: grouping sets, beyond the
    ROLLUP in relational.py)."""
    qty = F.col("l_quantity").cast("long")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("long").alias("grouping_level"),
        )
    )


def revenue_by_nation_year(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Finer-grained rollup: nation × order-year (exercises a join plus
    a two-key aggregate; same broadcast strategy)."""
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    li = lineitem.select("l_orderkey", rev_cents.alias("rev_cents"))
    facts = li.join(
        orders.select(
            "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
        ),
        li.l_orderkey == F.col("o_orderkey"),
    )
    enriched = facts.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return enriched.groupBy("n_name", "o_year").agg(
        F.sum("rev_cents").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )
