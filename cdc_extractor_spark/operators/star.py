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
