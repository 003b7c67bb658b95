"""Decision-support query shapes completing the TPC-H operator family
over the driver fixtures (SURVEY.md §2 group C5 "query side").

The reference delegates all querying to PostgreSQL (SURVEY.md §3 — no
query surface of its own), so capability parity for the *query* half of
the pipeline is defined by the standard decision-support shapes a CDC
consumer runs on the reconstructed tables.  This module covers the
TPC-H shapes not already in operators/relational.py / star.py:
correlated scalar subqueries (Q2/Q11/Q15), left-outer count
distributions (Q13), disjunctive predicate pushdown (Q19), multi-way
EXISTS/NOT-EXISTS (Q21), and integer-exact above-average filters (Q22).

Scale posture (SCALE.md): dimension tables are always broadcast; scalar
aggregates (grand totals, maxima) are computed as 1-row DataFrames and
re-joined with ``crossJoin(broadcast(...))`` — never with an
empty-partition Window, which would funnel the fact table through a
single task at 100 TB.

Money determinism: every revenue aggregate is summed in integer cents
(``round(x*100) :: long``) so DuckDB-vs-Spark float summation order can
never flip the hash (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _rev_cents(price="l_extendedprice", disc="l_discount"):
    return F.round(F.col(price) * (1 - F.col(disc)) * 100).cast("long")


def min_acctbal_supplier_per_part(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
    size_lo: int = 10, size_hi: int = 20, p_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q2 shape (no partsupp fixture: supply relationships are the
    distinct (l_partkey, l_suppkey) pairs observed in lineitem): for
    each qualifying part, the supplier(s) with the minimum account
    balance among its suppliers.

    The correlated ``= (SELECT min(..) ..)`` subquery decorrelates to a
    per-part window minimum — one shuffle on l_partkey instead of a
    re-executed subquery per row.
    """
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    parts = part.where(
        (F.col("p_size") >= size_lo) & (F.col("p_size") <= size_hi)
        & (F.col("p_type") == p_type)
    ).select("p_partkey", "p_name")
    joined = (
        pairs.join(broadcast(parts), pairs.l_partkey == parts.p_partkey)
        .join(broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal")),
              pairs.l_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
    )


def nation_market_share(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
    nation: DataFrame, region: DataFrame,
    target_nation: str = "NATION_2", region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the share of a region's supplier
    revenue contributed by one nation.  Share is a ratio of two exact
    integer-cents sums, so the double division is bit-identical across
    engines."""
    dims = (
        supplier.join(broadcast(nation),
                      supplier.s_nationkey == nation.n_nationkey)
        .join(broadcast(region),
              (nation.n_regionkey == region.r_regionkey)
              & (region.r_name == region_name))
        .select("s_suppkey", "n_name")
    )
    rev = (
        lineitem.join(broadcast(dims), lineitem.l_suppkey == dims.s_suppkey)
        .join(orders.select("o_orderkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_cents().alias("cents"),
            F.col("n_name"),
        )
    )
    return (
        rev.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("n_name") == target_nation, F.col("cents"))
                  .otherwise(F.lit(0))).alias("nation_cents"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            "o_year", "nation_cents", "total_cents",
            F.round(F.col("nation_cents") / F.col("total_cents"), 6)
            .alias("mkt_share"),
        )
    )


def product_type_profit(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
    nation: DataFrame, part: DataFrame, p_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q9 shape (no ps_supplycost fixture: unit cost proxied as
    10% of p_retailprice): profit by supplier nation and order year for
    one product type.  Both profit terms are rounded to integer cents
    before the sum."""
    parts = part.where(F.col("p_type") == p_type).select(
        "p_partkey", "p_retailprice")
    sup = supplier.join(broadcast(nation),
                        supplier.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", "n_name")
    return (
        lineitem.join(broadcast(parts),
                      lineitem.l_partkey == parts.p_partkey)
        .join(broadcast(sup), lineitem.l_suppkey == sup.s_suppkey)
        .join(orders.select("o_orderkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .select(
            F.col("n_name"),
            F.year("o_orderdate").alias("o_year"),
            (_rev_cents()
             - F.round(F.col("l_quantity") * F.col("p_retailprice") * 10)
             .cast("long")).alias("amount_cents"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount_cents").alias("profit_cents"))
    )


def important_parts(
    lineitem: DataFrame, part: DataFrame, fraction: float = 0.002
) -> DataFrame:
    """TPC-H Q11 shape (inventory value proxied by shipped
    quantity × retail price): parts whose value exceeds ``fraction`` of
    the grand total.  The grand total is a 1-row aggregate re-joined by
    broadcast cross join — the scalar subquery decorrelated without an
    all-to-one Window."""
    val = (
        lineitem.join(
            broadcast(part.select("p_partkey", "p_retailprice")),
            lineitem.l_partkey == part.p_partkey)
        .select(
            "p_partkey",
            F.round(F.col("l_quantity") * F.col("p_retailprice") * 100)
            .cast("long").alias("cents"),
        )
        .groupBy("p_partkey")
        .agg(F.sum("cents").alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("grand_cents"))
    return (
        val.crossJoin(broadcast(total))
        .where(F.col("value_cents") > fraction * F.col("grand_cents"))
        .select("p_partkey", "value_cents")
    )


def shipping_priority_by_linestatus(
    lineitem: DataFrame, orders: DataFrame,
    year_start: str = "1997-01-01", year_end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus stands in for the absent
    l_shipmode): per line status, how many shipped lineitems belonged
    to high- vs low-priority orders — conditional aggregation after a
    fact-fact join."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp")))
        .join(orders.select("o_orderkey", "o_orderpriority"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including zero-order customers via the left outer join (count of a
    nullable key, not count(*))."""
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_custkey", "o_orderkey"),
              customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist"))


def top_supplier(
    lineitem: DataFrame, supplier: DataFrame,
    q_start: str = "1997-01-01", q_end: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue in a
    quarter.  The ``= (SELECT max(..))`` scalar subquery is a 1-row
    broadcast cross join against the per-supplier aggregate."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(q_start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(q_end).cast("timestamp"))
            # explicit so BOTH consumers (per-supplier agg and scalar
            # max) canonicalize to the same exchange: the equi-join
            # injects this null filter on its branch anyway, and
            # matching it here lets AQE reuse the shuffle stage
            # instead of running the scan+partial-agg twice
            & F.col("l_suppkey").isNotNull())
        .select("l_suppkey", _rev_cents().alias("cents"))
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("total_revenue_cents"))
    )
    top = rev.agg(F.max("total_revenue_cents").alias("max_cents"))
    return (
        rev.crossJoin(broadcast(top))
        .where(F.col("total_revenue_cents") == F.col("max_cents"))
        .join(broadcast(supplier.select("s_suppkey", "s_name")),
              rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue matched by an OR of three conjunctive
    brand/size/quantity clauses — exercises disjunct normalization and
    partial pushdown (the common ``p_partkey = l_partkey`` stays a join
    key; per-clause predicates evaluate post-join)."""
    j = lineitem.join(broadcast(part.select("p_partkey", "p_brand", "p_size")),
                      lineitem.l_partkey == part.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 15))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 30)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 25))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 45)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 35))
    )
    return j.where(clause).agg(
        F.sum(_rev_cents()).alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


def waiting_suppliers(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame,
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped more than ``late_days`` after
    the order date; the fixture has no commit/receipt dates): per
    supplier, the number of late lineitems in multi-supplier orders
    where that supplier was the *only* late one.

    The EXISTS / NOT EXISTS pair decorrelates to one per-order
    aggregate (distinct supplier count, distinct late-supplier count)
    joined back to the late rows — two shuffles on l_orderkey total,
    instead of two correlated re-scans of lineitem.
    """
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").where(
        # explicit: both consumers of with_due (late rows, per-order
        # aggregate) then canonicalize to the same join exchanges,
        # letting AQE reuse the shuffle stages instead of re-scanning
        F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull())
    with_due = li.join(
        orders.select("o_orderkey", "o_orderdate")
        .where(F.col("o_orderkey").isNotNull()),
        li.l_orderkey == F.col("o_orderkey"))
    late = with_due.where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"))
    per_order = (
        with_due.withColumn(
            "late_supp",
            F.when(F.col("l_shipdate") > F.col("o_orderdate")
                   + F.expr(f"INTERVAL {late_days} DAYS"),
                   F.col("l_suppkey")))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("late_supp").alias("n_late_supp"),
        )
    )
    sole_late = (
        late.select(F.col("l_orderkey").alias("lo"), "l_suppkey")
        .join(per_order.where(
            (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("lo") == per_order.l_orderkey)
    )
    return (
        sole_late.join(broadcast(supplier.select("s_suppkey", "s_name")),
                       sole_late.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def prospective_customers(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q22 shape: per nation, customers with above-average
    positive balance and no orders.  The above-average predicate is
    evaluated in exact integer arithmetic
    (``cents * n_positive > total_positive_cents``) so a last-ulp
    difference in a float mean can never flip a boundary row between
    engines; the NOT EXISTS is a left anti join."""
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    positive = customer.where(F.col("c_acctbal") > 0)
    stats = positive.agg(
        F.count("*").alias("n_pos"),
        F.sum(cents).alias("sum_pos_cents"),
    )
    return (
        positive.withColumn("bal_cents", cents)
        .crossJoin(broadcast(stats))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos_cents"))
        .join(orders.select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal_cents").alias("totacctbal_cents"),
        )
    )


def parts_supplier_relationship(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
    excl_brand: str = "Brand#1", excl_type_prefix: str = "PROMO",
    complaint_bal: float = 1000.0,
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for parts outside one brand/type family, excluding "complaint"
    suppliers (stand-in predicate: s_acctbal < ``complaint_bal``; the
    fixture has no comment column).  The NOT IN subquery is a left anti
    join — NULL-safe by construction since keys are non-null."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    complaint = supplier.where(
        F.col("s_acctbal") < complaint_bal).select(
        F.col("s_suppkey").alias("l_suppkey"))
    parts = part.where(
        (F.col("p_brand") != excl_brand)
        & ~F.col("p_type").startswith(excl_type_prefix)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(broadcast(complaint), "l_suppkey", "left_anti")
        .join(broadcast(parts), pairs.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def excess_quantity_suppliers(
    lineitem: DataFrame, supplier: DataFrame,
    year_start: str = "1997-01-01", year_end: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped, for at least one part,
    more than half that part's total shipped quantity in a year.  The
    nested ``> 0.5 * (SELECT sum(..))`` is evaluated exactly as
    ``2 * supp_qty > part_qty`` in BIGINT (quantities are integral);
    per-part totals come from one reusable aggregate, not a correlated
    re-scan."""
    in_year = lineitem.where(
        (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(year_end).cast("timestamp"))
        # explicit join-key null filters so every consumer of per_pair
        # canonicalizes to the same exchange and AQE reuses the stage
        # (the joins below inject asymmetric subsets otherwise)
        & F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull()
    ).select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
    )
    per_pair = in_year.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty"))
    # re-aggregate the pair partials instead of re-scanning lineitem:
    # one fact scan feeds both levels, and AQE reuses per_pair's
    # shuffle stage for the second rollup
    per_part = per_pair.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"))
    dominant = (
        per_pair.join(per_part, "l_partkey")
        .where(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey").distinct()
    )
    return (
        supplier.join(
            dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


def nation_pair_volume(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    supplier: DataFrame, nation: DataFrame,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, per
    (supplier nation, customer nation, ship year), in both directions.

    Scale: the nation-pair predicate is pushed onto the two dimension
    sides BEFORE the fact joins — customers and suppliers shrink to the
    two nations' members first, so the fact table joins against
    pre-pruned inputs and the (a,b)/(b,a) pair filter runs on rows that
    already matched one side.  Nation is broadcast; the fact⋈orders
    join stays a shuffle join (both scale with SF).
    """
    pair = (nation_a, nation_b)
    ns = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    supp = supplier.join(
        broadcast(ns), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        broadcast(nc), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey", "cust_nation")
    li = lineitem.select(
        "l_orderkey", "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        _rev_cents().alias("vol_cents"),
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("vol_cents").alias("volume_cents"))
    )


def returned_item_ranking(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    nation: DataFrame, quarter_start: str = "1996-01-01",
    quarter_end: str = "1996-04-01", k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items (``l_returnflag = 'R'``) in one quarter, top ``k``.

    The revenue aggregation runs on (o_custkey) BEFORE joining the
    customer/nation attributes — the join input is one row per
    customer-with-returns, not one per lineitem.  Ordering is total
    (rev desc, then custkey) so the LIMIT is deterministic across
    engines.  No c_address/c_phone/c_comment in the fixture; output
    carries the columns that exist.
    """
    rev = (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit(quarter_start).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(quarter_end).cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
    )
    return (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey", "c_name", "n_name", "rev_cents",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
        .orderBy(F.desc("rev_cents"), F.asc("c_custkey"))
        .limit(k)
    )


def large_volume_customers(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_total_qty: int = 180,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with their customer.  The HAVING filter runs on the
    per-order aggregate (map-side partial sum on the natural l_orderkey
    clustering), so only qualifying orders — a tiny fraction — reach
    the joins.  Quantities are integral doubles; the sum is rounded to
    long before the threshold test so both engines gate identically."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("total_qty"))
        .where(F.col("total_qty") > min_total_qty)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.unix_millis("o_orderdate").alias("orderdate_ms"),
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("totalprice_cents"),
            "total_qty",
        )
    )
