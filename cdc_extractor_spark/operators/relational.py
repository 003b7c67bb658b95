"""Relational operator coverage beyond the reference's single scalar
lookup (SURVEY.md §2 checklist: the reference has no hash/sort-merge/
range/semi/anti joins, no set ops, no rollup — all delegated to
Postgres).  A complete engine supplies them; each function here is the
Spark-first form with its scale rationale.

``events``/``orders``/``customer`` roles follow FIXTURES.md: events ≙
the change feed, orders/customer ≙ monitored base tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_latest_order(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: for every event, the user's latest order at-or-before
    the event time (B4's event-time sequencing generalized to two
    streams; the reference's commit-ts lookup A7 is the degenerate
    exact-key case).

    Spark-first strategy: tag and union both sides, then one window pass
    per user ordered by time — ``last_value`` of the order attributes
    carried forward onto event rows.  This is a single shuffle on the
    key (no M×N range blowup, no cross join); at 100 TB both sides
    shuffle-sort once on (user, ts), the same cost profile as a
    sort-merge join, and skewed users split via AQE.
    """
    e = events.select(
        F.col("user_id").alias("uid"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("at_ms"),
        F.col("event_id"),
        F.lit(1).alias("is_event"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("o_total_cents"),
    )
    o = orders.select(
        F.col("o_custkey").alias("uid"),
        F.unix_millis(F.col("o_orderdate")).alias("at_ms"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_event"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_total_cents"),
    )
    # orders sort before events at the same instant (is_event ascending):
    # an order ON the event timestamp is visible to the event — the
    # at-or-before convention.
    w = (
        Window.partitionBy("uid")
        .orderBy("at_ms", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = e.unionByName(o).select(
        "uid",
        "at_ms",
        "event_id",
        "is_event",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.last("o_total_cents", ignorenulls=True).over(w).alias("last_total_cents"),
    )
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("uid").alias("user_id"),
        F.col("at_ms").alias("event_ms"),
        "last_orderkey",
        "last_total_cents",
    )


def range_join_prior_events(events: DataFrame, hours: int = 1) -> DataFrame:
    """Interval self-join: for each event, count the same user's strictly
    earlier events inside the trailing ``hours`` window (sessionization's
    core primitive).

    Equi key (user) + range predicate (ts window): Catalyst plans the
    equi part as a hash/sort-merge join and applies the range residual
    as a post-join filter — linear in matches, never a cross join.
    Counted per event to keep the result bounded.
    """
    e = events.select(
        "event_id",
        F.col("user_id").alias("uid"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("event_ms"),
    )
    prior = e.select(
        F.col("uid"),
        F.col("event_id").alias("prior_id"),
        F.col("event_ms").alias("prior_ms"),
    )
    window_ms = hours * 3_600_000
    joined = e.join(prior, "uid").filter(
        (F.col("prior_ms") < F.col("event_ms"))
        & (F.col("prior_ms") >= F.col("event_ms") - F.lit(window_ms))
    )
    return joined.groupBy("event_id", F.col("uid").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_prior_events"),
        F.min("prior_id").alias("earliest_prior_id"),
    )


def semi_join_active_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi: customers that have at least one order.  Semi joins
    dedup build-side keys before probing — no row multiplication."""
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


def anti_join_dormant_customers(customer: DataFrame, events: DataFrame) -> DataFrame:
    """Left-anti: customers that never appear in the change feed (the
    event stream's ``user_id`` domain is a strict subset of customers,
    so this is non-empty by construction)."""
    return customer.join(
        events.select(F.col("user_id").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    ).select("c_custkey", "c_name", "c_nationkey")


def set_ops_user_cohorts(events: DataFrame, tables: tuple[str, str]) -> DataFrame:
    """Union/intersect/except over user cohorts defined by event type —
    the §2-checklist set operators, tagged into one result so a single
    oracle covers all three.

    Scale: each set op is a shuffle on the single key column of
    *distinct* ids (map-side dedup first).
    """
    a_type, b_type = tables
    a = events.filter(F.col("event_type") == a_type).select("user_id").distinct()
    b = events.filter(F.col("event_type") == b_type).select("user_id").distinct()
    return (
        a.intersect(b).select("user_id", F.lit("both").alias("cohort"))
        .unionByName(a.exceptAll(b).select("user_id", F.lit("a_only").alias("cohort")))
        .unionByName(b.exceptAll(a).select("user_id", F.lit("b_only").alias("cohort")))
    )


def rollup_revenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                   nation: DataFrame, region: DataFrame) -> DataFrame:
    """ROLLUP (region → nation) over star-join revenue — grouping-set
    aggregation the reference lacks entirely (§2 checklist "no grouping
    sets/cube/rollup anywhere").

    Spark computes all grouping sets in one shuffle (expand + single
    hash agg); dims broadcast (see star.py rationale).
    """
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    joined = (
        lineitem.select("l_orderkey", cents.alias("cents"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum("cents").alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_items"),
            F.grouping_id().alias("grouping_level"),
        )
    )


def topk_customers_by_revenue(lineitem: DataFrame, orders: DataFrame,
                              customer: DataFrame, k: int = 10) -> DataFrame:
    """Top-k with deterministic tie-break (revenue desc, custkey asc).

    Scale: the join shuffles once on orderkey; the top-k itself is a
    rank over the *aggregated* per-customer frame (tiny), never a global
    sort of the fact table.
    """
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    per_cust = (
        lineitem.select("l_orderkey", cents.alias("cents"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    # Distributed top-k: orderBy().limit(k) plans as TakeOrderedAndProject
    # (per-partition heaps, k rows to the driver-side merge) — never the
    # single-task global window a rank()<=k filter would cost.  The rank
    # column is then a window over k rows only.
    topk = per_cust.orderBy(
        F.desc("revenue_cents"), F.asc("c_custkey")
    ).limit(k)
    w = Window.orderBy(F.desc("revenue_cents"), F.asc("c_custkey"))
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")), "c_custkey")
        .select("rank", "c_custkey", "c_name", "revenue_cents")
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus)
    sums/averages over lineitem — the canonical wide-agg scan.

    Integer-cent sums keep the hash engine-portable; averages are
    floored cents (module convention, see changelog.py docstring).
    """
    price_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    charge_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")) * 100
    ).cast("long")
    qty = F.col("l_quantity").cast("long")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price_cents).alias("sum_base_cents"),
            F.sum(disc_cents).alias("sum_disc_cents"),
            F.sum(charge_cents).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_cents",
            "sum_disc_cents",
            "sum_charge_cents",
            F.floor(F.col("sum_qty") / F.col("n_rows")).cast("long").alias("avg_qty"),
            F.floor(F.col("sum_base_cents") / F.col("n_rows")).cast("long").alias(
                "avg_base_cents"
            ),
            "n_rows",
        )
    )

def full_outer_yearly_reconciliation(orders: DataFrame) -> DataFrame:
    """Full-outer join: per-customer revenue in 1996 vs 1997, keeping
    customers active in either year and classifying each as retained /
    churned / acquired — the drift-reconciliation shape (e.g. CDC
    snapshot vs source audit) that semi/anti joins can't express
    because BOTH unmatched sides must survive.

    Scale: both sides aggregate before joining (pre-aggregation shrinks
    the join inputs from O(orders) to O(customers)); the join keys are
    the same hash partitioning as the aggregations, so AQE reuses the
    shuffle."""

    def year_cents(year: int) -> DataFrame:
        return (
            orders.filter(F.year("o_orderdate") == year)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                    f"cents_{year}"
                )
            )
        )

    joined = year_cents(1996).join(year_cents(1997), "custkey", "full_outer")
    return joined.select(
        "custkey",
        F.coalesce("cents_1996", F.lit(0)).alias("cents_1996"),
        F.coalesce("cents_1997", F.lit(0)).alias("cents_1997"),
        F.when(F.col("cents_1996").isNull(), F.lit("acquired"))
        .when(F.col("cents_1997").isNull(), F.lit("churned"))
        .otherwise(F.lit("retained"))
        .alias("status"),
    )


def asof_join_next_event(orders: DataFrame, events: DataFrame) -> DataFrame:
    """Forward as-of join: for every order, the customer's NEXT event
    at-or-after the order date — the mirror of
    ``asof_join_latest_order`` (backward).  Together they complete the
    as-of family in both directions (backward = feature enrichment,
    forward = outcome/label attachment: "what did the user do after
    this order, and when").

    Same single-shuffle strategy: tag + union both sides, one window
    pass per user — ``first_value`` (ignoring nulls) over the
    following frame carries the nearest later event's attributes back
    onto order rows.  Orders with no later event are omitted (the
    label-join convention); no M×N range blowup anywhere.
    """
    o = orders.select(
        F.col("o_custkey").alias("uid"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("at_ms"),
        "o_orderkey",
        F.lit(1).alias("is_order"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("e_ms"),
    )
    e = events.select(
        F.col("user_id").alias("uid"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("at_ms"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(0).alias("is_order"),
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("e_ms"),
    )
    # orders sort BEFORE events at the same instant (is_order
    # descending): an event ON the order date is visible to the order —
    # the at-or-after convention; event_id breaks same-instant ties.
    w = (
        Window.partitionBy("uid")
        .orderBy("at_ms", F.desc("is_order"), "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    merged = o.unionByName(e).select(
        "uid",
        "at_ms",
        "o_orderkey",
        "is_order",
        F.first("event_id", ignorenulls=True).over(w).alias("next_event_id"),
        F.first("e_ms", ignorenulls=True).over(w).alias("next_event_ms"),
    )
    return merged.filter(
        (F.col("is_order") == 1) & F.col("next_event_id").isNotNull()
    ).select(
        "o_orderkey",
        F.col("uid").alias("o_custkey"),
        F.col("at_ms").alias("order_ms"),
        "next_event_id",
        "next_event_ms",
    )


def interval_overlap_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    cell_ms: int = 3_600_000,
) -> DataFrame:
    """Keyed interval-overlap join — every (left, right) pair of the
    SAME user whose activity intervals intersect, with the exact
    overlap length.  The reference's only temporal operator is the
    scalar commit-ts lookup (A7); overlap joins are the general
    two-sided form (ad exposure ⋈ conversion windows, maintenance
    windows ⋈ incidents) that neither an equi- nor an as-of join can
    express.

    Spark-first strategy (the grid-cell trick used by Flink interval
    joins and spatial engines): intervals explode onto fixed
    ``cell_ms`` grid cells (``sequence(lo div g, hi div g)`` — a
    narrow, shuffle-free explode bounded by duration/g per row), the
    join is a plain EQUI-join on (user, cell) that Catalyst executes
    as a shuffled hash join — never a range/theta join, never
    BroadcastNestedLoop (plan-asserted).  Double-counting across
    shared cells is eliminated WITHOUT a distinct: a qualifying pair
    is emitted only at its FIRST common cell, ``greatest(a.lo, b.lo)
    div g``, which both sides provably cover whenever the intervals
    overlap.  The residual predicate then checks true ms overlap
    (cells are coarser than intervals).  At 100 TB the shuffle is on
    (user, cell) — time-local, naturally balanced; hot cells split by
    AQE, and ``cell_ms`` tunes the explode-factor/selectivity trade
    exactly like a spatial grid's cell size.

    Intervals here: each left event holds ``(event_id mod 7)+1``
    hours, each right ``(event_id mod 5)+1`` — deterministic synthetic
    durations, integer ms end-to-end.  Output: per-user pair counts
    and exact overlap-ms totals.
    """
    ms = F.unix_millis(F.col("ts").cast("timestamp"))

    def side(tp: str, mod: int, pre: str) -> DataFrame:
        return events.filter(F.col("event_type") == tp).select(
            F.col("user_id").alias(f"{pre}_uid"),
            F.col("event_id").alias(f"{pre}_id"),
            ms.alias(f"{pre}_lo"),
            (ms + ((F.col("event_id") % mod) + 1) * cell_ms).alias(f"{pre}_hi"),
        )

    a = side(left_type, 7, "a").withColumn(
        "_ca", F.explode(F.expr(f"sequence(a_lo div {cell_ms}, a_hi div {cell_ms})"))
    )
    b = side(right_type, 5, "b").withColumn(
        "_cb", F.explode(F.expr(f"sequence(b_lo div {cell_ms}, b_hi div {cell_ms})"))
    )
    pairs = (
        a.join(b, (F.col("a_uid") == F.col("b_uid")) & (F.col("_ca") == F.col("_cb")))
        # emit-once cell: the first cell both intervals cover
        .filter(
            F.col("_ca")
            == F.expr(f"greatest(a_lo, b_lo) div {cell_ms}")
        )
        # residual exactness: cell co-occupancy is necessary, not
        # sufficient (cells are coarser than ms)
        .filter((F.col("a_lo") <= F.col("b_hi")) & (F.col("b_lo") <= F.col("a_hi")))
    )
    return pairs.groupBy(F.col("a_uid").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")
        ).alias("sum_overlap_ms"),
        F.max(
            F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo")
        ).alias("max_overlap_ms"),
        F.countDistinct("a_id").alias("n_left"),
        F.countDistinct("b_id").alias("n_right"),
    )


def interval_coverage_per_user(
    events: DataFrame, cell_ms: int = 3_600_000
) -> DataFrame:
    """Interval UNION (coverage) per user: merge each user's
    overlapping activity intervals into maximal islands and report how
    many islands remain, the exact covered span, and the largest
    island — the measure-of-union sweep (total time "in session",
    SLA-covered minutes) that complements ``interval_overlap_join``
    (which relates two interval SETS; this collapses one).

    Spark-first shape: the classic sweep — sort each user's intervals
    by (lo, event_id), carry ``max(hi)`` over preceding rows, start a
    new island when ``lo`` clears it, island id = running count of
    starts — is TWO window functions over ONE physical per-user sort
    (Catalyst shares the sort; no self-join, no explode).  Partitioning
    is by user_id, whose cardinality GROWS with the data (unlike the
    5-value event_type funnels rewritten this round) — per-task state
    is one user's intervals, and a pathological single-user firehose
    is the documented limit (pre-aggregate such keys to coarse cells
    first).  Durations are the deterministic synthetic
    ``(event_id mod 7)+1`` hours, integer ms end-to-end.
    """
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    iv = events.select(
        "user_id",
        "event_id",
        ms.alias("lo"),
        (ms + ((F.col("event_id") % 7) + 1) * cell_ms).alias("hi"),
    )
    w = Window.partitionBy("user_id").orderBy("lo", "event_id")
    prev_max = F.max("hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "event_id",
        "lo",
        "hi",
        F.when(prev_max.isNull() | (F.col("lo") > prev_max), 1)
        .otherwise(0)
        .alias("_start"),
    ).withColumn(
        "_grp",
        F.sum("_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = marked.groupBy("user_id", "_grp").agg(
        F.min("lo").alias("ilo"), F.max("hi").alias("ihi")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("ihi") - F.col("ilo")).alias("covered_ms"),
        F.max(F.col("ihi") - F.col("ilo")).alias("max_island_ms"),
    )


def fk_orphan_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit over every foreign-key edge of the
    star schema (plus the feed's actor key): per edge, how many child
    rows point at a parent key that does not exist, and how many
    distinct phantom keys there are.  This is the ingest gate a CDC
    consumer runs after applying a batch — the reference's silent-skip
    restart bug (SURVEY.md §2 checklist, CoordinatorRunnable.java:87)
    manifests EXACTLY as orphaned children (order_lines whose order
    vanished), and this query is its detector.  NULL foreign keys are
    not violations (SQL RI semantics) and are excluded from both
    counts.

    Plan shape (scale): one LEFT join per edge on the key, parent side
    reduced to distinct keys first — dimension parents broadcast;
    the one fact-fact edge (lineitem→orders) is a shuffled join on the
    join key, exactly the co-location a bucketed layout would make
    shuffle-free.  Each edge finishes in a single-row aggregate; the
    union is |edges| rows.  No windows, no collects."""
    edges = [
        ("lineitem.l_orderkey->orders.o_orderkey",
         tables["lineitem"], "l_orderkey", tables["orders"], "o_orderkey"),
        ("lineitem.l_partkey->part.p_partkey",
         tables["lineitem"], "l_partkey", tables["part"], "p_partkey"),
        ("lineitem.l_suppkey->supplier.s_suppkey",
         tables["lineitem"], "l_suppkey", tables["supplier"], "s_suppkey"),
        ("orders.o_custkey->customer.c_custkey",
         tables["orders"], "o_custkey", tables["customer"], "c_custkey"),
        ("customer.c_nationkey->nation.n_nationkey",
         tables["customer"], "c_nationkey", tables["nation"], "n_nationkey"),
        ("supplier.s_nationkey->nation.n_nationkey",
         tables["supplier"], "s_nationkey", tables["nation"], "n_nationkey"),
        ("nation.n_regionkey->region.r_regionkey",
         tables["nation"], "n_regionkey", tables["region"], "r_regionkey"),
        ("events.user_id->customer.c_custkey",
         tables["events"], "user_id", tables["customer"], "c_custkey"),
    ]
    outs = []
    for name, child, ckey, parent, pkey in edges:
        pk = parent.select(
            F.col(pkey).cast("long").alias("_pk")
        ).distinct().withColumn("_hit", F.lit(1))
        j = (
            child.select(F.col(ckey).cast("long").alias("_ck"))
            .filter(F.col("_ck").isNotNull())
            .join(pk, F.col("_ck") == F.col("_pk"), "left")
        )
        outs.append(
            j.agg(
                F.lit(name).alias("fk_edge"),
                F.count(F.lit(1)).cast("long").alias("child_rows"),
                F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("orphan_rows"),
                F.count_distinct(
                    F.when(F.col("_hit").isNull(), F.col("_ck"))
                ).cast("long").alias("orphan_keys"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
