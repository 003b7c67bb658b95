"""Iterative graph analytics over relationship graphs derived from the
extract (reference scope: the change feed carries the entity
relationships — SURVEY.md §1.2; dup-cluster connected components lives
in functions/dedup.py as the other iterative-graph member).

Design rule for every iterative operator here: ALL arithmetic is
integer (ranks in parts-per-million, contributions via integer DIV),
so per-iteration results are bit-identical regardless of engine,
partitioning, or reduce order — float power iteration cannot be
value-hash-compared cross-engine because double sums are
accumulation-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase edge list: (src, dst) part pairs that share
    an order, both directions, deduplicated.  One shuffle on the order
    key; fan-out bounded by basket size (see
    analytics.copurchase_pairs)."""
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank_integer(
    edges: DataFrame, iters: int = 3, top_n: int = 100
) -> DataFrame:
    """PageRank (damping 0.85) in pure INTEGER arithmetic: ranks are
    parts-per-million, each node sends ``r DIV deg`` along every out
    edge, and the update is ``150000 + (85 * sum(contribs)) DIV 100``.
    Integer sums are reduce-order-independent, so the fixed-point after
    N iterations is bit-identical on any engine / partitioning — the
    property that lets an iterative algorithm carry a value-hash
    oracle at all (the oracle unrolls the same N iterations as CTEs).

    The graph is undirected (edges hold both directions), so every
    node has in-degree >= 1 and the dangling-mass term vanishes — no
    special-casing.

    Plan shape (scale): per iteration, ONE shuffle join
    (ranks ⋈ edges+deg on the source key — edges can be pre-hash-
    partitioned on src once and the partitioning reused every
    iteration) and one hash aggregate on dst with map-side combine.
    Rank state is one long per node.  The final top-n is a
    TakeOrdered.  Lineage stays shallow (3 fixed iterations); an
    open-ended solver would localCheckpoint per round like the
    connected-components resolver (functions/dedup.py).
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # The degree-annotated edge list appears once per iteration in the
    # final plan; its exchange is canonical-identical each time, so
    # whole-plan execution dedupes the edge derivation via
    # ReusedExchange (plan-asserted in tests) — measured FASTER than
    # forcing materialization (persist pins 2M-row blocks through the
    # CacheManager; localCheckpoint pays an eager block write), because
    # the reused exchange ships only shuffle files it already wrote.
    with_deg = edges.join(deg, "src")
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(1_000_000).cast("long").alias("r"),
    )
    for _ in range(iters):
        contribs = (
            with_deg.join(ranks, F.col("src") == F.col("node"))
            .select("dst", F.expr("r DIV deg").alias("c"))
        )
        ranks = contribs.groupBy("dst").agg(
            (F.lit(150_000) + F.expr("(85 * sum(c)) DIV 100"))
            .cast("long")
            .alias("r")
        ).select(F.col("dst").alias("node"), "r")
    return (
        ranks.join(deg, F.col("node") == F.col("src"))
        .select("node", F.col("r").alias("rank_ppm"), "deg")
        .orderBy(F.col("rank_ppm").desc(), F.col("node").asc())
        .limit(top_n)
    )
