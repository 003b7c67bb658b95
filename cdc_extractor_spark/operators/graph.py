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


def order_baskets(
    lineitem: DataFrame,
    max_basket: int | None = None,
    node_limit: int | None = None,
) -> DataFrame:
    """The shared (order → sorted distinct part array) BASKET relation
    with the two skew guards every co-purchase consumer relies on: an
    optional part-id ``node_limit`` (bounded-subgraph extraction,
    applied BEFORE the basket cap) and an optional ``max_basket`` cap
    (drops whale baskets so pair combinatorics are bounded by
    ``max_basket²`` per order).  One definition for copurchase
    pairs/rules (operators/analytics.py), both edge builders and the
    triangle subgraph — a cap-semantics change cannot silently diverge
    between them.

    Optimization r13 (guide §2.3/§2.4): this replaces the distinct
    (order, part) INCIDENCE relation the consumers used to self-join
    on the order key.  ``collect_set`` dedupes (order, part) inside
    ONE order-keyed exchange; the basket cap becomes a free ``size()``
    filter on the aggregated row (the old form paid a separate count
    aggregate + semi-join); and pair/edge generation explodes
    basket-bounded array combinatorics per row instead of re-shuffling
    the incidence relation into a self-join.  Per consumer that is 2
    exchanges instead of 3-4, with the identical pair multiset by
    construction (every (part1 < part2) pair emitted exactly once per
    qualifying order) — 1.7x pairs / 1.2x edges at sf0.1, parity EXACT
    on all 1.2M pair rows (tools/probe_r13d.py)."""
    op = lineitem.select("l_orderkey", "l_partkey")
    if node_limit is not None:
        op = op.filter(F.col("l_partkey") < node_limit)
    # MEMORY BOUND (VERDICT r13 defect #4): collect_set materializes a
    # whale basket's full array in one aggregation buffer BEFORE the
    # size() filter can drop it — the buffer is bounded by the largest
    # DISTINCT-part count of any single order, i.e. 8 bytes x
    # max|basket|.  That is the data model's own bound: an order's
    # line count (TPC-H: <= 7; any realistic order feed: <= 10^4-10^5
    # lines = KBs-MBs per buffer), NOT the corpus size — a 100 TB feed
    # grows the number of orders, not the fan-in of one order key.
    # ObjectHashAggregate falls back to sort-based aggregation under
    # memory pressure, so many concurrent buffers spill; only a single
    # pathological key (millions of distinct parts in ONE order) could
    # hurt, and that is a data-contract violation upstream of this
    # operator.  A hostile-key property test pins the behavior:
    # tests/test_r14_opt.py::test_order_baskets_whale_basket_cap.
    baskets = op.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    if max_basket is not None:
        baskets = baskets.filter(F.size("ps") <= max_basket)
    return baskets


def basket_pairs(baskets: DataFrame) -> DataFrame:
    """(part1, part2) with part1 < part2, emitted once per (order,
    pair): ordered combinations of each sorted basket array —
    posexplode anchors part1, the strictly-later slice supplies
    part2.  A zero-length slice (last element) explodes to no rows, so
    singleton baskets vanish exactly as the old self-join's
    ``part1 < part2`` predicate made them."""
    return baskets.select(
        F.posexplode("ps").alias("_i", "part1"), F.col("ps")
    ).select(
        "part1",
        F.explode(
            F.slice(
                F.col("ps"),
                F.col("_i") + 2,
                F.greatest(F.size("ps") - F.col("_i") - 1, F.lit(0)),
            )
        ).alias("part2"),
    )


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Directed co-purchase edge list: (src, dst) part pairs that share
    an order, both directions, deduplicated.  One shuffle on the order
    key (the basket aggregate); fan-out bounded by basket size (see
    analytics.copurchase_pairs)."""
    p = basket_pairs(order_baskets(lineitem))
    return (
        p.select(F.col("part1").alias("src"), F.col("part2").alias("dst"))
        .unionByName(
            p.select(F.col("part2").alias("src"), F.col("part1").alias("dst"))
        )
        .distinct()
    )


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    top_n: int = 100,
    loop_partitions: int | None = None,
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

    ``loop_partitions`` sizes the per-iteration exchanges to the DATA
    VOLUME instead of the session shuffle default (round-8
    strong-scaling lesson, SCALE.md: loop shuffles over a small state
    relation schedule fleets of mostly-empty tasks when partitions
    default to total cores).  The plan is returned lazily, so a
    scoped-conf approach cannot reach its execution — instead the loop
    embeds ``repartition(n, key)`` on both join inputs (co-partitioned
    at n, so the join adds no further exchange) and on the contribution
    relation ahead of its groupBy (a child already hash-partitioned on
    the grouping key satisfies the aggregate's distribution, replacing
    the conf-sized exchange).  ``None`` keeps the session layout; the
    repartition subtrees are canonical-identical per iteration, so
    ReusedExchange dedupes them exactly as before (plan-asserted).
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
    if loop_partitions:
        with_deg = with_deg.repartition(loop_partitions, "src")
    ranks = deg.select(
        F.col("src").alias("node"),
        F.lit(1_000_000).cast("long").alias("r"),
    )
    for _ in range(iters):
        if loop_partitions:
            ranks = ranks.repartition(loop_partitions, "node")
        contribs = (
            with_deg.join(ranks, F.col("src") == F.col("node"))
            .select("dst", F.expr("r DIV deg").alias("c"))
        )
        if loop_partitions:
            contribs = contribs.repartition(loop_partitions, "dst")
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


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle count + global clustering coefficient over a CANONICAL
    edge list (src < dst, deduplicated) — the cohesion metrics of
    graph analytics (a closed co-purchase triangle is a much stronger
    affinity signal than a pair).

    Triangles enumerate as the classic ordered three-join: (a,b) ⋈
    (b,c) ⋈ (a,c) with a < b < c counts each triangle exactly once.
    Wedges (open+closed 2-paths) come from undirected degrees:
    Σ deg·(deg−1)/2 — integer-exact because deg·(deg−1) is even.
    Clustering = 3·triangles/wedges in integer basis points.

    Plan shape (scale): two equi-join shuffles whose intermediate is
    the wedge set — the quadratic-in-degree term.  The standard
    mitigations compose upstream: cap basket size (copurchase edge
    derivation already does), prune to support ≥ s, or restrict to a
    node subset; the canonical a<b<c ordering already keeps every
    wedge rooted at its smallest vertex (the degree-ordering trick
    that bounds work by arboricity).  Degrees aggregate map-side;
    outputs are single-row.
    """
    e = edges.select("src", "dst")
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) DIV 2")).alias("n_wedges")
    )
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.crossJoin(wedges)  # three 1-row frames
        .crossJoin(n_edges)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.expr("3 * n_triangles * 10000 DIV n_wedges"),
            ).otherwise(F.lit(0)).cast("long").alias("clustering_bp"),
        )
    )


def canonical_copurchase_edges(
    lineitem: DataFrame, node_limit: int = 500, max_basket: int = 50
) -> DataFrame:
    """Canonical (src < dst, deduplicated) co-purchase edges over the
    part-id subrange ``< node_limit``, baskets capped AFTER the node
    filter — the bounded subgraph extraction that keeps wedge-quadratic
    algorithms (triangles) at a chosen cost at any corpus scale."""
    p = basket_pairs(
        order_baskets(lineitem, max_basket=max_basket, node_limit=node_limit)
    )
    return (
        p.select(F.col("part1").alias("src"), F.col("part2").alias("dst"))
        .distinct()
    )


def bfs_k_hop(
    edges: DataFrame, n_seeds: int = 5, hops: int = 3
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from a seed set to every
    node reachable within ``hops`` — the k-hop neighbourhood expansion
    behind graph feature extraction (fraud rings, affiliation spheres)
    and the third member of the iterative-graph family (PageRank above,
    connected components in functions/dedup.py).  Seeds are the
    ``n_seeds`` smallest node ids appearing anywhere in the edge list
    — src OR dst, so sink-only nodes are eligible (deterministic, no
    sampling).  Traversal follows edges src→dst as given; pass a
    symmetrized edge list for undirected semantics.

    All state is (node, depth) with depth a small int — min() reduces
    are order-independent, so the frontier after N rounds is
    bit-identical on any engine/partitioning and the oracle can unroll
    the same N rounds as CTEs (or a recursive CTE with min()).

    Plan shape (scale): per hop, ONE shuffle join (frontier ⋈ edges on
    src — edges can be hash-partitioned once and reused every round)
    and a min-aggregate on the reached node; the visited set stays
    (node, depth) longs.  Fixed ``hops`` keeps lineage shallow — an
    unbounded BFS would localCheckpoint per round like the
    connected-components resolver.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = (
        nodes.orderBy("node")
        .limit(n_seeds)
        .select("node", F.lit(0).cast("long").alias("depth"))
    )
    visited = seeds
    frontier = seeds
    for d in range(1, hops + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("depth", F.lit(d).cast("long"))
        )
        # keep only first-time discoveries: min(depth) over the union
        visited = (
            visited.unionByName(reached)
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
        )
        frontier = visited.filter(F.col("depth") == d)
    return visited


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the co-purchase graph, published as the
    exact integer sufficient statistics plus the Pearson coefficient
    in basis points — do hub parts co-occur with other hubs (r > 0) or
    with the long tail (r < 0)?  The standard Newman formulation over
    the symmetric directed edge list: with M directed edges and
    endpoint degrees (j, k), r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²)
    (Σj = Σk by symmetry).  Numerator/denominator are emitted as exact
    DECIMAL(38,0) cross-products reduced to one r_bp value plus the
    raw int64 sums — no floats anywhere (the colstats_cross_moments
    publish-sums-combine-small rule).

    Scale shape: degrees are one hash aggregate over edges; the two
    degree lookups join back on src/dst (each a key-partitioned
    shuffle — at 100 TB pre-bucket the edge list by src as
    pagerank_integer documents); the final reduction is a single row.
    """
    e = edges.select("src", "dst")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dd = e.join(deg, "src").join(
        deg.select(F.col("src").alias("dst"), F.col("deg").alias("deg_dst")),
        "dst",
    )
    sums = dd.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum("deg").alias("s_j"),
        F.sum(F.col("deg") * F.col("deg_dst")).alias("s_jk"),
        F.sum(F.col("deg") * F.col("deg")).alias("s_jj"),
    )
    # r_bp via truncating integral `div` on DECIMAL(38,0) cross-products
    # (both engines truncate toward zero; a scaled-decimal `/` + floor
    # would round at the division's fixed scale first and can differ in
    # the last permille digit)
    d = "CAST({} AS DECIMAL(38,0))"
    num = (
        f"({d.format('m_edges')} * s_jk - {d.format('s_j')} * s_j)"
    )
    den = (
        f"({d.format('m_edges')} * s_jj - {d.format('s_j')} * s_j)"
    )
    return sums.selectExpr(
        "CAST(m_edges AS BIGINT) AS m_edges",
        "CAST(s_j AS BIGINT) AS s_j",
        "CAST(s_jk AS BIGINT) AS s_jk",
        "CAST(s_jj AS BIGINT) AS s_jj",
        f"CASE WHEN {den} <> 0 THEN "
        f"CAST(({d.format('10000')} * {num}) div {den} AS BIGINT) "
        "END AS r_bp",
    )
