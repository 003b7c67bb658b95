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


from cdc_extractor_spark.plans import executed_plan as plan_of
from cdc_extractor_spark.plans import formatted_plan as formatted
from cdc_extractor_spark.plans import pushed_filters


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


def test_exists_subquery_decorrelates_to_semi_join(spark, sf_dir):
    """The correlated EXISTS must become a left-semi join, not a
    per-row subquery re-execution (the reference's per-xid lookup
    anti-pattern, WorkerRunnable.java:133-136)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["subquery_exists_returned"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "LeftSemi" in plan
    assert "InSubquery" not in plan


def test_scalar_subquery_decorrelates_to_aggregate_join(spark, sf_dir):
    """The correlated scalar subquery becomes agg-then-join: one
    aggregate over the inner relation, joined back — executed once, not
    once per outer row."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["subquery_scalar_small_quantity"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "Join" in plan
    # the per-part average appears as a real aggregate node in the same
    # plan (decorrelated), not as a ScalarSubquery re-run per row
    assert "avg(" in plan


def test_grouping_sets_single_expand_single_scan(spark, sf_dir):
    """GROUPING SETS with 3 sets must still scan the input once: one
    Expand node replicates rows per set before a single aggregate."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["grouping_sets_order_status"](spark, sf_dir)
    df.collect()
    # with AQE the stringified plan repeats as "Initial Plan"; assert on
    # the finalized section only
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_sliding_window_map_side_partial_agg(spark, sf_dir):
    """The 5-slot window expansion happens map-side with a partial
    aggregate before the single shuffle."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["window_sliding_5min"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial" in plan.lower()

def test_q6_filters_pushed_and_columns_pruned(spark, sf_dir):
    """TPC-H Q6 shape: all three range predicates must reach the
    parquet scan and the scan must read only the 4 referenced columns
    of lineitem's 11."""
    from cdc_extractor_spark.io import register_views
    from cdc_extractor_spark.queries import _Q6_SPARK_SQL

    register_views(spark, sf_dir)
    plan = formatted(spark.sql(_Q6_SPARK_SQL))
    assert "PushedFilters" in plan
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, frag
    read = plan[plan.index("ReadSchema") :].split("\n")[0]
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_partitioned_read_prunes_directories(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune at planning time:
    the scan's partition count reflects 2 of 5 event_type directories
    and the filter appears as a partition filter, not a data filter."""
    from cdc_extractor_spark.sinks import write_partitioned_parquet

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    out = str(tmp_path / "by_type")
    write_partitioned_parquet(ev, out, "event_type")
    back = spark.read.parquet(out).filter(
        F.col("event_type").isin("click", "purchase")
    )
    plan = formatted(back)
    assert "PartitionFilters" in plan
    assert "event_type IN (click,purchase)" in plan.replace("'", "") or (
        "In(event_type" not in plan
    )
    # pruned read sees only the two matching partition values
    assert set(
        r.event_type for r in back.select("event_type").distinct().collect()
    ) == {"click", "purchase"}

def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Per-group top-k must plan a WindowGroupLimit: each shuffle
    partition keeps its local top-k before the per-group sort, so the
    window never ranks the full group."""
    from cdc_extractor_spark.operators.analytics import topk_per_group

    df = topk_per_group(load_table(spark, sf_dir, "part"), 3)
    assert "WindowGroupLimit" in plan_of(df)


def test_decision_support_broadcasts_and_no_cartesian(spark, sf_dir):
    """The new TPC-H shapes keep dims broadcast and never degrade to a
    cartesian product; the scalar-total cross joins are 1-row
    broadcasts (BroadcastNestedLoopJoin over a single-row side), not
    CartesianProduct."""
    from cdc_extractor_spark.operators import decision_support as ds

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    for df in (
        ds.min_acctbal_supplier_per_part(li, part, sup),
        ds.important_parts(li, part),
        ds.top_supplier(li, sup),
        ds.disjunctive_revenue(li, part),
        ds.waiting_suppliers(li, orders, sup),
        ds.prospective_customers(cust, orders),
    ):
        plan = plan_of(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q19_join_key_survives_disjunction(spark, sf_dir):
    """Q19 shape: the common p_partkey = l_partkey conjunct must stay a
    hash-join key (not be folded into the OR and force a nested-loop
    join)."""
    from cdc_extractor_spark.operators import decision_support as ds

    df = ds.disjunctive_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_clustered_files_are_disjoint_slices(spark, sf_dir, tmp_path):
    """write_range_clustered must produce (near-)disjoint per-file key
    ranges so footer min/max skips files: a narrow range predicate's
    rows may touch at most 2 of the 8 files (boundary overlap only)."""
    from cdc_extractor_spark import sinks

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "clustered")
    sinks.write_range_clustered(ev, out, "event_id", n_partitions=8)

    back = spark.read.parquet(out)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .collect()
    )
    ranges = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(ranges) >= 4
    for (_, hi_prev), (lo, _) in zip(ranges, ranges[1:]):
        assert lo > hi_prev  # strictly disjoint slices

    total = ev.count()
    lo_q, hi_q = 100, 100 + max(50, total // 20)
    touched = (
        back.where((F.col("event_id") > lo_q) & (F.col("event_id") <= hi_q))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert touched <= 2


def test_bloom_filter_pruned_join_plan(spark, t):
    """bloom_pruned_join must carry Catalyst's injected runtime bloom
    filter: the lineitem scan side filtered by might_contain over a
    bloom_filter_agg subquery built from the selective orders side —
    and the injection confs must be restored afterwards."""
    from cdc_extractor_spark.operators import maintenance

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = maintenance.bloom_pruned_join(spark, t["lineitem"], t["orders"])
    plan = plan_of(df)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    # pruning must not change results vs the plain join
    dim = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    plain = (
        t["lineitem"]
        .join(dim, t["lineitem"]["l_orderkey"] == dim["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_cents"
            ),
        )
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, plain.collect()))


def test_zorder_layout_skips_files_both_dims(spark, sf_dir, tmp_path):
    """write_zorder_clustered must give BOTH columns file-level
    locality: a narrow predicate on either dimension alone touches a
    strict subset of the files (footer min/max stays tight per file on
    each interleaved column)."""
    from cdc_extractor_spark import sinks

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "zorder")
    sinks.write_zorder_clustered(ev, out, "user_id", "event_id", n_partitions=8)

    back = spark.read.parquet(out)
    n_files = back.select(F.input_file_name()).distinct().count()
    assert n_files >= 4

    def touched(pred):
        return (
            back.where(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    total = ev.count()
    t_user = touched(F.col("user_id") <= 1)
    t_event = touched(F.col("event_id") <= total // 8)
    assert t_user < n_files
    assert t_event < n_files
    # combined rectangle is at least as selective as either side
    t_both = touched(
        (F.col("user_id") <= 1) & (F.col("event_id") <= total // 8)
    )
    assert t_both <= min(t_user, t_event)


def test_join_hints_control_physical_strategy(spark, t):
    """shuffle_hash / merge hints must flip the physical join node
    (ShuffledHashJoin vs SortMergeJoin) without changing results."""
    orders, customer = t["orders"], t["customer"]
    cust = customer.where(F.col("c_mktsegment") == "BUILDING")

    def joined(hint):
        return orders.join(
            cust.hint(hint), orders.o_custkey == cust.c_custkey
        ).groupBy("o_orderpriority").count()

    hashed, merged = joined("shuffle_hash"), joined("merge")
    assert "ShuffledHashJoin" in plan_of(hashed)
    assert "SortMergeJoin" in plan_of(merged)
    assert sorted(map(tuple, hashed.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_parameterized_sql_pushes_bound_range(spark, sf_dir):
    """Parameter binding must not defeat pushdown: the bound offset
    range appears in the scan's PushedFilters like the literal form."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["sql_parameterized_scan"](spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "GreaterThan(event_id" in pushed
    assert "LessThanOrEqual(event_id" in pushed


def test_topk_customers_plans_as_take_ordered(spark, t):
    """Global top-k must plan as TakeOrderedAndProject (per-partition
    heaps), never a rank-filter over a single-partition window."""
    df = relational.topk_customers_by_revenue(
        t["lineitem"], t["orders"], t["customer"], 10
    )
    assert "TakeOrderedAndProject" in plan_of(df)


def test_global_sequence_avoids_single_partition_window(spark, sf_dir):
    """orderby_commit_ts must compute the global sequence without an
    Exchange SinglePartition (the empty-partition window funnel)."""
    from cdc_extractor_spark.operators import cdc
    from cdc_extractor_spark.sources.changes import changes_df

    df = cdc.orderby_commit_ts(changes_df(spark, sf_dir))
    assert "SinglePartition" not in plan_of(df)


def test_pack_token_shards_avoids_single_partition_window(spark, sf_dir):
    """The packing prefix sum must use the bucketed two-pass (window
    partitioned on the bucket), never a global ordered window."""
    from cdc_extractor_spark.functions import text

    df = text.pack_token_shards(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(_b" in plan


def test_bm25_topn_plans_as_take_ordered(spark, sf_dir):
    """BM25's top-n must come from TakeOrderedAndProject (per-partition
    heaps), not a rank filter over a corpus-wide window."""
    from cdc_extractor_spark.functions import text

    df = text.bm25_rank(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan


def test_staleness_running_avg_avoids_single_partition_window(spark, sf_dir):
    """staleness_lag's running mean must come from the bucketed
    two-pass prefix-sum form: the window partitions on the bucket
    column and no Exchange SinglePartition appears anywhere."""
    df = changelog.staleness_lag(load_table(spark, sf_dir, "events"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(_b" in plan


def test_scan_task_count_follows_max_partition_bytes(spark, sf_dir):
    """Input-split planning must track spark.sql.files.maxPartitionBytes
    — the knob that sizes scan tasks to executor memory at any SF
    (SCALE.md global posture).  Shrinking it must yield strictly more
    scan partitions for the same file set."""
    import os

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    path = os.path.join(sf_dir, "lineitem.parquet")
    try:
        spark.conf.set(key, "128MB")
        wide = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set(key, "16KB")
        narrow = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set(key, old)
    assert narrow > wide


def test_no_python_eval_outside_sanctioned_paths(spark, sf_dir):
    """UDF policy as a test (SCALE.md global posture): every oracle-
    backed query plans WITHOUT Python-eval nodes except the explicitly
    sanctioned vectorized paths (similarity kernels, multimodal
    featurizers, the pandas UDAF, the UDTF).  Catches any accidental
    slide into row-at-a-time Python on the relational/CDC surface."""
    from cdc_extractor_spark.queries import ORACLES, QUERIES

    SANCTIONED = (
        "cosine", "ann_", "multimodal", "udaf", "udtf", "neardup",
        "dedup_fuzzy", "semantic_dedup",  # dot_pudf vectorized kernel
        # compositions whose Python hop IS the sanctioned topk_cosine
        # block kernel (same as ann_recall_report under "ann_")
        "matryoshka_recall", "rrf_hybrid",
        # Gram-partial mapInPandas kernel (UDF policy class (a))
        "power_iteration",
        # ride the sanctioned topk_cosine block kernel
        "knn_label", "knn_vote",
        # rides the sanctioned nearest-centroid routing kernel
        # (ivf_cell_assignments' dot_pudf — same class as
        # semantic_dedup; ann_cell_occupancy is covered by "ann_")
        "cluster_signature",
    )
    PYTHON_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                    "PythonMapInArrow", "FlatMapGroupsInPandas")
    # artifact-writing queries execute work at build time; plan checks
    # on the pure ones cover the policy
    SKIP = ("sink", "source_", "compact", "zorder", "range_clustered",
            "partitioned_sink", "streaming", "sketch_mergeable")
    offenders = []
    for name in sorted(ORACLES):
        if any(t in name for t in SANCTIONED) or any(t in name for t in SKIP):
            continue
        plan = plan_of(QUERIES[name](spark, sf_dir))
        if any(node in plan for node in PYTHON_NODES):
            offenders.append(name)
    assert offenders == []


def test_zorder_quantile_normalizer_handles_skew(spark, sf_dir, tmp_path):
    """Quantile-normalized Z-order must give BOTH dimensions file-level
    locality even when one domain is heavily skewed (squared event_id:
    min/max scaling would crush most rows into the low cells)."""
    from cdc_extractor_spark import sinks

    ev = load_table(spark, sf_dir, "events").withColumn(
        "skewed", F.col("event_id") * F.col("event_id")
    )
    out = str(tmp_path / "zq")
    sinks.write_zorder_clustered(
        ev, out, "user_id", "skewed", n_partitions=8, normalizer="quantile"
    )
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    n_files = back.select(F.input_file_name()).distinct().count()
    assert n_files >= 4

    def touched(pred):
        return back.where(pred).select(
            F.input_file_name().alias("f")).distinct().count()

    total = ev.count()
    # low-quantile slice of the skewed dim AND a narrow user slice each
    # touch a strict subset of files
    t_user = touched(F.col("user_id") <= 1)
    t_skew = touched(F.col("skewed") <= (total // 8) ** 2)
    assert t_user < n_files
    assert t_skew < n_files


def test_prefix_sum_quantile_buckets_bounded_under_skew(spark, sf_dir):
    """The shared two-pass prefix-sum bucketing (orderby_commit_ts,
    staleness running mean, token-shard packing) derives its boundaries
    from approxQuantile: on a heavily skewed order key (squared
    event_id — uniform value spans would land ~94 % of rows in bucket
    0 and recreate the single hot sort task) the largest bucket's
    population share must stay bounded near 1/n."""
    from cdc_extractor_spark.partitioning import quantile_bucket

    n = 32
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") * F.col("event_id")).alias("skewed")
    )
    b = quantile_bucket(ev, "skewed", n)
    counts = [
        r["n"]
        for r in ev.select(b.alias("_b")).groupBy("_b")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(counts) / sum(counts) <= 3.0 / n
    assert len(counts) >= n // 2
    # empty input keeps the callers' empty path
    assert quantile_bucket(ev.where(F.lit(False)), "skewed", n) is None


def test_decontamination_join_is_hash_partitioned_not_cartesian(spark, sf_dir):
    """The shingle-membership probe must be a hash join on the shingle
    key (either side may shuffle) — never a nested-loop/cartesian, and
    never a broadcast of the unbounded TRAIN side."""
    from cdc_extractor_spark.functions import text

    df = text.decontamination_overlap(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        # AQE may legitimately demote to broadcast at fixture scale —
        # accept it only as the AQE-planned form, not a static choice
        "BroadcastHashJoin" in plan
    )


def test_content_chunking_windows_partition_by_document(spark, sf_dir):
    """The chunk-id running sum must be a per-document window —
    thousands of independent partitions — not a global ordered window."""
    from cdc_extractor_spark.functions import text

    df = text.content_defined_chunks(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(doc_id" in plan


def test_pii_redaction_is_single_codegen_map(spark, sf_dir):
    """PII scrubbing is a narrow per-row map: no shuffle at all, one
    codegen stage over the scan."""
    from cdc_extractor_spark.functions import text

    df = text.pii_redaction(load_table(spark, sf_dir, "documents"))
    plan = plan_of(df)
    assert "Exchange" not in plan


def test_lateral_join_decorrelates_to_window_join(spark, sf_dir):
    """The correlated LATERAL (top-2 orders per customer) must
    decorrelate into ONE join plus a row_number filter — never an
    execute-subquery-per-outer-row nested loop or a cartesian."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["lateral_join_top_orders"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "row_number" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") >= 1


def test_bucketed_join_revenue_query_no_join_shuffle(spark, sf_dir):
    """The registry form (maintenance.bucketed_join_revenue over
    fixture-keyed EXTERNAL bucketed tables) joins without any exchange
    below the aggregation: the only shuffle in the plan is the final
    group-by on the handful of priority keys."""
    from cdc_extractor_spark.operators import maintenance

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = maintenance.bucketed_join_revenue(spark, sf_dir)
        df.collect()
        plan = plan_of(df).split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # exactly one exchange: the post-join aggregation
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange hashpartitioning(o_orderpriority" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_corpus_shuffle_order_no_global_sort(spark, sf_dir):
    """The deterministic shuffle rank must not plan a single-partition
    global window: the local window partitions by the md5-prefix
    bucket."""
    from cdc_extractor_spark.functions import text as textmod
    from cdc_extractor_spark.io import load_table

    df = textmod.deterministic_shuffle_rank(
        load_table(spark, sf_dir, "documents")
    )
    df.collect()
    plan = plan_of(df)
    assert "Window" in plan
    # the window's required distribution is the bucket hash, never a
    # SinglePartition exchange
    assert "Exchange SinglePartition" not in plan


def test_cbo_join_reorder_contrast(spark, sf_dir):
    """With catalog statistics, CBO rewrites the written-order join
    tree (orders ⋈ customer) ⋈ nation to dimension-first
    (customer ⋈ nation) ⋈ orders; without CBO the written order
    survives.  This pins that the reorder is STATS-driven, not the
    cartesian-avoidance rewrite."""
    from cdc_extractor_spark.operators import maintenance

    names = maintenance.ensure_stats_tables(spark, sf_dir)
    sql = (
        f"SELECT n.n_name, count(*) AS n_orders "
        f"FROM {names['orders']} o "
        f"JOIN {names['customer']} c ON o.o_custkey = c.c_custkey "
        f"JOIN {names['nation']} n ON c.c_nationkey = n.n_nationkey "
        f"GROUP BY n.n_name"
    )

    def join_sig(cbo: str) -> list[str]:
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled"):
            spark.conf.set(k, cbo)
        try:
            opt = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
        finally:
            for k in ("spark.sql.cbo.enabled",
                      "spark.sql.cbo.joinReorder.enabled"):
                spark.conf.set(k, "false")
        return [
            line.split("Join Inner,")[1].strip().split(" ")[0]
            for line in opt.splitlines() if "Join Inner," in line
        ]

    off, on = join_sig("false"), join_sig("true")
    # written order: top join closes the nation dim, inner joins fact
    assert any("n_nationkey" in s or "c_nationkey" in s for s in off[:1])
    # CBO: top join closes the FACT key — dims were joined first
    assert any("o_custkey" in s or "c_custkey" in s for s in on[:1])
    assert off != on


def test_dpp_prunes_fact_partitions_at_runtime(spark, sf_dir):
    """Dynamic partition pruning: the dim-side filter must become a
    runtime subquery on the fact's partition column — the scan's
    PartitionFilters carry a dynamicpruningexpression, so non-matching
    partition directories are never opened."""
    from cdc_extractor_spark.operators import maintenance

    df = maintenance.dpp_pruned_revenue(spark, sf_dir)
    plan = formatted(df)
    assert "dynamicpruningexpression" in plan
    rows = {r["category"]: r for r in df.collect()}
    assert set(rows) == {"engagement"}
    assert rows["engagement"]["n_types"] == 2  # click + view only


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join handling (the engine-side complement of
    the manual salting in operators/skew.py): with one key owning most
    of the build side, the finalized sort-merge join must carry
    skew=true — AQE split the oversized partition into parallel tasks
    instead of funneling it through one reducer."""
    big = spark.range(0, 200_000).select(
        F.when(F.col("id") % 4 != 0, F.lit(0)).otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") % 97).alias("payload"),
    )
    small = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # NOTE: aggregate on a non-join column — a groupBy on the join
        # key right after the join would REQUIRE hashpartitioning(k),
        # and AQE (correctly) refuses to skew-split a shuffle whose
        # output distribution is still needed downstream.
        joined = big.join(small, "k").groupBy("w").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("p")
        )
        joined.collect()
        plan = plan_of(joined).split("== Initial Plan ==")[0]
        assert "SortMergeJoin(skew=true)" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pagerank_reuses_edge_exchange(spark, sf_dir):
    """The iterative PageRank plan must dedupe the edge-derivation
    subtree across iterations via ReusedExchange — without it, N
    iterations re-run the co-purchase self-join N times."""
    from cdc_extractor_spark.operators import graph

    df = graph.pagerank_integer(
        graph.copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    )
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "ReusedExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_copurchase_topn_is_take_ordered(spark, sf_dir):
    """Market-basket top pairs must come from per-partition heaps, not
    a global sort of the full pair-count table."""
    from cdc_extractor_spark.operators import analytics

    df = analytics.copurchase_pairs(load_table(spark, sf_dir, "lineitem"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan


def test_pareto_windows_over_preaggregated_days(spark, sf_dir):
    """The skyline window must run over the per-day min aggregate (a
    calendar-bounded input), then broadcast back to the full order set
    — never a full-input single-partition sort followed by a filter."""
    from cdc_extractor_spark.operators import analytics

    df = analytics.pareto_frontier_orders(load_table(spark, sf_dir, "orders"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    # the pre-aggregation must sit below the window
    assert "BroadcastHashJoin" in plan
    aggs_before_window = plan.count("HashAggregate")
    assert aggs_before_window >= 2  # partial+final day-min


def test_target_encode_single_input_shuffle(spark, sf_dir):
    """Target encoding must shuffle the feed ONCE (per-category
    partials); the global-mean window runs over |categories| rows, so
    a second full-input exchange must not appear."""
    from cdc_extractor_spark.operators import analytics

    df = analytics.target_encode(load_table(spark, sf_dir, "events"))
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    # one exchange for the aggregate, one SinglePartition exchange for
    # the tiny window input — but no more than one hashpartitioning of
    # the raw feed
    assert plan.count("hashpartitioning(event_type") <= 1


def test_interpolation_windows_partition_by_type(spark, sf_dir):
    """Both ignore-nulls windows must partition on event_type — a
    global single-partition window over the dense grid would serialize
    the whole series through one task."""
    from cdc_extractor_spark.operators import analytics

    df = analytics.interpolate_missing_hourly(
        load_table(spark, sf_dir, "events")
    )
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "windowspecdefinition(event_type" in plan


def test_colstats_is_single_scan_single_row(spark, sf_dir):
    """Cross-moments must come from ONE scan + one aggregate — no
    self-joins, no per-pair rescans; the pair table is a stack over
    the single aggregated row."""
    from cdc_extractor_spark.operators import analytics

    df = analytics.colstats_cross_moments(
        load_table(spark, sf_dir, "lineitem")
    )
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_rfm_tiles_avoid_global_window(spark, sf_dir):
    """RFM scoring must never funnel the customer grain through an
    unpartitioned ntile sort (VERDICT r4 #2): every window in the plan
    partitions on the rank bucket and no Exchange SinglePartition
    appears at all (the tile is rank arithmetic, not a window)."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["rfm_customer_segments"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs and all(s.startswith("_b") for s in specs), specs


def test_segment_migration_avoids_global_window(spark, sf_dir):
    """Both half-tiles come from the bucketed two-pass rank: every
    window partitions on _b; the only SinglePartition allowed is the
    1-row min/max bounds aggregate (scalar state), never a Window's
    child."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["customer_segment_migration"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    specs = re.findall(r"windowspecdefinition\(([^,]+), ([^,]+),", plan)
    # joint form: the single window partitions on (half, bucket)
    assert specs and all(
        a.startswith("half") and b.startswith("_b") for a, b in specs
    ), specs
    # SinglePartition may appear only under the scalar bounds agg —
    # assert no Window sits above one in any plan line sequence.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            above = "\n".join(lines[max(0, i - 6):i])
            assert "Window" not in above, above


def test_interval_overlap_join_is_equi_join(spark, sf_dir):
    """The overlap join must plan as a hash/sort-merge EQUI-join on
    (user, cell) — never a theta-join fallback (BroadcastNestedLoop /
    CartesianProduct), which would be the O(n·m) form at 100 TB."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["interval_overlap_pairs"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_record_linkage_is_signature_equi_join(spark, sf_dir):
    """Record linkage must generate candidates from the O(n·4)
    deletion-signature equi-join, never the O(n²) compare the oracle
    states (no nested-loop/cartesian in the plan)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["er_record_linkage"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_collocation_lift_plans_takeordered_and_broadcast(spark, sf_dir):
    """Collocation top-k: per-partition heaps (TakeOrderedAndProject),
    and both unigram-count lookups broadcast (vocabulary-bounded)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["collocation_lift_topk"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_domain_affinity_broadcasts_freq_tables(spark, sf_dir):
    """DSIR scoring: the (now single, round-6 one-pass fix) hashed-
    bucket frequency table is n_buckets-bounded and must broadcast —
    the only shuffles are the doc_id reduction and the lang rollup."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["domain_affinity_select"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_interval_coverage_windows_partition_by_user(spark, sf_dir):
    """The coverage sweep's two windows must both partition on user_id
    (a key whose cardinality grows with the data) and share one
    physical sort — no Exchange SinglePartition anywhere."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["interval_user_coverage"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,#]+)#", plan)
    assert specs and all(s == "user_id" for s in specs), specs


def test_degree_assortativity_equi_joins_only(spark, sf_dir):
    """Degree lookups join back on src/dst keys — never a nested-loop
    or cartesian plan."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["graph_degree_assortativity"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bootstrap_replicates_single_scan_no_explode(spark, sf_dir):
    """All 2R replicate sums must reduce in ONE map-side aggregate over
    ONE scan — no R-fold Generate/explode of the fact table."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["bootstrap_metric_replicates"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "Generate explode" not in plan


def test_quantile_bins_avoid_per_type_window(spark, sf_dir):
    """feature_quantile_bins must never sort a whole event_type (~n/5
    of the table) in one task (VERDICT r5 task #2): every window over
    event volume partitions on (event_type, _b) and no Exchange
    SinglePartition appears."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["feature_quantile_bins"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(event_type#\d+, ([^,]+)", plan)
    assert specs and all(s.startswith("_b") for s in specs), specs


def test_median_order_statistic_avoids_per_type_window(spark, sf_dir):
    """The exact per-type median must come from the bucketed two-pass
    rank (VERDICT r5 task #3): windows partition on (event_type, _b),
    no Exchange SinglePartition."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["median_order_statistic"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(event_type#\d+, ([^,]+)", plan)
    assert specs and all(s.startswith("_b") for s in specs), specs


def test_time_weighted_value_uses_segmented_lead(spark, sf_dir):
    """TWAP's interval construction must be the segmented lead
    (VERDICT r5 task #4): the event-volume window partitions on
    (event_type, _b); the only per-type-alone window is the boundary
    shift over the bucket-grain frame (its order key is _b, never ms);
    no Exchange SinglePartition."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["time_weighted_value"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "SinglePartition" not in plan
    specs = re.findall(r"windowspecdefinition\(event_type#\d+, ([^,]+)", plan)
    # every window's second spec element is the bucket column — either
    # as a partition key (raw-event lead) or as the tiny boundary
    # frame's order key; an unsegmented form would show ms#N here
    assert specs and all(s.startswith("_b") for s in specs), specs


def test_funnel_median_avoids_global_window(spark, sf_dir):
    """The exact-median order statistic must come from the bucketed
    two-pass rank (VERDICT r4 #3): every window in the plan partitions
    on _b and no Window sits above an Exchange SinglePartition."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["funnel_time_to_convert"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs and all(s.startswith("_b") for s in specs), specs
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            above = "\n".join(lines[max(0, i - 6):i])
            assert "Window" not in above, above


def test_log_compaction_windows_share_one_shuffle(spark, sf_dir):
    """The version-rank window and the tombstone kill-flag window both
    partition on (table_name, key) — Catalyst must plan ONE hash
    exchange for the pair, and the watermark join stays a broadcast
    (1-row bounds), never a shuffle."""
    import re

    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["cdc_log_compaction"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    # the watermark join must be a broadcast of the 1-row bounds, not a
    # shuffled join (the prior disjunctive assertion was vacuous: a
    # HashAggregate always exists)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_sql_scalar_udf_inlines_no_python_boundary(spark, sf_dir):
    """A SQL UDF must be expanded into the plan by Catalyst: no Python
    eval node of any kind, the aggregate keeps whole-stage codegen, and
    the UDF names themselves never survive into the physical plan."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["sql_scalar_udf_suite"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    for node in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert node not in plan, node
    assert "*(" in plan  # codegen survived the UDF expansion
    # the function bodies are expanded inline: the physical plan carries
    # the CASE/round arithmetic itself (names may linger as aliases)
    assert "CASE WHEN" in plan and "round(" in plan


def test_hamming_topk_broadcasts_queries_no_corpus_shuffle(spark, sf_dir):
    """The binary-ANN scan must broadcast the tiny query side and
    stream the corpus once: no shuffle below the scoring join, and the
    signature fold stays JVM-side (no Python nodes)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["ann_hamming_topk"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node
    # exactly one hash exchange: the per-query rank window; the corpus
    # itself reaches the join without shuffling
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_bitmap_rollup_scans_once_and_reuses_partials(spark, sf_dir):
    """Both report levels (per-type popcounts and the OR-merged total)
    must consume ONE (type, bucket) partial aggregate: a single parquet
    scan and a ReusedExchange, never a second raw-row pass — the whole
    point of the mergeable-bitmap layout."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["bitmap_distinct_rollup"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert "ReusedExchange" in plan


def test_maxsim_rerank_broadcasts_only_query_bags(spark, sf_dir):
    """The rerank ladder's broadcast side must be the n_queries rows —
    the vec_id < 5 filter must reach the scan under the broadcast, and
    no Python node may appear (the whole stage is JVM HOFs)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["ann_maxsim_rerank"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "LessThan(vec_id,5)" in plan  # query-side pushdown survived
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, node


def test_setsim_prefix_join_no_cartesian(spark, sf_dir):
    """The prefix-filter set-similarity join must stay all-equi-join:
    candidate generation joins prefixes on the shared token and the
    verify stage joins candidates back on (order, part) — never a
    cartesian/nested-loop, and no ordered window over anything wider
    than a basket (the per-order row_number sorts inside the hash
    partition, no global Sort node with SinglePartition)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["setsim_prefix_filter_pairs"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_power_iteration_gram_is_single_arrow_kernel(spark, sf_dir):
    """embedding_power_iteration: the data-sized Gram kernel runs
    EXACTLY once — C (≤64×64 rows) is localCheckpoint-pinned right
    after the aggregate (ADVICE r6: v0 + every iteration re-reference
    the subtree, so without truncation the corpus could cross Arrow
    3-4× per run).  The returned plan must therefore show NO
    MapInPandas at all (lineage truncated at the checkpointed C scan);
    iterations ride on broadcast 64-row vectors.  No cartesian, no
    row-at-a-time Python."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["embedding_power_iteration"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan  # truncated at the pinned C
    assert "ExistingRDD" in plan  # the checkpointed C scan
    for node in ("BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, node


def test_fk_orphan_audit_broadcasts_dims(spark, sf_dir):
    """fk_orphan_audit: dimension parents (nation, region, supplier,
    part, customer) ride broadcast joins; no cartesian anywhere."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["fk_orphan_audit"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_order_inversion_audit_no_single_partition_sort(spark, sf_dir):
    """The running high-water mark must come from the segmented
    two-pass form: per-(table, bucket) windows plus a bucket-grain
    boundary exchange — never an Exchange SinglePartition or a
    per-table-only ordered window over raw change rows."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["cdc_order_inversion_audit"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_setcontain_prefix_filter_is_equijoin_only(spark, sf_dir):
    """Containment join (r7): the candidate stage joins the SMALLER
    side's prefix tokens against the full token relation — every join
    an equi-join, no cartesian, no single-partition funnel (the same
    contract as its symmetric sibling setsim_prefix_filter_pairs)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["setcontain_prefix_filter_pairs"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_vocab_growth_curve_no_inequality_join(spark, sf_dir):
    """Heaps curve (r7): the Spark plan must realize the oracle's
    inequality-join semantics as pure arithmetic bucketing — the only
    nested-loop is the broadcast of the 1-row max(doc_id) aggregate
    (the sanctioned 1-row crossJoin class), never token×checkpoint;
    and no sort-merge join anywhere (the checkpoint grid is 8 rows,
    every real join must broadcast)."""
    from cdc_extractor_spark.queries import QUERIES

    df = QUERIES["vocab_growth_curve"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # the 1-row max(doc_id) broadcast appears once per consuming arm
    # (3 aggregate arms + the grid) — bounded by plan shape, not data
    assert plan.count("BroadcastNestedLoopJoin") <= 4


def test_cluster_balanced_selection_broadcasts_quotas(spark, sf_dir):
    """Round 8: the per-cell quota relation (|cells| rows) must come
    back as a broadcast — a shuffle join against cluster metadata
    would serialize the selection on a 100 TB corpus — and the ranking
    window must partition by label (never a global sort)."""
    from cdc_extractor_spark.functions import similarity

    df = similarity.cluster_balanced_selection(
        load_table(spark, sf_dir, "embeddings")
    )
    df.collect()
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only window partitions by label
    assert "windowspecdefinition(label" in plan


def test_ivf_index_merge_no_expand_no_join(spark, sf_dir):
    """Round 8: partial-merge maintenance is pure aggregation — no
    join anywhere, and no Expand node (count(*) replaced the
    distinct-aggregation form that re-passed the exploded data)."""
    from cdc_extractor_spark.functions import similarity

    df = similarity.ivf_index_merge(
        load_table(spark, sf_dir, "embeddings"), 400
    )
    df.collect()
    plan = plan_of(df)
    assert "Join" not in plan
    assert "Expand" not in plan


def test_split_leakage_audit_no_cartesian(spark, sf_dir):
    """Round 8: the split tagging joins must stay equi-joins on doc_id
    over the LSH pair relation — never a cartesian against the corpus."""
    from cdc_extractor_spark.functions import dedup

    df = dedup.split_leakage_audit(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
