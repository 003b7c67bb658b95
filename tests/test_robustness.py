"""Robustness: sketch accuracy envelopes and empty-input behavior.

The reference crashes on an empty task (``Collections.max`` of an empty
map → NoSuchElementException, WorkerRunnable.java:145 — SURVEY.md §5.2);
every operator here must instead return a well-formed empty (or
null-carrying) result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_extractor_spark.functions import sketches
from cdc_extractor_spark.io import load_table
from cdc_extractor_spark.operators import analytics, cdc, changelog, relational


def test_sketch_cardinality_error_envelope(spark, sf_dir):
    res = sketches.sketch_user_cardinality(
        load_table(spark, sf_dir, "events")
    ).collect()
    assert res
    for r in res:
        # HLL++ at rsd=0.02: generous 5% acceptance band
        assert r["rel_err_bp"] <= 500, (r["event_type"], r["rel_err_bp"])


def test_sketch_quantiles_ordered_and_bounded(spark, sf_dir):
    res = sketches.sketch_value_quantiles(
        load_table(spark, sf_dir, "events")
    ).collect()
    for r in res:
        p50, p90, p99 = r["quantiles"]
        assert r["min_value"] <= p50 <= p90 <= p99 <= r["max_value"]


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.fixture(scope="module")
def empty_changes(spark):
    return spark.createDataFrame(
        [],
        "event_id long, table_name string, transaction_id long, "
        "commit_ts_ms long, action string, key long, val_cents long",
    )


def test_empty_batch_aggregates_yield_null_row(empty_events):
    # the reference threw here; we return one row of nulls/zero
    row = changelog.agg_max_offset(empty_events).collect()
    assert len(row) == 1
    assert row[0]["max_event_id"] is None
    assert row[0]["n_events"] == 0
    wm = changelog.watermark_max_commit_ts(empty_events).first()
    assert wm["uptodate_ms"] is None and wm["n_events"] == 0


def test_empty_batch_rowwise_operators_yield_empty(empty_events, empty_changes):
    assert changelog.filter_offset_range(empty_events, 0, 10).count() == 0
    assert changelog.distinct_keys(empty_events).count() == 0
    assert changelog.window_tumbling_1min(empty_events).count() == 0
    assert cdc.latest_per_key(empty_changes).count() == 0
    assert cdc.apply_deletes(empty_changes).count() == 0
    assert analytics.sessionize(empty_events).count() == 0
    assert relational.range_join_prior_events(empty_events).count() == 0


def test_salted_agg_identical_to_direct(spark, sf_dir):
    from cdc_extractor_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    salted = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("sum", F.count(F.lit(1))),
            "max_id": ("max", F.max("event_id")),
            "cents": ("sum", F.sum(F.round(F.col("value") * 100).cast("long"))),
        },
        n_salts=8,
    )
    direct = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("event_id").alias("max_id"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_empty_side_joins(spark, sf_dir, empty_events):
    customer = load_table(spark, sf_dir, "customer")
    # empty probe side: joins must produce empty, not fail
    assert changelog.join_lookup_commit_ts(empty_events, customer).count() == 0
    orders = load_table(spark, sf_dir, "orders")
    assert relational.asof_join_latest_order(empty_events, orders).count() == 0
    # empty build side: every event survives the left as-of with nulls
    empty_orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    events = load_table(spark, sf_dir, "events").limit(50)
    res = relational.asof_join_latest_order(events, empty_orders)
    assert res.count() == 50
    assert res.filter(F.col("last_orderkey").isNotNull()).count() == 0


def test_decision_support_empty_inputs(spark, sf_dir):
    """Every decision-support shape returns a well-formed result when
    the fact table is empty (scalar subqueries over empty aggregates,
    window minima over nothing, anti joins against nothing)."""
    from cdc_extractor_spark.operators import decision_support as ds

    li = load_table(spark, sf_dir, "lineitem").limit(0)
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    assert ds.min_acctbal_supplier_per_part(li, part, sup).count() == 0
    assert ds.important_parts(li, part).count() == 0
    assert ds.top_supplier(li, sup).count() == 0
    assert ds.waiting_suppliers(li, orders, sup).count() == 0
    assert ds.excess_quantity_suppliers(li, sup).count() == 0
    # Q13 keeps every customer even with zero orders: one c_count=0 bin
    dist = ds.customer_order_distribution(cust, orders.limit(0)).collect()
    assert len(dist) == 1 and dist[0]["c_count"] == 0


def test_gapfill_empty_and_single_bucket(spark):
    from cdc_extractor_spark.operators import analytics

    schema = ("event_id LONG, ts TIMESTAMP, user_id LONG, "
              "event_type STRING, value DOUBLE, props STRING")
    empty = spark.createDataFrame([], schema)
    assert analytics.gapfill_hourly_rollup(empty).count() == 0
    one = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 7, "click", 2.5, "{}")],
        schema,
    )
    rows = analytics.gapfill_hourly_rollup(one).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 1
    assert rows[0]["ffill_cents"] == 250


def test_mergeable_hll_error_envelope(spark, sf_dir):
    """Union-of-daily-sketches estimate within 5% of the exact count
    (HLL_4 default lgK=12 is ~1.6% rsd; generous band for small sets)."""
    res = sketches.mergeable_daily_hll(
        load_table(spark, sf_dir, "events")
    ).collect()
    assert res
    for r in res:
        assert r["rel_err_bp"] <= 500, (r["event_type"], r["rel_err_bp"])


def test_partitioning_invariance(spark, sf_dir):
    """Results must be invariant to the shuffle-partition count — the
    property that makes sf0.01 oracle matches transfer to a
    1000-executor layout.  Integer-exact aggregates are associative by
    construction; this pins it empirically for representative shapes
    (wide agg, composite pipeline, salted agg, split join, CDC
    snapshot)."""
    from cdc_extractor_spark.queries import QUERIES

    names = (
        "pricing_summary", "corpus_prep_pipeline", "salted_skew_agg",
        "skew_split_join_revenue", "cdc_latest_per_key",
    )
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    try:
        results = {}
        for n in ("3", old):
            spark.conf.set(key, n)
            results[n] = {
                name: sorted(
                    (tuple(r) for r in QUERIES[name](spark, sf_dir).collect()),
                    key=repr,
                )
                for name in names
            }
    finally:
        spark.conf.set(key, old)
    for name in names:
        assert results["3"][name] == results[old][name], name


@pytest.mark.parametrize("hot_fraction", [0.0, 0.001, 0.05, 1.0])
def test_skew_split_join_identity(spark, sf_dir, hot_fraction):
    """The hot/cold decomposition equals the plain join at every
    threshold — including the edges (0.0: every key broadcast; 1.0:
    no key hot unless one key owns the table)."""
    from cdc_extractor_spark.operators.skew import skew_split_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    split = skew_split_join(orders, cust, "o_custkey", hot_fraction)
    plain = orders.join(cust, "o_custkey")
    assert sorted(map(repr, split.collect())) == sorted(
        map(repr, plain.collect()))


def test_compaction_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    """compact_parquet must cut the file count to the byte-targeted
    number and keep every row bit-identical (same multiset of rows)."""
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import maintenance

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "compacted")
    ev.repartition(32).write.parquet(frag)

    before, target = maintenance.compact_parquet(
        spark, frag, dst, target_bytes=64 << 20
    )
    after = len(maintenance.list_data_files(spark, dst))
    assert before == 32
    assert after == target == 1
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, ev.collect())
    )


def test_incremental_rollup_merge_edge_splits(spark, sf_dir):
    """Merge ≡ recompute at degenerate splits: all-in-base (empty
    delta) and all-in-delta (empty base) both equal the direct rollup."""
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import maintenance

    ev = load_table(spark, sf_dir, "events")
    direct = sorted(map(tuple, maintenance.rollup_partials(ev).collect()))
    hwm = ev.agg(F.max("event_id")).first()[0]
    for split in (-1, hwm):
        merged = maintenance.incremental_rollup(ev, split)
        assert sorted(map(tuple, merged.collect())) == direct


def test_fingerprint_invariant_to_layout_sensitive_to_content(spark, sf_dir):
    """The content fingerprint must be identical across partitionings
    and row orders (commutative sum), and must change when any single
    row's content changes (anti-entropy usefulness)."""
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import quality

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_cents", F.round(F.col("value") * 100).cast("long")
    )
    cols = ["event_id", "user_id", "value_cents"]
    base = {
        r["event_type"]: (r["fingerprint"], r["n_rows"])
        for r in quality.content_fingerprint(ev, cols, "event_type").collect()
    }
    shuffled = quality.content_fingerprint(
        ev.repartition(17, "user_id"), cols, "event_type"
    )
    assert {
        r["event_type"]: (r["fingerprint"], r["n_rows"])
        for r in shuffled.collect()
    } == base

    tampered = ev.withColumn(
        "value_cents",
        F.when(F.col("event_id") == 7, F.col("value_cents") + 1).otherwise(
            F.col("value_cents")
        ),
    )
    t = {
        r["event_type"]: r["fingerprint"]
        for r in quality.content_fingerprint(tampered, cols, "event_type").collect()
    }
    changed = [k for k in base if t[k] != base[k][0]]
    assert len(changed) == 1  # exactly the tampered row's group moved


def test_constraint_audit_empty_input(spark, sf_dir, empty_events):
    """Zero rows → zero violations for every constraint, not an error
    (the reference crashes on its first empty batch, SURVEY.md §5.2(5))."""
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import quality

    out = quality.constraint_audit(
        empty_events, load_table(spark, sf_dir, "customer")
    ).collect()
    assert {r["constraint_name"]: r["n_violations"] for r in out} == {
        "null_user_id": 0,
        "value_out_of_range": 0,
        "duplicate_event_id": 0,
        "orphan_user_id": 0,
    }


def test_corrupt_parquet_file_skipped_when_tolerated(spark, sf_dir, tmp_path):
    """A garbage file inside a parquet directory must fail the read by
    default (silent data loss is worse than an error) and be skipped —
    yielding every good row — under spark.sql.files.ignoreCorruptFiles."""
    import pytest as _pytest

    from cdc_extractor_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    out = str(tmp_path / "mixed")
    ev.coalesce(2).write.parquet(out)
    with open(out + "/part-junk.parquet", "wb") as f:
        f.write(b"PAR1 this is not a parquet file")

    key = "spark.sql.files.ignoreCorruptFiles"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        with _pytest.raises(Exception):
            spark.read.parquet(out).count()
        spark.conf.set(key, "true")
        assert spark.read.parquet(out).count() == ev.count()
    finally:
        spark.conf.set(key, old)


def test_compaction_can_recluster(spark, sf_dir, tmp_path):
    """compact_parquet(cluster_key=...) must leave each output file a
    narrow, disjoint key slice (re-clustering while compacting), with
    rows preserved exactly."""
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import maintenance

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "reclustered")
    ev.repartition(16).write.parquet(frag)
    maintenance.compact_parquet(
        spark, frag, dst, target_bytes=4 << 10, cluster_key="event_id"
    )
    back = spark.read.parquet(dst)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi"))
        .collect()
    )
    ranges = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(ranges) >= 2
    for (_, hi_prev), (lo, _) in zip(ranges, ranges[1:]):
        assert lo > hi_prev
    assert back.count() == ev.count()


def test_batch_observation_metrics_no_second_pass(spark, sf_dir):
    """Batch df.observe(Observation): row-count/max-offset metrics ride
    along with the action that materializes the extract — the batch
    form of the streaming observe() staleness metric (A12), no second
    scan.  Values must equal an independent aggregation."""
    from pyspark.sql import Observation

    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import changelog

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("extract_metrics")
    filtered = changelog.filter_offset_range(ev, 100, 5000).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.max("event_id").alias("max_offset"),
    )
    n_materialized = filtered.count()  # the one and only pass
    want = (
        changelog.filter_offset_range(ev, 100, 5000)
        .agg(F.count(F.lit(1)), F.max("event_id"))
        .first()
    )
    assert obs.get["n_rows"] == n_materialized == want[0]
    assert obs.get["max_offset"] == want[1]


def test_cms_heavy_hitters_envelope_and_topk(spark, sf_dir):
    """CMS estimates never under-count, and at ε=0.001 the reported
    top-10 equals the exact top-10 (same tie-break: count desc, key)."""
    from cdc_extractor_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    rows = sketches.cms_heavy_hitters(ev).collect()
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    for r in rows:
        assert r.exact_count == exact[r.user_id]
        assert r.est_count >= r.exact_count
        assert r.est_count <= r.exact_count + max(1, int(0.001 * n_total) + 1)
    want_top = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:10]
    got_top = sorted(
        ((r.user_id, r.exact_count) for r in rows), key=lambda t: (-t[1], t[0])
    )
    assert got_top == want_top


def test_staleness_lag_null_ts_matches_avg_semantics(spark):
    """Rows with NULL ts must be excluded from both numerator and
    denominator of the running mean (SQL avg() semantics), and a
    leading all-NULL prefix yields NULL, not a crash or a diluted
    average."""
    from datetime import datetime

    from cdc_extractor_spark.operators import changelog

    rows = [
        (1, None),
        (2, None),
        (3, datetime(2024, 1, 31, 23, 59, 0)),
        (4, None),
        (5, datetime(2024, 1, 31, 23, 58, 0)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    got = {
        r["event_id"]: (r["staleness_ms"], r["running_avg_ms"])
        for r in changelog.staleness_lag(ev, n_partitions=2).collect()
    }
    m1, m2 = 60_000, 120_000  # staleness of the two non-null samples
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[3] == (m1, m1)
    assert got[4] == (None, m1)  # null row: avg carries, count frozen
    assert got[5] == (m2, (m1 + m2) // 2)


def test_cms_heavy_hitters_empty_input(spark, sf_dir):
    """Zero rows → null sketch blob from the aggregate; must come back
    as an empty frame with the declared schema, not a TypeError (the
    reference's own empty-batch crash class, SURVEY.md §2 bug list)."""
    from cdc_extractor_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").where(F.lit(False))
    out = sketches.cms_heavy_hitters(ev)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "user_id", "exact_count", "est_count"]


def test_maintenance_degenerate_inputs(spark, sf_dir, tmp_path):
    """Z-order on a constant column (zero key span) and compaction of a
    single tiny file must both behave, not divide-by-zero or explode."""
    from cdc_extractor_spark import sinks
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import maintenance

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    const = ev.withColumn("c", F.lit(7))
    zdir = str(tmp_path / "zconst")
    sinks.write_zorder_clustered(const, zdir, "c", "event_id", n_partitions=4)
    assert spark.read.parquet(zdir).count() == ev.count()

    one = str(tmp_path / "one")
    dst = str(tmp_path / "one_out")
    ev.coalesce(1).write.parquet(one)
    before, target = maintenance.compact_parquet(spark, one, dst)
    assert before == 1 and target == 1
    assert spark.read.parquet(dst).count() == ev.count()


def test_queries_md_matches_registry():
    """QUERIES.md is judge-facing inventory — its headline counts and
    per-query rows must track the registry exactly (no doc rot)."""
    import re

    from cdc_extractor_spark.queries import ORACLES, QUERIES

    md = open("QUERIES.md").read()
    m = re.search(r"(\d+) queries in `__spark_entry__\.queries\(\)`; "
                  r"(\d+) carry a DuckDB oracle", md)
    assert m, "QUERIES.md headline missing"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)
    missing = [n for n in QUERIES if f"| {n} " not in md]
    assert missing == [], f"queries undocumented in QUERIES.md: {missing}"


def test_all_oracled_outputs_are_driver_hashable(spark, sf_dir):
    """The driver's pandas value-hasher cannot hash nested cells
    (CORRECTNESS_r01: `unhashable type: 'list'` killed A8 despite
    correct values).  Guard the whole registry: every oracle-backed
    query's output schema must be scalar-only — arrays/maps/structs
    must be stringified or unpacked at the output boundary."""
    from cdc_extractor_spark.queries import ORACLES, QUERIES

    offenders = []
    for name in sorted(ORACLES):
        df = QUERIES[name](spark, sf_dir)
        for f in df.schema.fields:
            if f.dataType.typeName() in ("array", "map", "struct"):
                offenders.append((name, f.name, f.dataType.typeName()))
    assert offenders == [], offenders


# --------------------------------------------------------------------------
# Round-5 families: empty-input behavior (the reference crashes on an
# empty task — every operator here must return a well-formed empty)
# --------------------------------------------------------------------------


def test_empty_anomaly_family_yields_empty(spark, empty_events):
    from cdc_extractor_spark.operators import analytics

    for fn in (
        analytics.rolling_zscore_anomalies,
        analytics.cusum_drift,
        analytics.ewma_hourly,
        analytics.seasonal_baseline_residuals,
    ):
        out = fn(empty_events)
        assert out.count() == 0, fn.__name__
        assert len(out.schema) >= 3


def test_empty_orders_split_and_tiles(spark):
    from cdc_extractor_spark.operators import analytics

    empty_orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    assert analytics.walk_forward_split(empty_orders).count() == 0
    assert analytics.walk_forward_split(empty_orders, cut_day=9000).count() == 0
    assert analytics.rfm_segments(empty_orders).count() == 0
    assert analytics.segment_migration(empty_orders).count() == 0


def test_empty_documents_text_family(spark):
    from cdc_extractor_spark.functions import text

    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert text.doc_rarity_scores(empty_docs).count() == 0
    assert text.topk_terms_per_lang(empty_docs).count() == 0
    assert text.rendezvous_shard_assignment(empty_docs).count() == 0


def test_empty_edges_bfs(spark):
    from cdc_extractor_spark.operators import graph

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert graph.bfs_k_hop(empty_edges).count() == 0


def test_rrf_fused_set_is_union_of_both_lists(spark, sf_dir):
    """RRF conservation: the fused ranking contains exactly the union
    of the two input top-k lists, fused_rank is a 1..n permutation,
    and a doc in both lists outscores the same-rank doc in one."""
    from cdc_extractor_spark.queries import QUERIES

    rows = QUERIES["rrf_hybrid_retrieval"](spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["fused_rank"] for r in rows) == list(range(1, n + 1))
    for r in rows:
        assert r["r_bm25"] is not None or r["r_cos"] is not None
        expect = 0
        if r["r_bm25"] is not None:
            expect += 1_000_000 // (60 + r["r_bm25"])
        if r["r_cos"] is not None:
            expect += 1_000_000 // (60 + r["r_cos"])
        assert r["rrf_micro"] == expect


def test_matryoshka_recall_bounds_and_exact_self_recall(spark, sf_dir):
    """Truncated-dim recall is in [0, 10000] bp for every query; a
    64-of-64 'truncation' (identity) must give recall 10000."""
    from pyspark.sql import functions as F

    from cdc_extractor_spark.functions import similarity
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.queries import QUERIES

    rows = QUERIES["matryoshka_recall_report"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(0 <= r["recall_bp"] <= 10000 for r in rows)
    emb = load_table(spark, sf_dir, "embeddings")
    full = {(r["query_id"], r["neighbor_id"])
            for r in similarity.topk_cosine(emb, 5, 10).collect()}
    ident = {(r["query_id"], r["neighbor_id"])
             for r in similarity.topk_cosine(
                 emb.withColumn("embedding", F.slice("embedding", 1, 64)),
                 5, 10).collect()}
    assert ident == full


def test_cube_subtotals_roll_through(spark, sf_dir):
    """CUBE consistency: each one-dim subtotal equals the sum of its
    detail cells, and the grand total equals the sum of every detail
    cell (n_orders and cents both)."""
    from cdc_extractor_spark.queries import QUERIES

    rows = QUERIES["cube_order_dims"](spark, sf_dir).collect()
    detail = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 0]
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in detail)
    assert grand[0]["total_cents"] == sum(r["total_cents"] for r in detail)
    by_status = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 1]
    for s in by_status:
        cells = [r for r in detail if r["status"] == s["status"]]
        assert s["n_orders"] == sum(r["n_orders"] for r in cells)
        assert s["total_cents"] == sum(r["total_cents"] for r in cells)


def test_lang_confusion_matrix_partitions_corpus(spark, sf_dir):
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.queries import QUERIES

    rows = QUERIES["lang_confusion_matrix"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["is_correct"] == (1 if r["lang"] == r["lang_pred"] else 0)


def test_bucketed_rank_handles_all_null_and_mixed_keys(spark):
    """approxQuantile returns [] for an all-NULL key column as well as
    for an empty frame — the rank helpers must distinguish them: NULL
    keys rank NULLS FIRST (bucket −1), exactly like the window form
    they replace; an empty frame still yields null ranks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_extractor_spark.partitioning import (
        bucketed_global_rank,
        bucketed_global_ranks,
    )

    mixed = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, 1), (5, 5)], "id long, v long"
    )
    got = {
        r["id"]: r["_rank"]
        for r in bucketed_global_rank(mixed, "v", ["id"]).collect()
    }
    want = {
        r["id"]: r["w"]
        for r in mixed.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("w")
        ).collect()
    }
    assert got == want
    allnull = spark.createDataFrame([(1, None), (2, None)], "id long, v long")
    got2 = {
        r["id"]: r["_rank"]
        for r in bucketed_global_rank(allnull, "v", ["id"]).collect()
    }
    assert got2 == {1: 1, 2: 2}
    empty = spark.createDataFrame([], "id long, v long")
    assert all(
        r["_rank"] is None
        for r in bucketed_global_rank(empty, "v", ["id"]).collect()
    )
    # multi-metric: one all-NULL metric must not null the other's ranks
    m = bucketed_global_ranks(mixed, ["v", "id"], ["id"])
    rows = {r["id"]: (r["_rk_v"], r["_rk_id"]) for r in m.collect()}
    assert {k: v[1] for k, v in rows.items()} == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}
    assert {k: v[0] for k, v in rows.items()} == want


def test_bucketed_rank_partition_cols_match_partitioned_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_extractor_spark.partitioning import bucketed_global_rank

    df = spark.createDataFrame(
        [(h, i, (i * 7) % 5) for h in (0, 1) for i in range(40)],
        "half int, id long, v long",
    )
    totals: dict = {}
    got = {
        (r["half"], r["id"]): r["_rank"]
        for r in bucketed_global_rank(
            df, "v", ["id"], partition_cols=["half"], totals_out=totals
        ).collect()
    }
    want = {
        (r["half"], r["id"]): r["w"]
        for r in df.select(
            "half",
            "id",
            F.row_number()
            .over(Window.partitionBy("half").orderBy("v", "id"))
            .alias("w"),
        ).collect()
    }
    assert got == want
    assert totals == {(0,): 40, (1,): 40}


def test_round5_wave_empty_inputs(spark, empty_events):
    """Every round-5 second-wave operator degrades to an empty (or
    empty-but-schema-stable) frame on zero rows instead of raising."""
    from cdc_extractor_spark.functions import dedup, multimodal, similarity, sketches
    from cdc_extractor_spark.operators.analytics import feature_drift_tv

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert feature_drift_tv(empty_events).count() == 0
    assert dedup.exact_substring_dups(empty_docs).count() == 0
    assert similarity.ann_hamming_topk(empty_emb).count() == 0
    assert multimodal.media_phash(empty_docs).count() == 0
    assert multimodal.media_phash_closest(empty_docs).count() == 0
    assert sketches.bitmap_audience_overlap(empty_events).count() == 0
    # the rollup keeps its schema: zero per-type rows and zero or one
    # __all__ row with a zero/NULL-free count
    roll = sketches.bitmap_distinct_rollup(empty_events)
    assert [f.name for f in roll.schema.fields] == [
        "event_type", "n_distinct_users",
    ]
    rows = roll.collect()
    assert [(r["event_type"], r["n_distinct_users"]) for r in rows] == [
        ("__all__", 0)
    ]


def test_bucketed_rank_null_partition_value(spark):
    """A NULL in a partition column must not crash the driver-side
    offset assembly (the bucket keys reach sorted() mixed with None)."""
    from cdc_extractor_spark.partitioning import bucketed_global_rank

    df = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 5), ("a", 3, 7), ("a", 4, 1), (None, 5, 8)],
        "grp string, id long, v long",
    )
    got = {
        (r["grp"], r["id"]): r["w"]
        for r in bucketed_global_rank(
            df, "v", ["id"], out="w", partition_cols=["grp"]
        ).collect()
    }
    # ranks are per-partition (NULL is its own group), dense from 1
    assert got[(None, 2)] == 1 and got[(None, 5)] == 2 and got[(None, 1)] == 3
    assert got[("a", 4)] == 1 and got[("a", 3)] == 2


def test_publish_snapshot_pointer_never_absent(spark, tmp_path):
    """cache.publish_snapshot: the state pointer resolves to a complete
    snapshot after every publish, old versions are GC'd, and
    re-publishing the same version (epoch replay) is harmless."""
    import os

    from cdc_extractor_spark import cache

    link = str(tmp_path / "state")
    v1 = str(tmp_path / "state.v1")
    spark.range(5).write.parquet(v1)
    cache.publish_snapshot(v1, link)
    assert os.path.islink(link)
    assert spark.read.parquet(link).count() == 5

    v2 = str(tmp_path / "state.v2")
    spark.range(9).write.parquet(v2)
    cache.publish_snapshot(v2, link)
    assert spark.read.parquet(link).count() == 9
    assert not os.path.exists(v1)  # superseded version GC'd

    # replayed epoch re-publishes the CURRENT version: must not delete it
    cache.publish_snapshot(v2, link)
    assert spark.read.parquet(link).count() == 9


def test_fingerprint_distinguishes_null_positions(spark):
    """concat_ws silently skips nulls; the sentinel rendering must keep
    (1, NULL, 2) and (1, 2, NULL) distinct and null-full rows hashable."""
    from cdc_extractor_spark.operators import quality

    a = spark.createDataFrame([("g", 1, None, 2)], "g string, x long, y long, z long")
    b = spark.createDataFrame([("g", 1, 2, None)], "g string, x long, y long, z long")
    fa = quality.content_fingerprint(a, ["x", "y", "z"], "g").first()["fingerprint"]
    fb = quality.content_fingerprint(b, ["x", "y", "z"], "g").first()["fingerprint"]
    assert fa != fb


@pytest.fixture(scope="module")
def empty_documents(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def empty_embeddings(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


def test_round8_operators_well_formed_on_empty(
    empty_documents, empty_embeddings
):
    """Round-8 operators must return well-formed empties on empty
    inputs (the reference's empty-task crash class, SURVEY.md §5.2) —
    including the quota path, whose budget-total aggregate is a
    null-carrying 1-row frame that must not poison the crossJoin."""
    from cdc_extractor_spark.functions import dedup, similarity, text

    assert similarity.cluster_balanced_selection(empty_embeddings).count() == 0
    assert similarity.ivf_index_merge(empty_embeddings, 400).count() == 0
    assert dedup.split_leakage_audit(empty_documents).count() == 0
    assert text.dedup_token_savings(empty_documents).count() == 0
    assert text.contamination_by_domain(empty_documents).count() == 0
