"""Group B CDC operator semantics (SURVEY.md §2 group B)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_extractor_spark.operators import cdc
from cdc_extractor_spark.sources.changes import changes_df, changes_with_row_data


def test_latest_per_key_variants_agree(spark, sf_dir):
    ch = changes_df(spark, sf_dir)
    a = {
        (r.table_name, r.key): (r.last_event_id, r.last_action, r.last_val_cents)
        for r in cdc.latest_per_key(ch).collect()
    }
    b = {
        (r.table_name, r.key): (r.event_id, r.action, r.val_cents)
        for r in cdc.latest_per_key_window(ch).collect()
    }
    assert a == b


def test_apply_deletes_drops_exactly_deleted_keys(spark, sf_dir):
    ch = changes_df(spark, sf_dir)
    latest = cdc.latest_per_key(ch).collect()
    state = cdc.apply_deletes(ch).collect()
    deleted = {(r.table_name, r.key) for r in latest if r.last_action == "D"}
    kept = {(r.table_name, r.key) for r in state}
    assert deleted and kept
    assert not (deleted & kept)
    assert len(kept) + len(deleted) == len(latest)
    # construction rule: customer keys k%4==3 end deleted, orders k%3==2
    for tn, k in deleted:
        assert (tn == "customer" and k % 4 == 3) or (tn == "orders" and k % 3 == 2)


def test_changes_event_ids_unique_and_commit_monotone(spark, sf_dir):
    ch = changes_df(spark, sf_dir)
    n = ch.count()
    assert ch.select("event_id").distinct().count() == n
    # commit_ts monotone in event_id within each table stream
    bad = ch.filter(
        F.col("commit_ts_ms")
        != 1_704_067_200_000 + F.expr("event_id div 3") * 1000
    ).count()
    assert bad == 0


def test_row_data_map_shape(spark, sf_dir):
    ch = changes_with_row_data(spark, sf_dir)
    row = ch.filter(F.col("action") == "U").first()
    assert row.row_data["key"] == str(row.key)
    assert row.changed_fields["val_cents"] == str(row.val_cents)
    ins = ch.filter(F.col("action") == "I").first()
    assert ins.changed_fields is None

def test_scd2_versions_tile_key_history(spark, sf_dir):
    """Per key: version numbers are 1..n, exactly one open interval,
    intervals chain (valid_to of v_i == valid_from of v_{i+1}), and the
    open version is current iff it isn't a delete tombstone."""
    hist = cdc.scd2_history(changes_df(spark, sf_dir)).collect()
    by_key: dict = {}
    for r in hist:
        by_key.setdefault((r.table_name, r.key), []).append(r)
    for (tn, k), rows in by_key.items():
        rows.sort(key=lambda r: r.version_no)
        assert [r.version_no for r in rows] == list(range(1, len(rows) + 1))
        open_rows = [r for r in rows if r.valid_to_ms is None]
        assert len(open_rows) == 1 and open_rows[0] is rows[-1]
        for prev, nxt in zip(rows, rows[1:]):
            assert prev.valid_to_ms == nxt.valid_from_ms
        assert rows[-1].is_current == (rows[-1].action != "D")


def test_scd2_current_matches_apply_deletes(spark, sf_dir):
    ch = changes_df(spark, sf_dir)
    current = {
        (r.table_name, r.key): r.val_cents
        for r in cdc.scd2_history(ch).collect()
        if r.is_current
    }
    state = {
        (r.table_name, r.key): r.last_val_cents
        for r in cdc.apply_deletes(ch).collect()
    }
    assert current == state


def test_snapshot_asof_is_replay_prefix(spark, sf_dir):
    """As-of T equals applying only the changes with commit_ts <= T;
    an as-of beyond the last commit equals the full current state."""
    from cdc_extractor_spark.queries import ASOF_MS

    ch = changes_df(spark, sf_dir)
    snap = cdc.snapshot_asof(ch, ASOF_MS)
    # nothing in the snapshot postdates the cut
    assert snap.filter(F.col("last_commit_ts_ms") > ASOF_MS).count() == 0
    # the cut is strictly mid-stream: both sides non-empty
    assert 0 < snap.count() < cdc.latest_per_key(ch).count()
    end_ms = ch.agg(F.max("commit_ts_ms")).collect()[0][0]
    full = cdc.snapshot_asof(ch, end_ms)
    want = cdc.apply_deletes(ch)
    assert full.exceptAll(want).count() == 0 and want.exceptAll(full).count() == 0


def test_gap_summary_accounts_for_all_missing_ids(spark, sf_dir):
    """n_missing_ids per table must equal (span size − present count):
    every id in (min, max] is either present or inside a counted gap."""
    ch = changes_df(spark, sf_dir)
    stats = {
        r.table_name: r
        for r in ch.groupBy("table_name")
        .agg(
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in cdc.offset_gap_summary(ch).collect():
        s = stats[r.table_name]
        assert r.n_missing_ids == (s.hi - s.lo + 1) - s.n
        assert (r.n_gaps == 0) == (r.n_missing_ids == 0)
        assert r.max_gap_len <= r.n_missing_ids


def test_net_change_summary_consistent_with_state(spark, sf_dir):
    """net_rows (I − D) must equal the reconstructed live row count,
    because the fixture inserts every key exactly once and deletes are
    always the key's final action."""
    ch = changes_df(spark, sf_dir)
    live = cdc.apply_deletes(ch).groupBy("table_name").count()
    live_by_table = {r.table_name: r["count"] for r in live.collect()}
    for r in cdc.net_change_summary(ch).collect():
        assert r.n_inserts == r.n_keys  # one insert per key
        assert r.net_rows == live_by_table[r.table_name]
        assert r.first_commit_ms <= r.last_commit_ms


def test_version_deltas_only_updates_with_prior_version(spark, sf_dir):
    """Every delta row is an update, its prev value exists (an update
    never opens a key), and delta == val − prev; fixture arithmetic
    (val_cents = base + seq along the cycle) makes consecutive-version
    deltas exactly 1."""
    ch = changes_df(spark, sf_dir)
    deltas = cdc.version_deltas(ch)
    assert deltas.filter(F.col("prev_val_cents").isNull()).count() == 0
    bad = deltas.filter(
        F.col("delta_cents") != F.col("val_cents") - F.col("prev_val_cents")
    ).count()
    assert bad == 0
    assert deltas.filter(F.col("delta_cents") != 1).count() == 0
    n_updates = ch.filter(F.col("action") == "U").count()
    assert deltas.count() == n_updates


def test_log_compaction_semantics(spark):
    """Compaction keeps exactly the newest N versions per key, drops
    only pre-watermark tombstones, and never invents rows."""
    import datetime as _dt  # noqa: F401

    from pyspark.sql import functions as F

    from cdc_extractor_spark.operators import cdc

    rows = [
        # key 1: three versions; oldest (I) must be dropped at N=2
        (1, "t", 1, 1_000, "I", 1, 10),
        (2, "t", 2, 2_000, "U", 1, 11),
        (3, "t", 3, 3_000, "U", 1, 12),
        # key 2: latest is an OLD tombstone -> GC'd entirely at cutoff
        (4, "t", 4, 1_000, "I", 2, 20),
        (5, "t", 5, 2_000, "D", 2, 0),
        # key 3: latest is a FRESH tombstone -> kept
        (6, "t", 6, 99_000, "I", 3, 30),
        (7, "t", 7, 100_000, "D", 3, 0),
    ]
    ch = spark.createDataFrame(
        rows,
        "event_id long, table_name string, transaction_id long, "
        "commit_ts_ms long, action string, key long, val_cents long",
    )
    # max ts = 100_000, retention 30_000 -> cutoff 70_000
    out = {
        (r["key"], r["event_id"]): r["version_rank"]
        for r in cdc.log_compaction(ch, 2, 30_000).collect()
    }
    assert out == {
        (1, 3): 1, (1, 2): 2,          # newest two versions of key 1
        # key 2 vanishes ENTIRELY: its newest version is an expired
        # tombstone — keeping the older I would resurrect a deleted key
        (3, 7): 1, (3, 6): 2,          # fresh tombstone retained
    }
    # conservation: compaction output is a subset of the input rows
    ids = {eid for (_, eid) in out}
    assert ids <= {r[0] for r in rows}
