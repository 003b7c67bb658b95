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
