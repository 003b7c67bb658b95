"""Determinism under a different physical layout: every query whose
implementation touches partition-sensitive machinery — bucketed global
ranks, hash-derived sampling/sharding, approx_percentile partial-sketch
merging, per-block applyInPandas kernels, salting — must produce the
IDENTICAL relation when ``spark.sql.shuffle.partitions`` changes (here
32 → 7, a count that divides nothing and maximizes residue skew).

This is the third driver-environment axis after reader configs
(test_driver_session.py) and session timezone: a 1000-executor cluster
will not run the fixture's partition count, so any operator whose
output depends on the partitioning is wrong at 100 TB even if it
hash-matches locally.  The comparison is the same DuckDB oracle check
the driver runs.
"""

from __future__ import annotations

import pytest

from tests.oracle_check import compare, duckdb_conn

# Queries that exercise partition-sensitive machinery (ranks computed
# from per-bucket counts, hash sampling, sketch merges, block kernels,
# salting, iterative label propagation).
SENSITIVE = (
    "rfm_customer_segments",
    "customer_segment_migration",
    "funnel_time_to_convert",
    "corpus_shuffle_order",
    "weighted_doc_sample",
    "stratified_sample_docs",
    "mixture_oversample",
    "quota_sample_per_lang",
    "train_val_test_split",
    "walk_forward_split",
    "pack_token_shards",
    "rendezvous_shard_assignment",
    "median_order_statistic",
    "feature_quantile_bins",
    "sketch_value_quantiles",
    "topk_cosine_similarity",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_exact_substrings",
    "ann_hamming_topk",
    "salted_skew_agg",
    "sequence_packing_manifest",
    # iterative/graph tier: label propagation and fixed-iteration
    # integer ranks must not depend on which partition reduces first
    "pagerank_copurchase",
    "bfs_k_hop",
    "copurchase_triangle_stats",
    # round-5 second wave
    "bitmap_distinct_rollup",
    "bitmap_audience_overlap",
    "multimodal_phash_neardup",
    "feature_drift_tv",
    # round 6: segmented-lead TWAP and the partitioned gap audit
    # (boundary stitching must not depend on physical layout)
    "time_weighted_value",
    "cdc_gap_summary_partitioned",
    # round 6: grid-cell emit-once join, signature blocking, top-k
    # tie-breaks, hashed-bucket scoring
    "interval_overlap_pairs",
    "er_record_linkage",
    "collocation_lift_topk",
    "domain_affinity_select",
    "interval_user_coverage",
    "graph_degree_assortativity",
    "er_entity_groups",
    "bootstrap_metric_replicates",
    "dedup_lsh_recall_report",
    # round 6 second wave: segmented running max over quantile buckets,
    # prefix-filter candidate generation, top-10 tie-break boundary,
    # 64x64 Gram partial aggregation
    "cdc_order_inversion_audit",
    "setsim_prefix_filter_pairs",
    "join_key_skew_audit",
    "embedding_power_iteration",
    "text_keyword_rake",
    "knn_label_noise",  # rides the topk_cosine block kernel
    # round 7: containment prefix-filter candidate generation, kNN
    # confusion (block kernel), arithmetic checkpoint bucketing
    "setcontain_prefix_filter_pairs",
    "knn_vote_confusion",
    "vocab_growth_curve",
    # round 8: hash-rank quota selection, partial-merge index
    # maintenance, LSH pair generation under the split tagging
    "cluster_balanced_selection",
    "ann_ivf_index_merge",
    "split_leakage_audit",
    # round 9: bucketed quality ntile + md5 sub-bucket prefix offsets,
    # per-band bucket-size aggregation, per-epoch partial merges
    "curriculum_quality_order",
    "minhash_band_stats",
    "streaming_ivf_maintenance",
    # round 11: minhash-estimate buckets over LSH candidate pairs
    # (sketch-merge family), slim-hash keep-first winner aggregation
    "lsh_jaccard_calibration",
    "corpus_prep_pipeline",
    "training_corpus_manifest",
    # round 12: per-band first-catch attribution over LSH pairs
    # (sketch-merge family) and the components-composed conflict audit
    # (label propagation downstream)
    "lsh_band_calibration",
    "dedup_merge_conflicts",
    # round 13: components-composed size rollup (label propagation
    # downstream, same family as the conflict audit) and the
    # LCG-hash-split leakage rollup (membership family)
    "dedup_cluster_sizes",
    "contamination_by_source",
)


def test_gap_summary_partitioned_matches_global(spark, sf_dir):
    """Exactness of the boundary stitch (VERDICT r5 task #5): the
    per-day partitioned audit must equal the single-window global form
    row-for-row — for EVERY partitioning that is monotone in event_id,
    here both the calendar day and a deliberately lumpy 40-day grain."""
    from pyspark.sql import functions as F

    from cdc_extractor_spark.operators import cdc
    from cdc_extractor_spark.sources.changes import changes_df

    ch = changes_df(spark, sf_dir)
    want = sorted(map(tuple, cdc.offset_gap_summary(ch).collect()))
    for grain_ms in (86_400_000, 40 * 86_400_000):
        part = ch.withColumn("_p", F.expr(f"commit_ts_ms div {grain_ms}"))
        got = sorted(
            map(tuple, cdc.offset_gap_summary(part, "_p").collect())
        )
        assert got == want, (grain_ms, got, want)


@pytest.fixture(scope="module")
def skewed_spark(spark):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    yield spark
    spark.conf.set("spark.sql.shuffle.partitions", saved)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_sensitive_names_are_registered():
    from cdc_extractor_spark.queries import ORACLES, QUERIES

    missing = [n for n in SENSITIVE if n not in QUERIES]
    assert not missing, missing
    unoracled = [n for n in SENSITIVE if n not in ORACLES]
    assert not unoracled, unoracled


@pytest.mark.parametrize("name", SENSITIVE)
def test_query_invariant_under_7_shuffle_partitions(
    skewed_spark, sf_dir, con, name
):
    from cdc_extractor_spark.queries import ORACLES, QUERIES

    df = QUERIES[name](skewed_spark, sf_dir)
    compare(df, con, ORACLES[name], name)
