"""Round-9 operator properties (beyond the DuckDB oracles): internal
consistency of the ANN cell reports, LSH band stats, curriculum
ordering, and the streaming IVF maintenance merge ≡ rebuild contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from cdc_extractor_spark.io import load_table

    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    from cdc_extractor_spark.io import load_table

    return load_table(spark, SF, "embeddings")


def test_band_stats_accounting(docs):
    """Every document contributes exactly one signature per band, and
    the per-band candidate workload upper-bounds the DISTINCT pair
    count the LSH join actually emits (bands can only rediscover or
    multiply pairs, never miss one the buckets imply)."""
    from cdc_extractor_spark.functions import dedup

    stats = {r["band"]: r for r in dedup.minhash_band_stats(docs, 3).collect()}
    n_docs_with_shingles = (
        dedup.shingles(docs, 3).select("doc_id").distinct().count()
    )
    assert set(stats) == {0, 1, 2, 3}
    for r in stats.values():
        assert r["n_docs"] == n_docs_with_shingles
        assert r["max_bucket"] >= 1
        assert r["n_cand_pairs"] >= 0
    total_workload = sum(r["n_cand_pairs"] for r in stats.values())
    distinct_pairs = dedup.minhash_candidate_pairs(docs, 3).count()
    assert distinct_pairs <= total_workload


def test_cell_occupancy_conserves_corpus(emb):
    from cdc_extractor_spark.functions import similarity

    rows = similarity.cell_occupancy_report(emb).collect()
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    assert all(0 <= r["n_own_label"] <= r["n_vecs"] for r in rows)
    # integer-floor shares sum to <= 10000 and within |cells| of it
    total_bp = sum(r["share_bp"] for r in rows)
    assert 10000 - len(rows) <= total_bp <= 10000


def test_cell_assignments_match_occupancy(emb):
    from cdc_extractor_spark.functions import similarity

    assigned = similarity.ivf_cell_assignments(emb)
    by_cell = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    report = {
        r["cluster"]: r["n_vecs"]
        for r in similarity.cell_occupancy_report(emb).collect()
    }
    assert by_cell == report


def test_cluster_signature_terms_shape(docs, emb):
    from cdc_extractor_spark.functions import similarity, text

    cells = similarity.ivf_cell_assignments(emb)
    rows = text.cluster_signature_terms(docs, cells, 3).collect()
    per_cluster: dict[int, list] = {}
    for r in rows:
        per_cluster.setdefault(r["cluster"], []).append(r)
        assert r["score"] == r["tf"] * 10000 // r["cluster_df"]
        assert r["term"] not in text.STOPWORDS
    for members in per_cluster.values():
        assert sorted(m["rank"] for m in members) == list(
            range(1, len(members) + 1)
        )
        assert len(members) <= 3
        # ranks follow (score desc, term asc)
        ordered = sorted(members, key=lambda m: (-m["score"], m["term"]))
        assert [m["rank"] for m in ordered] == list(range(1, len(members) + 1))


def test_curriculum_order_is_bucket_blocked_permutation(docs):
    from cdc_extractor_spark.functions import text

    rows = text.curriculum_quality_order(docs, 4).collect()
    n = docs.count()
    ranks = sorted(r["curriculum_rank"] for r in rows)
    assert ranks == list(range(1, n + 1))  # a permutation
    # buckets are contiguous rank blocks in bucket order
    by_bucket: dict[int, list[int]] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["curriculum_rank"])
    hi = 0
    for b in sorted(by_bucket):
        blk = sorted(by_bucket[b])
        assert blk[0] == hi + 1 and blk[-1] == hi + len(blk)
        hi = blk[-1]
    # curriculum property: every doc in bucket b has quality >= any
    # doc in bucket b+1 (ntile on quality DESC)
    worst = {b: min(r["quality_bp"] for r in rows if r["bucket"] == b)
             for b in by_bucket}
    best = {b: max(r["quality_bp"] for r in rows if r["bucket"] == b)
            for b in by_bucket}
    for b in sorted(by_bucket)[:-1]:
        assert worst[b] >= best[b + 1]


def test_streaming_ivf_maintenance_merge_equals_rebuild(spark, emb, tmp_path):
    """The final streamed epoch's snapshot must equal a from-scratch
    rebuild over the whole corpus — computed here with the SAME micros
    arithmetic but NO incremental state (the in-test rebuild twin)."""
    from cdc_extractor_spark.streaming.pipeline import (
        run_ivf_maintenance,
        write_embedding_batches,
    )

    feed = str(tmp_path / "feed")
    write_embedding_batches(emb, feed, 3)
    out = run_ivf_maintenance(spark, feed, str(tmp_path / "out"))
    assert out.select("epoch_id").distinct().count() == 3
    final = {
        (r["label"], r["n_total"], r["centroid_fp"])
        for r in out.filter(F.col("epoch_id") == 2).collect()
    }
    comp = emb.select(
        F.col("label").cast("long").alias("label"),
        F.posexplode("embedding").alias("pos", "_v"),
    ).select(
        "label", "pos",
        F.floor((F.col("_v").cast("double") + F.lit(1.0)) * 1_000_000)
        .cast("long").alias("micros"),
    )
    rebuild = {
        (r["label"], r["n_total"], r["centroid_fp"])
        for r in comp.groupBy("label", "pos")
        .agg(F.sum("micros").alias("sm"), F.count(F.lit(1)).alias("n"))
        .groupBy("label")
        .agg(
            F.max("n").alias("n_total"),
            F.sum(F.expr("sm div n")).alias("centroid_fp"),
        )
        .collect()
    }
    assert final == rebuild
