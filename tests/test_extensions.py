"""Semantic checks for the training-data-pipeline extensions (dedup,
similarity, text analysis) beyond oracle parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_extractor_spark.functions import dedup, similarity, text
from cdc_extractor_spark.io import load_table


def _with_dups(docs, shift=100_000, n=50):
    """Corpus + exact copies of its first n docs under shifted ids —
    guaranteed duplicates regardless of what the fixture contains."""
    copies = (
        docs.filter(F.col("doc_id") < n)
        .withColumn("doc_id", F.col("doc_id") + shift)
    )
    return docs.unionByName(copies)


def test_exact_dedup_finds_known_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = _with_dups(docs)
    res = dedup.exact_dedup(corpus)
    n_docs = corpus.count()
    assert res.count() < n_docs
    assert res.agg(F.sum("n_copies")).collect()[0][0] == n_docs
    # the survivor of each duplicated group is the original (min doc_id)
    dups = res.filter(F.col("n_copies") > 1).collect()
    assert len(dups) >= 40  # ≥ the 50 injected copies minus intra-corpus collisions
    assert all(r.keep_id < 100_000 for r in dups)


def test_minhash_lsh_finds_exact_duplicates(spark, sf_dir):
    """Exact duplicates (jaccard 10000 bp) must survive LSH banding —
    identical shingle sets produce identical band signatures."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = _with_dups(docs, n=30)
    lsh_pairs = {
        (r.doc_a, r.doc_b): r.jaccard_bp
        for r in dedup.minhash_lsh_dedup(corpus, 3, 0.99).collect()
    }
    texts = {
        r.doc_id: r.text for r in corpus.select("doc_id", "text").collect()
    }
    for orig in range(30):
        if len(texts[orig].split()) >= 3:  # need ≥3 tokens for a 3-shingle
            assert (orig, orig + 100_000) in lsh_pairs
            assert lsh_pairs[(orig, orig + 100_000)] == 10_000


def test_simhash_identical_docs_same_hash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = _with_dups(docs, n=30)
    sh = {r.doc_id: r.simhash for r in dedup.simhash(corpus).collect()}
    for orig in range(30):
        if orig in sh:
            assert sh[orig] == sh[orig + 100_000]


def test_lsh_topk_subset_of_exact_ranking(spark, sf_dir):
    """ANN results are drawn from the exact candidate scores: every
    (query, neighbor, cosine) in the LSH result matches the exact
    cosine computed by the brute-force path."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity.topk_cosine(emb, 5, 1000)  # effectively full rank
    ann = similarity.lsh_bucketed_topk(emb, 5, 10, 4)
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cosine for r in exact.collect()
    }
    ann_rows = ann.collect()
    assert ann_rows
    for r in ann_rows:
        key = (r.query_id, r.neighbor_id)
        assert key in exact_scores
        assert abs(exact_scores[key] - r.cosine) < 1e-9


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    """With nprobe = all cells, IVF routing is a no-op and the output
    must equal the brute-force top-k exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = emb.select("label").distinct().count()
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.topk_cosine(emb, 5, 10).collect()
    }
    ivf = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.ivf_topk(emb, 5, 10, nprobe=n_cells).collect()
    }
    assert ivf == exact


def test_ivf_partial_probe_recall(spark, sf_dir):
    """nprobe=3 of 10 cells: every returned neighbor's score matches the
    exact ranking, and recall@10 stays useful (>0.3 on the N(0,.15)
    fixture, where cells barely separate — the structural property, not
    the embedding quality, is under test)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact_top = {
        r.query_id: set()
        for r in similarity.topk_cosine(emb, 5, 10).collect()
    }
    for r in similarity.topk_cosine(emb, 5, 10).collect():
        exact_top[r.query_id].add(r.neighbor_id)
    ivf_rows = similarity.ivf_topk(emb, 5, 10, nprobe=3).collect()
    assert ivf_rows
    got: dict = {}
    for r in ivf_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(got.get(q, set()) & exact_top[q]) / len(exact_top[q])
        for q in exact_top
    ]
    assert sum(recalls) / len(recalls) > 0.3


def test_lang_id_covers_all_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    res = text.lang_id(docs, spark)
    assert res.count() == docs.count()
    assert res.filter(F.col("lang_pred") == "und").count() < docs.count()


def test_quality_score_bounds(spark, sf_dir):
    res = text.quality_score(load_table(spark, sf_dir, "documents"))
    bad = res.filter(
        (F.col("stop_bp") < 0) | (F.col("stop_bp") > 10000) | (F.col("n_tokens") <= 0)
    ).count()
    assert bad == 0


def test_connected_components_chain_converges(spark):
    """A 4-node chain needs multiple propagation rounds (label 1 must
    travel 3 hops); singleton-pair and two separate components must not
    merge."""
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (3, 4), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_stratified_sample_is_stable_under_union(spark, sf_dir):
    """Membership is a pure function of (doc_id, lang): sampling a
    grown corpus keeps every previously-sampled doc (incremental
    train-set reproducibility)."""
    docs = load_table(spark, sf_dir, "documents")
    small = text.stratified_sample(docs.filter(F.col("doc_id") < 200))
    full = text.stratified_sample(docs)
    assert small.exceptAll(full.filter(F.col("doc_id") < 200)).count() == 0


def test_pq_full_rerank_equals_exact(spark, sf_dir):
    """With rerank ≥ corpus size the PQ shortlist covers everything and
    the exact re-rank stage must reproduce brute-force top-k."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus_n = emb.filter(F.col("vec_id") >= 5).count()
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.topk_cosine(emb, 5, 10).collect()
    }
    pq = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.pq_topk(emb, 5, 10, rerank=corpus_n).collect()
    }
    assert pq == exact


def test_pq_codes_compact_and_complete(spark, sf_dir):
    """Every corpus vector gets exactly m codes, each in [0, n_cells);
    codebooks carry one centroid per (subspace, used cell) of the
    subspace width."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    m, n_cells = 8, 16
    codes, cb = similarity.pq_train(corpus, m=m, n_cells=n_cells, iters=1)
    n_vec = corpus.count()
    assert codes.count() == n_vec * m
    stats = codes.agg(
        F.min("cell"), F.max("cell"), F.countDistinct("vec_id")
    ).first()
    assert stats[0] >= 0 and stats[1] < n_cells and stats[2] == n_vec
    cb_rows = cb.collect()
    assert all(len(r.centroid) == 64 // m for r in cb_rows)
    assert all(0 <= r.cell < n_cells for r in cb_rows)


def test_pq_partial_rerank_is_plausible_and_scored_exactly(spark, sf_dir):
    """Small-shortlist PQ: every returned (query, neighbor) carries the
    same cosine the brute-force scorer assigns it (re-rank is exact
    even when the shortlist is approximate), and each query returns a
    full k results."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact_all = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.topk_cosine(emb, 5, 10_000).collect()
    }
    rows = similarity.pq_topk(emb, 5, 10, rerank=50).collect()
    per_q: dict = {}
    for r in rows:
        assert exact_all[(r.query_id, r.neighbor_id)] == r.cosine
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_incremental_lsh_merge_equals_full(spark, sf_dir):
    """old-index pairs (both docs old) ∪ incremental pairs (touching a
    new doc) must equal the full recompute, for an interior split and
    both degenerate splits."""
    docs = load_table(spark, sf_dir, "documents")
    full = {
        (r.doc_a, r.doc_b): (r.n_inter, r.jaccard_bp)
        for r in dedup.minhash_lsh_dedup(docs, 3, 0.8).collect()
    }
    hi = docs.agg(F.max("doc_id")).first()[0]
    for split in (0, 250, hi + 1):
        old_docs = docs.where(F.col("doc_id") < split)
        old_pairs = {
            (r.doc_a, r.doc_b): (r.n_inter, r.jaccard_bp)
            for r in dedup.minhash_lsh_dedup(old_docs, 3, 0.8).collect()
        }
        inc = {
            (r.doc_a, r.doc_b): (r.n_inter, r.jaccard_bp)
            for r in dedup.minhash_lsh_incremental(docs, split, 3, 0.8).collect()
        }
        assert not (set(old_pairs) & set(inc))
        merged = {**old_pairs, **inc}
        assert merged == full, f"split={split}"


def test_pq_index_persists_and_serves(spark, sf_dir, tmp_path):
    """Index lifecycle: train once → persist codes+codebooks as parquet
    tables → reload → serve.  Served results must equal inline-trained
    results exactly (the index IS the state; no retraining on reload)."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    codes, cb = similarity.pq_train(corpus, 8, 16, 1)
    codes.write.parquet(str(tmp_path / "codes"))
    cb.write.parquet(str(tmp_path / "codebooks"))
    reloaded = (
        spark.read.parquet(str(tmp_path / "codes")),
        spark.read.parquet(str(tmp_path / "codebooks")),
    )
    inline = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.pq_topk(
            emb, 5, 10, iters=1, index=(codes, cb)).collect()
    }
    served = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.pq_topk(
            emb, 5, 10, iters=1, index=reloaded).collect()
    }
    assert served == inline and served


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows], DOC_SCHEMA
    )


def test_corpus_hygiene_ops_empty_input(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    for fn in (
        text.repetition_stats,
        text.gopher_quality_flags,
        text.pii_redaction,
        text.decontamination_overlap,
        text.content_defined_chunks,
    ):
        assert fn(empty).count() == 0, fn.__name__


def test_repetition_stats_flags_degenerate_doc(spark):
    docs = _docs(spark, [(1, "spam " * 49 + "spam"), (2, "a b c d e f g h i j")])
    rows = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    assert rows[1]["top_tok_bp"] == 10000 and rows[1]["repetitive"]
    assert rows[2]["top_tok_bp"] == 1000 and rows[2]["distinct_bp"] == 10000
    assert not rows[2]["repetitive"]


def test_pii_redaction_scrubs_and_rehashes(spark):
    from pyspark.sql import functions as F

    docs = _docs(spark, [(7, "plain words only here now")])
    out = text.pii_redaction(docs).first()
    assert out["n_emails"] == 1 and out["n_phones"] == 1
    # the redacted hash must differ from hashing the un-redacted text
    raw = docs.select(F.sha2(F.col("text"), 256).alias("h")).first()["h"]
    assert out["red_hash"] != raw


def test_decontamination_verbatim_leak_scores_10000(spark):
    # LCG buckets: doc 9 → test split (b=909..), docs 0-4 → train.
    leaked = "alpha beta gamma delta epsilon zeta"
    docs = _docs(
        spark,
        [(0, leaked), (1, "one two three four five six"), (9, leaked),
         (18, "nine distinct words never seen in the train half")],
    )
    rows = {r["doc_id"]: r for r in text.decontamination_overlap(docs).collect()}
    assert rows[9]["contam_bp"] == 10000
    assert rows[18]["n_overlap"] == 0 and rows[18]["contam_bp"] == 0
    assert set(rows) == {9, 18}  # only test-split docs are audited


def test_content_defined_chunks_conserve_and_localize(spark):
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again " * 4
    edited = base + "tail edit only"
    docs = _docs(spark, [(1, base), (2, edited)])
    out = text.content_defined_chunks(docs)
    # conservation: chunk token counts sum to the doc's token count
    sums = {
        r["doc_id"]: r["s"]
        for r in out.groupBy("doc_id").agg(F.sum("chunk_tokens").alias("s")).collect()
    }
    ntok = {
        r["doc_id"]: r["n"]
        for r in text.token_stats(docs)
        .select("doc_id", F.col("n_tokens").alias("n")).collect()
    }
    assert sums == ntok
    # content-defined locality: a tail-only edit preserves every chunk
    # boundary before the edit point (same first_pos set prefix)
    firsts = lambda d: sorted(
        r["first_pos"] for r in out.filter(F.col("doc_id") == d).collect()
    )
    f1, f2 = firsts(1), firsts(2)
    assert f2[: len(f1)] == f1


def test_semantic_dedup_structure(spark, sf_dir):
    from cdc_extractor_spark.functions import similarity
    from cdc_extractor_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.semantic_dedup(emb).collect()
    n = emb.count()
    assert len(out) == n  # every vector classified exactly once
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cluster, rows in by_cluster.items():
        rep_ids = {r["rep_id"] for r in rows}
        assert len(rep_ids) == 1  # one representative per cluster
        rep_id = rep_ids.pop()
        assert rep_id == min(r["vec_id"] for r in rows)
        for r in rows:
            assert -1.000001 <= r["cos_to_rep"] <= 1.000001
            if r["vec_id"] == rep_id:
                # representative: cosine to itself is 1, never a dup
                assert abs(r["cos_to_rep"] - 1.0) < 1e-5
                assert not r["is_dup"]
            else:
                assert r["is_dup"] == (r["cos_to_rep"] >= 0.95)


def test_deterministic_shuffle_is_permutation_and_salt_sensitive(spark, sf_dir):
    from cdc_extractor_spark.functions import text as textmod
    from cdc_extractor_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["shuffle_rank"]
         for r in textmod.deterministic_shuffle_rank(docs).collect()}
    n = docs.count()
    assert sorted(a.values()) == list(range(1, n + 1))  # dense permutation
    # same salt → identical order on re-run
    a2 = {r["doc_id"]: r["shuffle_rank"]
          for r in textmod.deterministic_shuffle_rank(docs).collect()}
    assert a == a2
    # different salt → a different (independent) epoch order
    b = {r["doc_id"]: r["shuffle_rank"]
         for r in textmod.deterministic_shuffle_rank(docs, salt="s43").collect()}
    assert sorted(b.values()) == list(range(1, n + 1))
    assert a != b


def test_deterministic_shuffle_empty_input(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_extractor_spark.functions import text as textmod
    from cdc_extractor_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").where(F.lit(False))
    out = textmod.deterministic_shuffle_rank(docs)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["shuffle_rank", "doc_id"]


def test_rolling_user_features_semantics(spark):
    from datetime import datetime

    from cdc_extractor_spark.operators import analytics

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, 1.00),
        (2, datetime(2024, 1, 1, 0, 1, 0), 7, 2.00),
        (3, datetime(2024, 1, 1, 0, 3, 0), 7, 4.00),
        (4, datetime(2024, 1, 1, 0, 0, 30), 9, 10.00),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: r for r in
           analytics.rolling_user_features(ev, frame=2).collect()}
    assert got[1]["prev_value_cents"] is None
    assert got[1]["ms_since_prev"] is None
    assert got[1]["n_prior"] == 0
    assert got[1]["roll2_avg_cents"] == 100
    assert got[2]["prev_value_cents"] == 100
    assert got[2]["ms_since_prev"] == 60_000
    assert got[2]["roll2_avg_cents"] == 150  # (100+200)/2
    assert got[3]["prev_value_cents"] == 200
    assert got[3]["ms_since_prev"] == 120_000
    assert got[3]["roll2_avg_cents"] == 300  # (200+400)/2
    assert got[3]["n_prior"] == 2
    assert got[4]["n_prior"] == 0  # other user unaffected
    assert got[4]["roll2_avg_cents"] == 1000


def test_sequence_packing_contiguous_and_order_consistent(spark, sf_dir):
    """The packed layout must be contiguous (each doc starts exactly
    where the previous one ended, in the deterministic shuffle order)
    and agree with deterministic_shuffle_rank's permutation; sequence
    ids/offsets must be consistent with the 512-token grid."""
    from cdc_extractor_spark.functions import text as textmod
    from cdc_extractor_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    man = {r["doc_id"]: r for r in
           textmod.sequence_packing_manifest(docs).collect()}
    order = sorted(
        ((r["shuffle_rank"], r["doc_id"]) for r in
         textmod.deterministic_shuffle_rank(docs).collect())
    )
    expected_start = 0
    for _, doc_id in order:
        r = man[doc_id]
        assert r["start_token"] == expected_start
        assert r["seq_id"] == r["start_token"] // 512
        assert r["offset_in_seq"] == r["start_token"] % 512
        if r["n_tokens"]:
            last = r["start_token"] + r["n_tokens"] - 1
            assert r["n_seqs_spanned"] == last // 512 - r["seq_id"] + 1
        expected_start += r["n_tokens"]


# ---------------------------------------------------------------------------
# Round-5 wave: bitmap exact-distinct, verbatim substring spans,
# TV feature drift, binary-Hamming ANN
# ---------------------------------------------------------------------------


def test_bitmap_rollup_matches_count_distinct(spark, sf_dir):
    from cdc_extractor_spark.functions import sketches

    events = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["n_distinct_users"]
        for r in sketches.bitmap_distinct_rollup(events).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert got[t] == n, t
    total = events.select("user_id").distinct().count()
    assert got["__all__"] == total
    # union-not-sum: overlapping actors across types make the merged
    # total strictly smaller than the naive per-type sum
    assert got["__all__"] <= sum(exact.values())


def test_bitmap_rollup_negative_and_empty(spark):
    from cdc_extractor_spark.functions import sketches

    df = spark.createDataFrame(
        [("a", -5), ("a", -5), ("a", 3), ("b", -5)], "event_type string, user_id long"
    )
    got = {r["event_type"]: r["n_distinct_users"]
           for r in sketches.bitmap_distinct_rollup(df).collect()}
    assert got == {"a": 2, "b": 1, "__all__": 2}
    empty = spark.createDataFrame([], "event_type string, user_id long")
    assert sketches.bitmap_distinct_rollup(empty).where(
        F.col("event_type") != "__all__").count() == 0


def test_exact_substring_dups_flags_verbatim_span(spark):
    passage = "x" * 5 + "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [
            (1, "A" * 30 + passage + "B" * 30),
            (2, "C" * 41 + passage + "D" * 17),
            (3, "unique content that appears nowhere else at all " * 4),
        ],
        "doc_id long, text string",
    )
    res = {r["doc_id"]: r for r in dedup.exact_substring_dups(docs).collect()}
    assert res[1]["n_dup_windows"] > 0
    assert res[2]["n_dup_windows"] > 0
    assert res[3]["n_dup_windows"] == 0
    for r in res.values():
        assert 0 <= r["dup_permille"] <= 1000
        assert r["n_dup_windows"] <= r["n_windows"]


def test_exact_substring_dups_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "y" * 39)], "doc_id long, text string"
    )
    assert dedup.exact_substring_dups(docs).count() == 0


def test_feature_drift_identical_sides_zero(spark):
    from cdc_extractor_spark.operators.analytics import feature_drift_tv

    # same value histogram on an even day (Jan 2 2024) and an odd day
    # (Jan 3 2024) -> zero drift
    rows = []
    for day_ms in (1704153600000, 1704240000000):
        for v in (5.0, 25.0, 25.0, 50.0, 75.0, 75.0):
            rows.append((day_ms, "t", v))
    df = spark.createDataFrame(rows, "ms long, event_type string, value double") \
        .select(F.timestamp_millis("ms").alias("ts"), "event_type", "value")
    got = feature_drift_tv(df).collect()
    assert len(got) == 1
    assert got[0]["tv_permille"] == 0
    assert got[0]["n_even_days"] == got[0]["n_odd_days"] == 6


def test_feature_drift_disjoint_sides_full(spark):
    from cdc_extractor_spark.operators.analytics import feature_drift_tv

    rows = [(1704153600000, "t", 5.0)] * 4 + [(1704240000000, "t", 400.0)] * 4
    df = spark.createDataFrame(rows, "ms long, event_type string, value double") \
        .select(F.timestamp_millis("ms").alias("ts"), "event_type", "value")
    got = feature_drift_tv(df).collect()
    assert got[0]["tv_permille"] == 1000


def test_binary_signatures_pack_known_vector(spark):
    vec = [1.0 if i in (0, 31, 32, 63) else -1.0 for i in range(64)]
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    row = similarity.binary_signatures(df).first()
    # fold is MSB-first over each 32-dim half: dim 1 lands on bit 31,
    # dim 32 on bit 0 (and likewise for the second half)
    assert row["w0"] == (1 << 31) | 1
    assert row["w1"] == (1 << 31) | 1


def test_hamming_topk_identical_vector_ranks_first(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    clone = spark.createDataFrame(
        [(900_000, list(q0), 0)], "vec_id long, embedding array<float>, label int"
    )
    res = similarity.ann_hamming_topk(emb.unionByName(clone), 1, 5)
    top = res.where(F.col("rank") == 1).first()
    assert top["neighbor_id"] == 900_000
    assert top["hamming"] == 0
    # ranks are dense 1..k per query
    ranks = [r["rank"] for r in res.orderBy("rank").collect()]
    assert ranks == list(range(1, 6))


def test_maxsim_clone_ranks_first_and_part_match_wins(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q0 = list(emb.where(F.col("vec_id") == 0).first()["embedding"])
    # clone: exact copy of the query -> maximal score, rank 1
    # part-match: query's FIRST 16 dims, zeros elsewhere -> must beat
    # an all-dims-scaled-down copy with the same total energy budget
    part = q0[:16] + [0.0] * 48
    faded = [x * 0.2 for x in q0]
    extra = spark.createDataFrame(
        [(910_000, q0, 0), (910_001, part, 0), (910_002, faded, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    res = {
        r["neighbor_id"]: (r["maxsim"], r["rank"])
        for r in similarity.multivector_maxsim_topk(
            emb.unionByName(extra), 1, 1000
        ).collect()
    }
    assert res[910_000][1] == 1  # the clone is the top hit
    # the clone's maxsim = sum of its slices' self-dots (each slice's
    # best match is itself)
    import math

    want = sum(
        sum(x * x for x in (list(map(float, q0))[i * 16:(i + 1) * 16]))
        for i in range(4)
    )
    assert math.isclose(res[910_000][0], want, rel_tol=1e-4)
    # part-match scores at least the full slice-0 self-dot; the faded
    # copy only 0.2x of the total - late interaction rewards the part
    assert res[910_001][0] > res[910_002][0]
