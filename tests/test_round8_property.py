"""Property pins for the round-8 operators, beyond oracle parity.

The driver's hash check proves point equality with the DuckDB oracle
at one scale factor; these tests pin the operators' CONTRACTS — the
invariants a user relies on when the inputs change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_extractor_spark.functions import dedup, similarity, text
from cdc_extractor_spark.io import load_table

BUDGET = 200


def test_cluster_balanced_selection_quota_contract(spark, sf_dir):
    """Per cell: quota = max(1, floor-share of the budget), selection
    never exceeds quota or membership, and the total stays within the
    budget envelope (proportional floors undershoot by < 1 per cell;
    the floor-1 rule can only add back up to one per tiny cell)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.cluster_balanced_selection(emb, BUDGET).collect()
    n_total = sum(r["n_members"] for r in out)
    n_cells = len(out)
    assert n_cells > 1
    for r in out:
        assert r["quota"] == max(1, BUDGET * r["n_members"] // n_total)
        assert r["n_selected"] == min(r["quota"], r["n_members"])
    picked = sum(r["n_selected"] for r in out)
    assert picked <= BUDGET + n_cells  # floor-1 top-ups only
    assert picked >= BUDGET - n_cells  # proportional floors only


def test_cluster_balanced_selection_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = {tuple(r) for r in similarity.cluster_balanced_selection(emb).collect()}
    b = {tuple(r) for r in similarity.cluster_balanced_selection(emb).collect()}
    assert a == b


def test_ivf_index_merge_split_invariance(spark, sf_dir):
    """merge(old partials, new partials) ≡ rebuild means the OUTPUT
    cannot depend on WHERE the batch boundary falls: all-old, all-new,
    and any interior split must produce the identical index except for
    the n_old/n_new attribution (whose sum is pinned)."""
    emb = load_table(spark, sf_dir, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0] + 1

    def fp(split):
        rows = similarity.ivf_index_merge(emb, split).collect()
        return (
            {(r["label"], r["n_total"], r["centroid_fp"]) for r in rows},
            {(r["label"], r["n_old"] + r["n_new"]) for r in rows},
        )

    base_idx, base_n = fp(0)  # everything "new"
    for split in (400, hi // 2, hi):
        idx, n = fp(split)
        assert idx == base_idx, f"index differs at split={split}"
        assert n == base_n
    all_new = similarity.ivf_index_merge(emb, 0).collect()
    all_old = similarity.ivf_index_merge(emb, hi).collect()
    assert all(r["n_old"] == 0 for r in all_new)
    assert all(r["n_new"] == 0 for r in all_old)


def test_split_leakage_audit_accounts_for_every_pair(spark, sf_dir):
    """The split-pair rollup must conserve the LSH pair relation: group
    counts sum to the pair count, and n_leak_pairs is exactly the
    off-diagonal mass (split_lo != split_hi groups carry only leaks,
    diagonal groups none)."""
    docs = load_table(spark, sf_dir, "documents")
    rows = dedup.split_leakage_audit(docs).collect()
    n_pairs = dedup.minhash_lsh_dedup(docs).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs > 0
    for r in rows:
        if r["split_lo"] == r["split_hi"]:
            assert r["n_leak_pairs"] == 0
        else:
            assert r["n_leak_pairs"] == r["n_pairs"]


def test_dedup_token_savings_conserves_corpus(spark, sf_dir):
    """Per-source totals must reconcile with the corpus and the global
    exact-dedup relation: doc counts conserve, keeper count equals the
    number of distinct contents, kept tokens never exceed totals."""
    docs = load_table(spark, sf_dir, "documents")
    rows = text.dedup_token_savings(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    n_distinct = dedup.exact_dedup(docs).count()
    assert sum(r["n_keepers"] for r in rows) == n_distinct
    for r in rows:
        assert 0 < r["n_keepers"] <= r["n_docs"]
        assert 0 < r["tokens_kept"] <= r["tokens_total"]


def test_contamination_by_domain_covers_all_test_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = text.contamination_by_domain(docs).collect()
    per_doc = text.decontamination_overlap(docs)
    assert sum(r["n_test_docs"] for r in rows) == per_doc.count() > 0
    # the flag threshold is honored exactly
    flagged = per_doc.filter(F.col("contam_bp") >= 2500).count()
    assert sum(r["n_contaminated"] for r in rows) == flagged
