"""Round-13 operator tests: cluster_size_report (dedup capacity
planning), contamination_by_source (per-feed leakage drill-down) and
required_word_coverage (corpus marginal of the Gopher required-words
rule), each against a pure-Python reference on constructed inputs plus
consistency checks on the fixture."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")


@pytest.fixture(scope="module")
def docs(spark):
    from cdc_extractor_spark.io import load_table

    return load_table(spark, SF, "documents")


def _bucket(n: int) -> str:
    if n <= 2:
        return "2"
    if n == 3:
        return "3"
    if n == 4:
        return "4"
    if n <= 8:
        return "5-8"
    if n <= 16:
        return "9-16"
    return "17+"


class TestClusterSizeReport:
    def test_every_bucket_against_python_reference(self, spark):
        """Constructed components covering all six buckets (sizes 2, 3,
        4, 7, 12, 23), checked value-for-value against a pure-Python
        rollup."""
        from cdc_extractor_spark.functions import dedup

        sizes = [2, 3, 4, 7, 12, 23, 2, 5]
        rows, nid = [], 0
        for cid, sz in enumerate(sizes):
            for _ in range(sz):
                rows.append((nid, cid * 1000))
                nid += 1
        comp = spark.createDataFrame(rows, "doc_id long, cluster_id long")
        out = {
            r["size_bucket"]: r
            for r in dedup.cluster_size_report(comp).collect()
        }
        by_bucket = defaultdict(list)
        for sz in sizes:
            by_bucket[_bucket(sz)].append(sz)
        assert set(out) == set(by_bucket)
        for b, members in by_bucket.items():
            assert out[b]["n_clusters"] == len(members)
            assert out[b]["n_docs"] == sum(members)
            assert out[b]["n_removable"] == sum(members) - len(members)
            assert out[b]["max_members"] == max(members)

    def test_fixture_totals_match_components(self, spark, docs):
        """Bucket totals must partition the components frame exactly:
        sum(n_docs) == |components|, sum(n_clusters) == |clusters|."""
        from cdc_extractor_spark.functions import dedup

        pairs = dedup.minhash_lsh_dedup(docs, 3, 0.8)
        comp = dedup.connected_components(pairs)
        rep = dedup.cluster_size_report(comp).collect()
        assert sum(r["n_docs"] for r in rep) == comp.count()
        assert (
            sum(r["n_clusters"] for r in rep)
            == comp.select("cluster_id").distinct().count()
        )
        # CC clusters have >= 2 members by construction, so n_removable
        # is always >= n_clusters' worth of survivors
        for r in rep:
            assert r["n_removable"] == r["n_docs"] - r["n_clusters"]

    def test_no_window_no_cartesian_in_report_stage(self, spark):
        """The report itself is two hash aggregates — zero Window
        nodes, zero cartesian products (executed plan, post-AQE)."""
        from cdc_extractor_spark.functions import dedup

        comp = spark.createDataFrame(
            [(i, i // 3) for i in range(30)], "doc_id long, cluster_id long"
        )
        out = dedup.cluster_size_report(comp)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestContaminationBySource:
    def test_rollup_matches_per_doc_audit(self, spark, docs):
        """The per-source rows must be EXACTLY the pure-Python rollup
        of decontamination_overlap joined to the doc's source."""
        from cdc_extractor_spark.functions import text

        per = {
            r["doc_id"]: r
            for r in text.decontamination_overlap(docs).collect()
        }
        src = dict(docs.select("doc_id", "source").collect())
        agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, sh, ov, flagged
        for did, r in per.items():
            a = agg[src[did]]
            a[0] += 1
            a[1] += r["n_shingles"]
            a[2] += r["n_overlap"]
            a[3] += 1 if r["contam_bp"] >= 1000 else 0
        out = {
            r["source"]: r
            for r in text.contamination_by_source(docs).collect()
        }
        assert set(out) == set(agg)
        for s, (nd, sh, ov, fl) in agg.items():
            assert out[s]["n_test_docs"] == nd
            assert out[s]["n_shingles"] == sh
            assert out[s]["n_overlap"] == ov
            assert out[s]["n_flagged"] == fl
            assert out[s]["contam_bp"] == (ov * 10000) // sh

    def test_flag_bp_default_matches_oracle_literal(self):
        """ADVICE r12 discipline: the oracle hardcodes 1000 bp — pin
        the Python default to it."""
        import inspect

        from cdc_extractor_spark.functions import text
        from cdc_extractor_spark.queries import ORACLES

        sig = inspect.signature(text.contamination_by_source)
        assert sig.parameters["flag_bp"].default == 1000
        assert ">= 1000" in ORACLES["contamination_by_source"]


class TestRequiredWordCoverage:
    def test_against_python_reference_with_case_variants(self, spark):
        """Mixed-case and repeated required words on constructed docs,
        checked against a pure-Python count."""
        from cdc_extractor_spark.functions import text

        corpus = [
            (1, "The the THE cat sat"),
            (2, "be to of and that have with the"),
            (3, "cats dogs birds fish"),
            (4, "To BE or not to be"),
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        toks = {
            did: [t.lower() for t in txt.split(" ") if t]
            for did, txt in corpus
        }
        out = {
            r["word"]: r for r in text.required_word_coverage(df).collect()
        }
        assert set(out) == set(REQUIRED)
        n_docs = len(toks)
        for w in REQUIRED:
            with_w = sum(1 for ts in toks.values() if w in ts)
            occ = sum(Counter(ts)[w] for ts in toks.values())
            assert out[w]["n_docs"] == n_docs
            assert out[w]["n_docs_with"] == with_w, w
            assert out[w]["occurrences"] == occ, w
            assert out[w]["coverage_bp"] == (with_w * 10000) // n_docs

    def test_marginal_consistent_with_per_doc_rule(self, spark, docs):
        """sum over words of n_docs_with must equal the sum over docs
        of n_required_words (both count (doc, word) membership pairs),
        and the denominators must agree."""
        from cdc_extractor_spark.functions import text

        per_doc = text.gopher_required_words(docs)
        cov = text.required_word_coverage(docs).collect()
        pairs_from_docs = per_doc.agg(
            F.sum("n_required_words")
        ).first()[0]
        assert sum(r["n_docs_with"] for r in cov) == pairs_from_docs
        assert all(r["n_docs"] == per_doc.count() for r in cov)

    def test_single_corpus_scan_no_joins(self, spark, docs):
        """Plan pin: one token explode feeding hash aggregates — zero
        joins, zero windows (executed plan, post-AQE)."""
        from cdc_extractor_spark.functions import text

        out = text.required_word_coverage(docs)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "Join" not in plan
        assert "Window" not in plan


class TestRound13EmptyInputs:
    def test_empty_inputs_yield_wellformed_frames(self, spark):
        """Same bar as rounds 8-12: the reference crashes on empty
        batches (SURVEY.md §5); every new operator must return a
        well-formed (possibly empty) frame — required_word_coverage
        still emits its 8 words with NULL shares, not a
        divide-by-zero."""
        from cdc_extractor_spark.functions import dedup, text

        empty_docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        empty_comp = spark.createDataFrame(
            [], "doc_id long, cluster_id long"
        )
        assert dedup.cluster_size_report(empty_comp).count() == 0
        assert text.contamination_by_source(empty_docs).count() == 0
        cov = text.required_word_coverage(empty_docs).collect()
        assert len(cov) == 8
        assert all(r["coverage_bp"] is None for r in cov)
        assert all(r["n_docs_with"] == 0 for r in cov)
