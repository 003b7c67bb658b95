"""Round-12 operator tests: gopher_required_words (the last public
Gopher heuristic), lsh_band_calibration (per-band candidate
attribution + precision), and merge_conflict_report (field-level
survivorship conflict audit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from cdc_extractor_spark.io import load_table

    return load_table(spark, SF, "documents")


class TestGopherRequiredWords:
    def test_consistency_bounds(self, spark, docs):
        from cdc_extractor_spark.functions import text

        out = text.gopher_required_words(docs)
        bad = out.filter(
            (F.col("n_required_words") < 0)
            | (F.col("n_required_words") > 8)
            | (F.col("n_required_words") > F.col("required_hits"))
            | (F.col("required_hits") > F.col("n_tokens"))
            | (
                F.col("pass_required_words")
                != (F.col("n_required_words") >= 2)
            )
        )
        assert bad.count() == 0
        # one row per document with >=1 token
        assert out.count() == docs.filter(F.col("text") != "").count()

    def test_distinct_membership_not_occurrence_total(self, spark):
        """'the the the' has 3 required-word HITS but only 1 DISTINCT
        required word — it must FAIL, which is exactly what separates
        this rule from gopher_quality_flags' stop_hits total."""
        from cdc_extractor_spark.functions import text

        df = spark.createDataFrame(
            [
                (1, "the the the cat sat"),
                (2, "the cat and dog sat"),
                (3, "cats dogs birds fish"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in
                text.gopher_required_words(df).collect()}
        assert rows[1]["required_hits"] == 3
        assert rows[1]["n_required_words"] == 1
        assert not rows[1]["pass_required_words"]
        assert rows[2]["n_required_words"] == 2
        assert rows[2]["pass_required_words"]
        assert rows[3]["n_required_words"] == 0
        assert not rows[3]["pass_required_words"]

    def test_membership_is_case_insensitive(self, spark):
        from cdc_extractor_spark.functions import text

        df = spark.createDataFrame(
            [(1, "The quick fox AND hound")], "doc_id long, text string"
        )
        row = text.gopher_required_words(df).collect()[0]
        assert row["n_required_words"] == 2
        assert row["pass_required_words"]

    def test_single_shuffle_no_join_no_window(self, spark, docs):
        """One explode + one per-doc hash aggregate: the plan must have
        exactly one exchange and zero Join/Window nodes."""
        from cdc_extractor_spark.functions import text

        df = text.gopher_required_words(docs)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "Window" not in plan and "Join" not in plan
        assert plan.count("Exchange") == 1


class TestLshBandCalibration:
    def test_partitions_candidate_set(self, spark, docs):
        """First-catch attribution partitions the LSH candidate set:
        per-band pair counts sum to exactly the distinct candidate
        count, and exclusive pairs can never exceed a band's total."""
        from cdc_extractor_spark.functions import dedup

        rows = dedup.lsh_band_calibration(docs, 3).collect()
        n_cand = dedup.minhash_candidate_pairs(docs, 3).count()
        assert sum(r["n_pairs"] for r in rows) == n_cand
        for r in rows:
            assert 0 <= r["first_band"] < dedup.N_BANDS
            assert 0 <= r["n_exclusive"] <= r["n_pairs"]
            assert 0 <= r["n_good"] <= r["n_pairs"]
            assert 0 <= r["mean_jaccard_bp"] <= 10000
            assert (
                r["precision_bp"] == r["n_good"] * 10000 // r["n_pairs"]
            )

    def test_identical_docs_caught_by_band_zero_nonexclusively(self, spark):
        """Byte-identical docs share all 4 band signatures: attributed
        to first_band 0 and NOT exclusive (every band catches them)."""
        from cdc_extractor_spark.functions import dedup

        t = "spark window batch merge join filter scan sort hash agg"
        df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
        rows = dedup.lsh_band_calibration(df, 3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["first_band"] == 0
        assert r["n_pairs"] == 1
        assert r["n_exclusive"] == 0
        assert r["mean_jaccard_bp"] == 10000
        assert r["precision_bp"] == 10000


class TestMergeConflictReport:
    def test_crafted_cluster_conflicts(self, spark):
        """Canonical = longest n_chars with doc_id tie-break (the
        survivorship rule); conflicts count members that disagree with
        the canonical value."""
        from cdc_extractor_spark.functions import dedup

        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "doc_id long, cluster_id long"
        )
        docs = spark.createDataFrame(
            [
                (1, "x", "en", "a", 10),
                (2, "y", "fr", "b", 20),
                (3, "z", "en", "a", 20),
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        row = dedup.merge_conflict_report(comp, docs).collect()[0]
        assert row["canonical_doc_id"] == 2  # 20 chars, lowest doc_id
        assert row["n_members"] == 3
        assert row["n_langs"] == 2 and row["n_sources"] == 2
        assert row["lang_conflicts"] == 2  # docs 1 and 3 vs fr
        assert row["source_conflicts"] == 2
        assert row["chars_spread"] == 10

    def test_fixture_invariants(self, spark, docs):
        from cdc_extractor_spark.functions import dedup

        pairs = dedup.minhash_lsh_dedup(docs, 3, 0.8)
        comp = dedup.connected_components(pairs)
        out = dedup.merge_conflict_report(comp, docs)
        bad = out.filter(
            (F.col("n_members") < 2)
            | (F.col("n_langs") > F.col("n_members"))
            | (F.col("n_sources") > F.col("n_members"))
            | (F.col("lang_conflicts") > F.col("n_members") - 1)
            | (F.col("source_conflicts") > F.col("n_members") - 1)
            | ((F.col("n_langs") == 1) & (F.col("lang_conflicts") != 0))
            | ((F.col("n_langs") > 1) & (F.col("lang_conflicts") == 0))
            | (F.col("chars_spread") < 0)
        )
        assert bad.count() == 0
        assert out.count() == comp.select("cluster_id").distinct().count()

    def test_canonical_is_survivorship_pick(self, spark, docs):
        """canonical_doc_id must be exactly dedup_survivorship's
        golden-record choice for every cluster."""
        from pyspark.sql import Window

        from cdc_extractor_spark.functions import dedup

        pairs = dedup.minhash_lsh_dedup(docs, 3, 0.8)
        comp = dedup.connected_components(pairs)
        out = dedup.merge_conflict_report(comp, docs)
        j = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("n_chars").desc(), F.col("doc_id").asc()
        )
        golden = (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cluster_id", F.col("doc_id").alias("golden"))
        )
        diff = out.join(golden, "cluster_id").filter(
            F.col("canonical_doc_id") != F.col("golden")
        )
        assert diff.count() == 0


class TestRound12EmptyInputs:
    def test_empty_documents_yield_empty_frames(self, spark):
        """Same bar as rounds 8-11: the reference crashes on empty
        batches (SURVEY.md §5); every new operator must return a
        well-formed empty frame."""
        from cdc_extractor_spark.functions import dedup, text

        empty = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        empty_comp = spark.createDataFrame(
            [], "doc_id long, cluster_id long"
        )
        assert text.gopher_required_words(empty).count() == 0
        assert dedup.lsh_band_calibration(empty, 3).count() == 0
        assert dedup.merge_conflict_report(empty_comp, empty).count() == 0


class TestOracleDefaultPins:
    """ADVICE r12 closure: the registry oracles hardcode the
    gopher_required_words pass threshold (>= 2) and the
    lsh_band_calibration good-pair cut (7000 bp) as SQL literals while
    the Python functions expose them as parameters.  Pin the defaults
    to the literals so a future signature change cannot silently break
    Spark/DuckDB parity."""

    def test_gopher_required_words_default_matches_oracle(self):
        import inspect

        from cdc_extractor_spark.functions import text
        from cdc_extractor_spark.queries import ORACLES

        sig = inspect.signature(text.gopher_required_words)
        assert sig.parameters["min_distinct"].default == 2
        assert ">= 2" in ORACLES["gopher_required_words"]

    def test_lsh_band_calibration_default_matches_oracle(self):
        import inspect

        from cdc_extractor_spark.functions import dedup
        from cdc_extractor_spark.queries import ORACLES

        sig = inspect.signature(dedup.lsh_band_calibration)
        assert sig.parameters["good_bp"].default == 7000
        assert ">= 7000" in ORACLES["lsh_band_calibration"]
