"""Hypothesis property tests for the round-13 operators:
cluster_size_report against a pure-Python bucket rollup on arbitrary
cluster-size multisets (every bucket boundary exercised), and
required_word_coverage against a pure-Python corpus marginal on
word-soup documents (case variants, required-free docs, repeated
words)."""

from __future__ import annotations

from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_REQ = ("the", "be", "to", "of", "and", "that", "have", "with")
_VOCAB = _REQ + ("The", "AND", "cat", "dog", "bee", "xyzzy", "a", "thee")

_doc_words = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=25)

# boundary-heavy size pool: every CASE-arm edge (2,3,4,5,8,9,16,17)
# plus interior points
_SIZES = st.lists(
    st.sampled_from([2, 3, 4, 5, 7, 8, 9, 12, 16, 17, 23]),
    min_size=1,
    max_size=8,
)


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


class TestClusterSizeReportProperties:
    @given(sizes=_SIZES)
    @settings(**SETTINGS)
    def test_matches_python_reference(self, spark, sizes):
        from cdc_extractor_spark.functions import dedup

        rows, nid = [], 0
        for cid, sz in enumerate(sizes):
            for _ in range(sz):
                rows.append((nid, cid))
                nid += 1
        comp = spark.createDataFrame(rows, "doc_id long, cluster_id long")
        got = {
            r["size_bucket"]: r
            for r in dedup.cluster_size_report(comp).collect()
        }
        ref = defaultdict(list)
        for sz in sizes:
            ref[_bucket(sz)].append(sz)
        assert set(got) == set(ref)
        for b, members in ref.items():
            assert got[b]["n_clusters"] == len(members)
            assert got[b]["n_docs"] == sum(members)
            assert got[b]["n_removable"] == sum(members) - len(members)
            assert got[b]["max_members"] == max(members)


class TestRequiredWordCoverageProperties:
    @given(docs=st.lists(_doc_words, min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_matches_python_reference(self, spark, docs):
        from cdc_extractor_spark.functions import text

        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["word"]: r for r in text.required_word_coverage(df).collect()
        }
        assert set(got) == set(_REQ)
        low = [[w.lower() for w in ws] for ws in docs]
        n_docs = len(docs)
        for w in _REQ:
            n_with = sum(1 for ws in low if w in ws)
            occ = sum(Counter(ws)[w] for ws in low)
            r = got[w]
            assert r["n_docs"] == n_docs
            assert r["n_docs_with"] == n_with
            assert r["occurrences"] == occ
            assert r["coverage_bp"] == (n_with * 10000) // n_docs
