"""Hypothesis property tests for the round-12 operators:
gopher_required_words against a pure-Python reference on arbitrary
word-soup documents (including required-word-free and repeated-word
corners the fixture never hits), and merge_conflict_report's conflict
arithmetic against a reference over random cluster assignments."""

from __future__ import annotations

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


class TestGopherRequiredWordsProperties:
    @given(docs=st.lists(_doc_words, min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_matches_python_reference(self, spark, docs):
        from cdc_extractor_spark.functions import text

        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               text.gopher_required_words(df).collect()}
        assert set(got) == set(range(len(docs)))
        for i, ws in enumerate(docs):
            low = [w.lower() for w in ws]
            present = {w for w in low if w in _REQ}
            r = got[i]
            assert r["n_tokens"] == len(ws)
            assert r["required_hits"] == sum(1 for w in low if w in _REQ)
            assert r["n_required_words"] == len(present)
            assert r["pass_required_words"] == (len(present) >= 2)


@st.composite
def clustered_docs(draw):
    """(components rows, documents rows): 1-4 clusters of 2-5 members
    with random lang/source/n_chars — ties in n_chars included so the
    doc_id tie-break is exercised."""
    comp, docs = [], []
    doc_id = 0
    for c in range(draw(st.integers(1, 4))):
        for _ in range(draw(st.integers(2, 5))):
            comp.append((doc_id, c))
            docs.append(
                (
                    doc_id,
                    f"t{doc_id}",
                    draw(st.sampled_from(["en", "fr", "zh"])),
                    draw(st.sampled_from(["s0", "s1"])),
                    draw(st.integers(5, 8)),  # narrow range forces ties
                )
            )
            doc_id += 1
    return comp, docs


class TestMergeConflictProperties:
    @given(data=clustered_docs())
    @settings(**SETTINGS)
    def test_matches_python_reference(self, spark, data):
        from cdc_extractor_spark.functions import dedup

        comp_rows, doc_rows = data
        comp = spark.createDataFrame(
            comp_rows, "doc_id long, cluster_id long"
        )
        docs = spark.createDataFrame(
            doc_rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        got = {r["cluster_id"]: r for r in
               dedup.merge_conflict_report(comp, docs).collect()}
        by_doc = {d[0]: d for d in doc_rows}
        clusters: dict[int, list[int]] = {}
        for doc_id, cid in comp_rows:
            clusters.setdefault(cid, []).append(doc_id)
        assert set(got) == set(clusters)
        for cid, members in clusters.items():
            # survivorship rule: longest n_chars, then lowest doc_id
            canon = min(members, key=lambda d: (-by_doc[d][4], d))
            langs = {by_doc[d][2] for d in members}
            sources = {by_doc[d][3] for d in members}
            chars = [by_doc[d][4] for d in members]
            r = got[cid]
            assert r["canonical_doc_id"] == canon
            assert r["n_members"] == len(members)
            assert r["n_langs"] == len(langs)
            assert r["n_sources"] == len(sources)
            assert r["lang_conflicts"] == sum(
                1 for d in members if by_doc[d][2] != by_doc[canon][2]
            )
            assert r["source_conflicts"] == sum(
                1 for d in members if by_doc[d][3] != by_doc[canon][3]
            )
            assert r["chars_spread"] == max(chars) - min(chars)
