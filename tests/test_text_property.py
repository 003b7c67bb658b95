"""Property-based checks (hypothesis) for the corpus-hygiene operators:
on arbitrary word-soup corpora, chunking conserves tokens and respects
boundary locality, the hash split is a pure function of doc_id, and
repetition stats match a direct Python fold."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_extractor_spark.functions import text

_WORDS = ["scan", "join", "merge", "sort", "the", "a", "batch", "row"]

_corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),            # doc_id
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=30),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _df(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(ws), "en", "src", len(" ".join(ws))) for i, ws in corpus],
        DOC_SCHEMA,
    )


@given(_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_chunking_conserves_tokens(spark, corpus):
    docs = _df(spark, corpus)
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_tokens"]
        for r in text.content_defined_chunks(docs).collect()
    }
    per_doc = Counter()
    for (d, _), n in got.items():
        per_doc[d] += n
    assert per_doc == Counter({i: len(ws) for i, ws in corpus})


@given(_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_split_is_pure_function_of_doc_id(spark, corpus):
    docs = _df(spark, corpus)
    want = {}
    for i, _ in corpus:
        b = ((i * 1103515245 + 12345) % 2147483647) % 1000
        want[i] = "train" if b < 800 else ("val" if b < 900 else "test")
    got = {
        r["doc_id"]: r["split"]
        for r in text.train_val_test_split(docs).collect()
    }
    assert got == want


@given(_corpus)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_stats_match_python_fold(spark, corpus):
    docs = _df(spark, corpus)
    rows = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    for i, ws in corpus:
        c = Counter(ws)
        n = len(ws)
        assert rows[i]["n_tokens"] == n
        assert rows[i]["top_tok_bp"] == (max(c.values()) * 10000) // n
        assert rows[i]["distinct_bp"] == (len(c) * 10000) // n



# --------------------------------------------------------------------------
# Round-5 helpers: the exact-rank / ntile closed forms (hypothesis)
# --------------------------------------------------------------------------

_rank_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1_000),              # id
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(_rank_rows, st.integers(min_value=1, max_value=7))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bucketed_rank_and_ntile_match_window_forms(spark, rows, n_tiles):
    """On arbitrary (possibly NULL-keyed, tied, empty) frames the
    bucketed two-pass rank equals row_number() over the global window
    and ntile_from_rank equals F.ntile over the same order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cdc_extractor_spark.partitioning import (
        bucketed_global_rank,
        ntile_from_rank,
    )

    df = spark.createDataFrame(rows, "id long, v long")
    totals: dict = {}
    ranked = bucketed_global_rank(
        df, "v", ["id"], n_buckets=4, totals_out=totals
    )
    got = {r["id"]: r["_rank"] for r in ranked.collect()}
    w = Window.orderBy("v", "id")
    want_rows = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.ntile(n_tiles).over(w).alias("nt"),
    ).collect()
    assert got == {r["id"]: r["rn"] for r in want_rows}
    if rows:
        assert totals == {(): len(rows)}
        tiles = {
            r["id"]: r["t"]
            for r in ranked.select(
                "id", ntile_from_rank("_rank", n_tiles, len(rows)).alias("t")
            ).collect()
        }
        assert tiles == {r["id"]: r["nt"] for r in want_rows}
