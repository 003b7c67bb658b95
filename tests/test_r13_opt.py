"""Focused tests for the round-13 OPTIMIZATION rewrites (contract:
an optimization that changes an operator's internals gets its own
test).  Each pins the rewritten form against the naive/previous
formulation on data small enough to compute both ways.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from cdc_extractor_spark.session import get_session

    return get_session(app_name="test_r13_opt")


SF = "/root/testdata/sf0.001"


class TestBasketPairs:
    """order_baskets/basket_pairs (graph.py) replaced the distinct
    (order, part) incidence self-join: the pair MULTISET must match the
    naive join exactly — one row per (order, unordered pair)."""

    def _lineitem(self, spark):
        rows = [
            # order 1: parts 3,1,2 (+ duplicate part 1) -> 3 pairs
            (1, 3), (1, 1), (1, 2), (1, 1),
            # order 2: singleton basket -> no pairs
            (2, 9),
            # order 3: two parts -> one pair
            (3, 7), (3, 5),
            # order 4: four distinct parts -> six pairs
            (4, 4), (4, 8), (4, 6), (4, 2),
        ]
        return spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        )

    def _naive_pairs(self, li):
        op = li.select("l_orderkey", "l_partkey").distinct()
        a = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part1")
        )
        b = op.select(
            F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part2")
        )
        return (
            a.join(b, "k")
            .filter(F.col("part1") < F.col("part2"))
            .select("part1", "part2")
        )

    def test_pair_multiset_matches_naive_join(self, spark):
        from cdc_extractor_spark.operators import graph

        li = self._lineitem(spark)
        got = sorted(
            tuple(r)
            for r in graph.basket_pairs(graph.order_baskets(li)).collect()
        )
        want = sorted(tuple(r) for r in self._naive_pairs(li).collect())
        assert got == want
        # multiplicity: (2,4) and (5,7) style pairs appear once per
        # qualifying order, never deduped across orders
        assert len(got) == 3 + 0 + 1 + 6

    def test_max_basket_cap_and_node_limit(self, spark):
        from cdc_extractor_spark.operators import graph

        li = self._lineitem(spark)
        # cap at 3 distinct parts drops order 4 entirely
        capped = graph.basket_pairs(graph.order_baskets(li, max_basket=3))
        assert sorted(tuple(r) for r in capped.collect()) == [
            (1, 2), (1, 3), (2, 3), (5, 7)
        ]
        # node_limit filters parts BEFORE the cap: order 4 keeps
        # parts < 5 -> basket {2, 4} -> one pair
        limited = graph.order_baskets(li, max_basket=3, node_limit=5)
        got = sorted(tuple(r) for r in graph.basket_pairs(limited).collect())
        assert (2, 4) in got

    def test_edges_are_symmetric_distinct(self, spark):
        from cdc_extractor_spark.operators import graph

        li = self._lineitem(spark)
        edges = {tuple(r) for r in graph.copurchase_edges(li).collect()}
        pairs = {tuple(r) for r in self._naive_pairs(li).distinct().collect()}
        want = pairs | {(b, a) for a, b in pairs}
        assert edges == want


class TestSimhashFlagForm:
    """simhash folded its per-bit votes into one aggregate: pin the
    fingerprint against a pure-Python replay of the definition."""

    P = 2_147_483_647

    def _py_simhash(self, text: str, bits: int = 16) -> int:
        votes = [0] * bits
        counts: dict[str, int] = {}
        for tok in text.split(" "):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
        for tok, cnt in counts.items():
            tid = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % self.P
            hv = (tid * 2654435761 + 40503) % self.P
            for b in range(bits):
                votes[b] += cnt if (hv >> b) & 1 else -cnt
        return sum(1 << b for b in range(bits) if votes[b] > 0)

    def test_matches_python_reference(self, spark):
        from cdc_extractor_spark.functions import dedup

        rows = [
            (0, "the quick brown fox"),
            (1, "the quick brown fox"),
            (2, "a a a repeated token stream a"),
            (3, "completely different vocabulary here"),
            (4, "singleword"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        for doc_id, text in rows:
            assert got[doc_id] == self._py_simhash(text), doc_id
        assert got[0] == got[1]  # identical docs, identical fingerprints


class TestTrigramStream:
    """_token_trigram_stream (window form) must emit exactly the
    exploded _token_trigrams array, carry columns intact."""

    def test_stream_equals_array_explode(self, spark):
        from cdc_extractor_spark.functions.text import (
            _token_trigram_stream,
            _token_trigrams,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
        got = sorted(
            tuple(r)
            for r in _token_trigram_stream(docs, carry=["lang"]).collect()
        )
        want = sorted(
            tuple(r)
            for r in docs.select(
                "doc_id", "lang", F.explode(_token_trigrams()).alias("s")
            ).select("doc_id", "lang", "s").collect()
        )
        assert got == want and len(got) > 0

    def test_short_docs_emit_nothing(self, spark):
        from cdc_extractor_spark.functions.text import _token_trigram_stream

        docs = spark.createDataFrame(
            [(0, "one two"), (1, ""), (2, "a b c")],
            "doc_id long, text string",
        )
        rows = _token_trigram_stream(docs).collect()
        assert [tuple(r) for r in rows] == [(2, "a b c")]


class TestCCAqeScope:
    """connected_components scopes AQE off for work-term-sized loops:
    the session conf must be RESTORED afterwards, and results must be
    identical to the always-AQE path."""

    def test_conf_restored_and_labels_stable(self, spark):
        from cdc_extractor_spark.functions import dedup

        key = "spark.sql.adaptive.enabled"
        before = spark.conf.get(key)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (5, 1)],
            "doc_a long, doc_b long",
        )
        labels = {
            tuple(r) for r in dedup.connected_components(pairs).collect()
        }
        assert spark.conf.get(key) == before
        assert labels == {
            (1, 1), (2, 1), (3, 1), (5, 1), (10, 10), (11, 10)
        }
