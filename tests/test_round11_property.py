"""Hypothesis property tests for the round-11 operators: the
token-budget solver's exact-arithmetic invariants under arbitrary
domain/token distributions, and line-format flag bounds under
arbitrary word-soup documents."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = st.text(alphabet="abcdefg", min_size=1, max_size=5)


@st.composite
def domain_corpora(draw):
    """(doc_id, text, source) rows over 1-6 srcN domains with wildly
    uneven token supplies."""
    n_domains = draw(st.integers(1, 6))
    rows = []
    doc_id = 0
    for d in range(n_domains):
        n_docs = draw(st.integers(1, 4))
        for _ in range(n_docs):
            n_tok = draw(st.integers(1, 30))
            words = draw(
                st.lists(_WORDS, min_size=n_tok, max_size=n_tok)
            )
            rows.append((doc_id, " ".join(words), f"src{d}"))
            doc_id += 1
    return rows


class TestTokenBudgetRebalancerProperties:
    @given(rows=domain_corpora())
    @settings(**SETTINGS)
    def test_solver_invariants(self, spark, rows):
        from cdc_extractor_spark.functions import text

        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = text.token_budget_rebalancer(df).collect()
        assert len(out) == len({r[2] for r in rows})
        # feasibility: no quota exceeds its domain's supply
        assert all(r["keep_tokens"] <= r["n_tokens"] for r in out)
        # at least one binding domain, and every binding domain's cap
        # equals the shared budget recomputed from the rows
        budget = min(
            r["n_tokens"] * 10000 // r["target_bp"] for r in out
        )
        for r in out:
            assert r["keep_tokens"] == budget * r["target_bp"] // 10000
            assert r["binding"] == (
                r["n_tokens"] * 10000 // r["target_bp"] == budget
            )
        assert any(r["binding"] for r in out)
        # mixture: realized_bp within one floor step of target share
        tot_keep = sum(r["keep_tokens"] for r in out)
        if tot_keep > 0:
            assert sum(r["realized_bp"] for r in out) <= 10000
            for r in out:
                assert (
                    r["realized_bp"]
                    == r["keep_tokens"] * 10000 // tot_keep
                )

    @given(rows=domain_corpora())
    @settings(**SETTINGS)
    def test_maximality(self, spark, rows):
        """B is the LARGEST feasible budget: B+1 must violate at least
        one domain's supply (the defining property of the solver)."""
        from cdc_extractor_spark.functions import text

        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = text.token_budget_rebalancer(df).collect()
        budget = min(
            r["n_tokens"] * 10000 // r["target_bp"] for r in out
        )
        # B is maximal in the raw allocation: for the binding domain,
        # (B+1) * w exceeds the supply's 10000-scaled tokens (the
        # floored token quota may coincide, so assert at bp scale)
        violated = any(
            (budget + 1) * r["target_bp"] > r["n_tokens"] * 10000
            for r in out
        )
        assert violated


class TestDocLineFormatFlagsProperties:
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(0, 10_000),
                st.lists(_WORDS, min_size=1, max_size=40),
            ),
            min_size=1,
            max_size=6,
            unique_by=lambda t: t[0],
        )
    )
    @settings(**SETTINGS)
    def test_bounds_and_flag_consistency(self, spark, docs):
        from cdc_extractor_spark.functions import text

        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in docs],
            "doc_id long, text string",
        )
        out = text.doc_line_format_flags(df).collect()
        by_id = {r["doc_id"]: r for r in out}
        for i, ws in docs:
            r = by_id[i]
            assert r["n_lines"] == len(ws)
            assert 0 <= r["bullet_bp"] <= 10000
            assert 0 <= r["ellipsis_bp"] <= 10000
            assert r["ok_bullet"] == (r["bullet_bp"] <= 9000)
            assert r["ok_ellipsis"] == (r["ellipsis_bp"] <= 3000)
            assert r["pass_line_format"] == (
                r["ok_bullet"] and r["ok_ellipsis"]
            )
