"""Run every oracle-backed query in the registry against DuckDB at
sf0.001 — the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from tests.oracle_check import compare, duckdb_conn


def _registry():
    from cdc_extractor_spark.queries import ORACLES, QUERIES

    return QUERIES, ORACLES


def _oracle_names():
    _, oracles = _registry()
    return sorted(oracles)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, sf_dir, con, name):
    queries, oracles = _registry()
    df = queries[name](spark, sf_dir)
    compare(df, con, oracles[name], name)


def test_rows_only_queries_run(spark, sf_dir):
    queries, oracles = _registry()
    for name in sorted(set(queries) - set(oracles)):
        df = queries[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema) == 7
