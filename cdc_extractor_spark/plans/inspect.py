"""Physical-plan inspection — the engine's scale-review surface.

The reference has no optimizer to inspect (SURVEY.md §4.1: every query
is a SQL string planned by PostgreSQL on the far side of JDBC).  On
Spark the plan IS the scale contract: whether a filter reached the
parquet scan, whether a dim join broadcast, whether codegen fused the
pipeline.  These helpers expose that contract to tests
(tests/test_plans.py) and to interactive review — SURVEY.md §7 step 5
("scale hardening enforced by plan review, not fixture size").

Gotcha pinned here once: with AQE enabled, ``executedPlan`` prints
``AdaptiveSparkPlan isFinalPlan=false`` until an action has run, and
codegen stages appear as ``*(n)`` markers rather than the literal
string "WholeStageCodegen".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (pre-execution: AQE not yet final)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` output — includes per-scan ``PushedFilters``,
    ``PartitionFilters`` and ``ReadSchema`` detail lines."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every ``PushedFilters: [...]`` line content across the plan's
    scans — empty means no predicate reached any file source."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Every scan's ``ReadSchema`` line — the columns actually decoded
    from parquet (column pruning check: a 2-column projection must not
    read the full table width)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.removeprefix("ReadSchema:").strip())
    return out
