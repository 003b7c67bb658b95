"""Unit tests for the JDBC change-log source scaffolding (pure parts:
option construction, coordinator task algebra)."""

from __future__ import annotations

from cdc_extractor_spark.sources.jdbc import (
    JdbcChangeLog,
    poll_tasks,
    read_changes_jdbc,
    reader_options,
)

CFG = JdbcChangeLog(url="jdbc:postgresql://localhost:5432/bench", user="u")


def test_reader_options_bind_range_structurally():
    opts = reader_options(CFG, 100, 500, 8)
    assert "event_id > 100" in opts["dbtable"]
    assert "event_id <= 500" in opts["dbtable"]
    assert opts["lowerBound"] == "101"
    assert opts["upperBound"] == "501"  # exclusive bound covers hi itself
    assert opts["numPartitions"] == "8"
    assert "password" not in opts


def test_reader_builds_without_connecting(spark):
    reader = read_changes_jdbc(spark, CFG, 0, 10, 2)
    # configured but unexecuted: .load() is the first point of contact
    assert hasattr(reader, "load")


def test_poll_tasks_matches_coordinator_semantics():
    # polls: no data, burst to 100, flat, advance to 130
    tasks = list(poll_tasks(iter([0, 100, 100, 130]), start=0))
    assert tasks == [(0, 100), (100, 130)]
    # contiguity + half-open coverage
    for (_, hi_prev), (lo, _) in zip(tasks, tasks[1:]):
        assert lo == hi_prev


def test_poll_tasks_caps_batch_width():
    tasks = list(poll_tasks(iter([250]), start=0, max_batch=100))
    assert tasks == [(0, 100), (100, 200), (200, 250)]


def test_poll_tasks_ignores_regressions():
    # a lagging replica reporting a lower hwm must not re-emit ranges
    tasks = list(poll_tasks(iter([100, 90, 110]), start=0))
    assert tasks == [(0, 100), (100, 110)]
