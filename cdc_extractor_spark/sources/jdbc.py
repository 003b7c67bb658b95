"""JDBC change-log source — the production form of A1.

Reference analog: ``Client.java:51-65`` builds one JDBC connection per
thread to Postgres; the coordinator polls ``max(event_id)``
(``CoordinatorRunnable.java:35-42,84-94``) and workers range-scan
``(lo, hi]`` (``WorkerRunnable.java:93-94,117-119``).

Spark-first: one ``spark.read.jdbc`` with ``partitionColumn/lowerBound/
upperBound/numPartitions`` issues the N disjoint range scans the
reference hand-rolled with threads (A15), with predicate pushdown into
the remote database.  The poll loop (``poll_tasks``) is the §3.2
coordinator as a pure generator over high-water marks — the streaming
pipeline consumes it as its offset resolver.

No database exists in this environment: ``read_changes_jdbc`` builds
the reader (options are inspectable) but executing it requires a live
server + driver jar; everything pure — option construction, task
generation, range algebra — is unit-tested (tests/test_sources.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class JdbcChangeLog:
    """Connection + layout of the audit change log (SURVEY.md §1.2)."""

    url: str                      # e.g. jdbc:postgresql://host:5432/db
    table: str = "audit.logged_actions"
    offset_col: str = "event_id"  # monotonic log sequence
    user: str | None = None
    password: str | None = None
    fetch_size: int = 10_000


def reader_options(
    cfg: JdbcChangeLog, lo: int, hi: int, num_partitions: int
) -> dict[str, str]:
    """The exact option map for a partitioned ``(lo, hi]`` range scan.

    ``dbtable`` is a pushdown subquery so the range predicate runs
    remotely (the reference interpolated the same predicate into its
    SQL — WorkerRunnable.java:93 — we bind it structurally instead);
    Spark then splits [lowerBound, upperBound) into ``num_partitions``
    strides on ``partitionColumn`` — one remote cursor per partition,
    the A15 worker fan-out.
    """
    sub = (
        f"(SELECT * FROM {cfg.table} "
        f"WHERE {cfg.offset_col} > {int(lo)} AND {cfg.offset_col} <= {int(hi)}) t"
    )
    opts = {
        "url": cfg.url,
        "dbtable": sub,
        "partitionColumn": cfg.offset_col,
        "lowerBound": str(int(lo) + 1),
        "upperBound": str(int(hi) + 1),  # Spark's upperBound is exclusive
        "numPartitions": str(max(1, num_partitions)),
        "fetchsize": str(cfg.fetch_size),
    }
    if cfg.user is not None:
        opts["user"] = cfg.user
    if cfg.password is not None:
        opts["password"] = cfg.password
    return opts


def read_changes_jdbc(
    spark: SparkSession,
    cfg: JdbcChangeLog,
    lo: int,
    hi: int,
    num_partitions: int = 8,
):
    """Build the partitioned range-scan reader.  Returns the configured
    ``DataFrameReader`` — call ``.load()`` against a live server (JDBC
    schema resolution connects immediately, so even plan construction
    needs the database)."""
    reader = spark.read.format("jdbc")
    for k, v in reader_options(cfg, lo, hi, num_partitions).items():
        reader = reader.option(k, v)
    return reader


def poll_tasks(
    high_water_marks: Iterator[int], start: int = 0, max_batch: int | None = None
) -> Iterator[tuple[int, int]]:
    """§3.2 coordinator as a pure generator: fold a stream of observed
    ``max(event_id)`` values into contiguous ``(lo, hi]`` tasks.

    ``max_batch`` caps a task's width (the ``maxOffsetsPerTrigger``
    analog; the reference had no cap — a burst produced one giant
    task).  Non-advancing polls yield nothing, exactly the
    ``newMax > maxSeqID`` guard at CoordinatorRunnable.java:87.
    """
    lo = start
    for hwm in high_water_marks:
        while hwm > lo:
            hi = min(hwm, lo + max_batch) if max_batch else hwm
            yield (lo, hi)
            lo = hi
