"""Derived CDC `changes` fixture (FIXTURES.md §2).

The reference extracts audit rows shaped like the 2ndQuadrant
``audit.logged_actions`` record (SURVEY.md §1.2: 17 positional columns,
``WorkerRunnable.java:206``; xid at position 9, ``:130``).  To test the
Group B operators (snapshot reconstruction, delete handling, demux)
with a checkable ground truth, we derive a deterministic change stream
from the ``customer`` and ``orders`` fixtures — every rule is pure
integer arithmetic, so the *same* stream is expressible as a DuckDB CTE
(``CHANGES_CTE``) and the oracle can verify end-to-end.

Per source row with key ``k``:
- it emits ``1 + (k % m)`` change events (``m``: 4 for customer, 3 for
  orders) with ``seq = 0..k%m``;
- ``event_id = offset + k*8 + seq`` (monotonic, unique across tables);
- ``transaction_id = event_id div 3`` (several events per txn — this is
  what exercises distinct-xids + commit-ts grouping, A6-A8);
- ``commit_ts_ms = 2024-01-01 + transaction_id seconds``, monotone in
  txn id exactly like the reference's ``pg_xact_commit_timestamp``;
- action cycle: first event ``I``, last event ``D`` iff the key's cycle
  length is maximal, ``U`` otherwise — so some keys end deleted
  (customer: ``k%4==3``; orders: ``k%3==2``).

Scale: the generator is a narrow ``explode`` over the base scan — no
shuffle; at 100 TB the real change feed arrives from the streaming
source instead (streaming/pipeline.py) and every Group B operator below
consumes it unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

BASE_MS = 1_704_067_200_000  # epoch ms of 2024-01-01 00:00:00 UTC
ORDERS_OFFSET = 10_000_000


def _stream(
    df: DataFrame,
    key_col: str,
    val_col: str,
    table_name: str,
    cycle_mod: int,
    id_offset: int,
) -> DataFrame:
    delete_seq = cycle_mod - 1
    fanned = df.select(
        F.col(key_col).alias("key"),
        F.col(val_col).alias("val"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), (F.col(key_col) % cycle_mod).cast("long"))
        ).alias("seq"),
    )
    return fanned.select(
        (F.lit(id_offset) + F.col("key") * 8 + F.col("seq")).alias("event_id"),
        F.lit(table_name).alias("table_name"),
        F.expr(f"({id_offset} + key * 8 + seq) div 3").alias("transaction_id"),
        (
            F.lit(BASE_MS) + F.expr(f"({id_offset} + key * 8 + seq) div 3") * 1000
        ).alias("commit_ts_ms"),
        F.when(F.col("seq") == 0, F.lit("I"))
        .when(F.col("seq") == delete_seq, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("action"),
        F.col("key"),
        (F.round(F.col("val") * 100).cast("long") + F.col("seq")).alias("val_cents"),
    )


def changes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The interleaved multi-table change stream (customer + orders)."""
    cust = _stream(
        load_table(spark, sf_dir, "customer"), "c_custkey", "c_acctbal", "customer", 4, 0
    )
    orders = _stream(
        load_table(spark, sf_dir, "orders"),
        "o_orderkey",
        "o_totalprice",
        "orders",
        3,
        ORDERS_OFFSET,
    )
    return cust.unionByName(orders)


def changes_with_row_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit-record shape with the hstore-analog MapType payload
    (SURVEY.md §1.2 cols 15-16) — used by the sink/demux tests; map
    columns stay out of hash-compared oracle outputs."""
    df = changes_df(spark, sf_dir)
    return df.withColumn(
        "row_data",
        F.create_map(
            F.lit("key"),
            F.col("key").cast("string"),
            F.lit("val_cents"),
            F.col("val_cents").cast("string"),
        ),
    ).withColumn(
        "changed_fields",
        F.when(
            F.col("action") == "U",
            F.create_map(F.lit("val_cents"), F.col("val_cents").cast("string")),
        ),
    ).withColumn("statement_only", F.lit(False))


# DuckDB oracle-side equivalent of changes_df — identical arithmetic.
CHANGES_CTE = f"""
WITH changes AS (
  SELECT c_custkey * 8 + u.seq AS event_id,
         'customer' AS table_name,
         (c_custkey * 8 + u.seq) // 3 AS transaction_id,
         {BASE_MS} + ((c_custkey * 8 + u.seq) // 3) * 1000 AS commit_ts_ms,
         CASE WHEN u.seq = 0 THEN 'I' WHEN u.seq = 3 THEN 'D' ELSE 'U' END AS action,
         c_custkey AS key,
         CAST(round(c_acctbal * 100) AS BIGINT) + u.seq AS val_cents
  FROM customer, unnest(range(0, CAST(c_custkey % 4 AS BIGINT) + 1)) AS u(seq)
  UNION ALL
  SELECT {ORDERS_OFFSET} + o_orderkey * 8 + u.seq,
         'orders',
         ({ORDERS_OFFSET} + o_orderkey * 8 + u.seq) // 3,
         {BASE_MS} + (({ORDERS_OFFSET} + o_orderkey * 8 + u.seq) // 3) * 1000,
         CASE WHEN u.seq = 0 THEN 'I' WHEN u.seq = 2 THEN 'D' ELSE 'U' END,
         o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) + u.seq
  FROM orders, unnest(range(0, CAST(o_orderkey % 3 AS BIGINT) + 1)) AS u(seq)
)
"""
