"""Skew mitigation utilities (SURVEY.md §7 step 5 / SCALE.md).

AQE's skew-join splitting covers joins; a skewed *aggregation* key
(one user producing most of the feed — common in CDC: one hot table)
still funnels one reducer.  ``salted_agg`` is the standard two-stage
fix: spray the hot key over ``n_salts`` partial groups, then merge.
Results are identical to the direct aggregation for any associative
measure set; identity is pinned in tests/test_robustness.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``measures`` maps output name → (merge_fn_name, partial_expr);
    merge_fn must be associative ('sum', 'max', 'min').  Example::

        salted_agg(events, ["event_type"],
                   {"n": ("sum", F.count(F.lit(1))),
                    "max_id": ("max", F.max("event_id"))})

    Stage 1 groups on (keys + salt) — the hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the tiny partials.  Two
    shuffles, but the first is balanced and the second is O(groups ×
    n_salts) rows.
    """
    salt = (F.crc32(F.concat_ws("\x00", *[F.col(k) for k in keys])) + F.spark_partition_id()) % n_salts
    partial = df.withColumn("_salt", salt.cast("int")).groupBy(
        *keys, "_salt"
    ).agg(*[expr.alias(name) for name, (_, expr) in measures.items()])
    merged = partial.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn)(F.col(name)).alias(name)
            for name, (merge_fn, _) in measures.items()
        ]
    )
    return merged


def skew_split_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_fraction: float = 0.001,
) -> DataFrame:
    """Hot-key-isolation join: keys carrying more than ``hot_fraction``
    of the fact rows join via a broadcast of their dimension subset;
    the cold remainder takes the normal shuffle join; results union.

    Semantically identical to ``fact.join(dim, key)`` for any key
    distribution — pinned by the registry oracle.  This is the manual
    form of AQE's skew-join split, needed when skew hides from AQE
    (e.g. the skewed side is the *output* of an upstream stage whose
    stats are stale, or the join is a stream-static join where AQE
    cannot re-plan).  The hot-key set is a 1-row-per-key broadcast,
    never a driver collect.
    """
    total = fact.agg(F.count(F.lit(1)).alias("n"))
    hot_keys = (
        fact.groupBy(key)
        .agg(F.count(F.lit(1)).alias("kn"))
        .crossJoin(F.broadcast(total))
        .where(F.col("kn") >= F.col("n") * hot_fraction)
        .select(key)
    )
    fact_hot = fact.join(F.broadcast(hot_keys), key, "left_semi")
    fact_cold = fact.join(F.broadcast(hot_keys), key, "left_anti")
    dim_hot = dim.join(F.broadcast(hot_keys), key, "left_semi")
    return fact_hot.join(F.broadcast(dim_hot), key).unionByName(
        fact_cold.join(dim, key)
    )


def join_key_skew_audit(
    tables: dict[str, DataFrame], keys: list[tuple[str, str]]
) -> DataFrame:
    """Shuffle-key skew audit — the measurement behind every skew
    decision in this repo (salting here, AQE skew-join splits, the
    broadcast-vs-shuffle choice): for each candidate join/aggregation
    key, how concentrated are its rows?  Emitted per key: row and
    distinct-key counts, the heaviest key's row count and permille
    share, the top-10 keys' combined rows, and the heaviest key's
    multiple of the average key (permille) — >> 1000 means one reducer
    partition will run long no matter how many partitions you give the
    shuffle, i.e. exactly when ``salted_agg`` / skew-split pays.

    NULL keys are excluded (they never match an equi-join anyway;
    their volume shows up in fk_orphan_audit instead).

    Plan shape (scale): per key one hash aggregate to (key, count) —
    map-side partials do the heavy lifting — then a |keys|-sized
    roll-up plus a TakeOrdered(10) over the counts (never a global
    sort); the per-key results union into |keys| rows.  Tie-break for
    the top-10 boundary is (count DESC, key ASC) in the key's native
    type, mirrored in the oracle."""
    outs = []
    for tbl_name, col in keys:
        counts = (
            tables[tbl_name]
            .select(F.col(col).alias("k"))
            .filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("kn"))
        )
        stats = counts.agg(
            F.lit(f"{tbl_name}.{col}").alias("join_key"),
            F.sum("kn").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("kn").cast("long").alias("top1_rows"),
            F.expr("CAST((1000 * max(kn)) div sum(kn) AS BIGINT)").alias(
                "top1_share_permille"
            ),
            F.expr(
                "CAST((1000 * max(kn) * count(*)) div sum(kn) AS BIGINT)"
            ).alias("top1_x_avg_permille"),
        )
        top10 = (
            counts.orderBy(F.desc("kn"), F.asc("k"))
            .limit(10)
            .agg(F.sum("kn").cast("long").alias("top10_rows"))
        )
        outs.append(stats.crossJoin(top10))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "join_key", "n_rows", "n_keys", "top1_rows",
        "top1_share_permille", "top10_rows", "top1_x_avg_permille",
    )
