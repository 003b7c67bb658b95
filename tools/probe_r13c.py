"""Optimization-round A/B probe (r13): same-session, interleaved
min-of-N comparison of candidate operator forms — the only measurement
that survives this host's 2x noise waves (cross-session A/Bs flapped).

Axes:
  simhash   — shipped explode(bits)+double-pow form vs single-aggregate
              flag form (bits conditional sums, integer bit tests).
  cc_edges  — shipped edge layout (distinct -> checkpoint, loop join
              re-exchanges edges every round) vs b-partitioned single
              exchange (dropDuplicates rides subset partitioning,
              localCheckpoint preserves the layout).

Usage: python tools/probe_r13c.py [--reps N] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPS = 3
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(build, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _toks(documents: DataFrame) -> DataFrame:
    from cdc_extractor_spark.functions.dedup import MINHASH_P, _portable_hash_id

    toks = (
        documents.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return toks.withColumn(
        "hv",
        (_portable_hash_id("tok") * 2654435761 + 40503) % F.lit(MINHASH_P),
    )


def simhash_old(documents: DataFrame, bits: int = 16) -> DataFrame:
    hashed = _toks(documents)
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    votes = (
        hashed.select("doc_id", "cnt", "hv", bit)
        .withColumn(
            "vote",
            F.when(
                (F.floor(F.col("hv") / F.pow(F.lit(2), F.col("b"))).cast("long") % 2)
                == 1,
                F.col("cnt"),
            ).otherwise(-F.col("cnt")),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.pow(F.lit(2), F.col("b")).cast("long")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def simhash_new(documents: DataFrame, bits: int = 16) -> DataFrame:
    hashed = _toks(documents)
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.col("hv").bitwiseAND(F.lit(1 << b)) != 0, F.col("cnt")
                ).otherwise(-F.col("cnt"))
            ).alias(f"_v{b}")
            for b in range(bits)
        ]
    )
    fingerprint = sum(
        (
            F.when(F.col(f"_v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(bits)
        ),
        F.lit(0),
    )
    return votes.select("doc_id", fingerprint.cast("long").alias("simhash"))


def _cc(pairs: DataFrame, prepartition: bool):
    """connected_components with the edge layout toggled; mirrors
    functions/dedup.py exactly otherwise."""
    from cdc_extractor_spark.functions.dedup import _min_label_fixpoint
    from cdc_extractor_spark.partitioning import (
        data_proportional_partitions,
        scoped_shuffle_partitions,
    )

    pairs = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    und = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    n_pairs = pairs.count()
    loop_parts = data_proportional_partitions(
        2 * n_pairs,
        parallelism=pairs.sparkSession.sparkContext.defaultParallelism,
    )
    if prepartition:
        edges = (
            sym.repartition(loop_parts, "b")
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
    else:
        edges = sym.distinct().localCheckpoint(eager=True)
    with scoped_shuffle_partitions(pairs.sparkSession, loop_parts):
        labels = _min_label_fixpoint(edges, 20)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def main() -> None:
    reps = REPS
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from cdc_extractor_spark.functions import dedup
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="probe_r13c")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet")

    # warm
    docs.groupBy().count().write.format("noop").mode("overwrite").save()

    print(f"sf_dir={SF} reps={reps} (interleaved, min-of-N)")
    t_old = timed(lambda: simhash_old(docs), reps)
    t_new = timed(lambda: simhash_new(docs), reps)
    t_old2 = timed(lambda: simhash_old(docs), reps)
    t_new2 = timed(lambda: simhash_new(docs), reps)
    print(
        f"simhash: old {min(t_old, t_old2):.2f}s new {min(t_new, t_new2):.2f}s"
        f"  (passes: old {t_old:.2f}/{t_old2:.2f}, new {t_new:.2f}/{t_new2:.2f})"
    )
    # parity between forms
    a = {tuple(r) for r in simhash_old(docs).collect()}
    b = {tuple(r) for r in simhash_new(docs).collect()}
    print(f"simhash parity: {'EXACT' if a == b else 'MISMATCH'} ({len(a)} rows)")

    def cc_run(pre: bool):
        pairs = dedup.record_linkage_blocked(part).select(
            F.col("a_key").alias("doc_a"), F.col("b_key").alias("doc_b")
        )
        cs = _cc(pairs, pre).groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size")
        )
        return cs.groupBy("cluster_size").agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_id").alias("sum_min_keys"),
        )

    t_old = timed(lambda: cc_run(False), reps)
    t_new = timed(lambda: cc_run(True), reps)
    t_old2 = timed(lambda: cc_run(False), reps)
    t_new2 = timed(lambda: cc_run(True), reps)
    print(
        f"cc(er graph): old {min(t_old, t_old2):.2f}s new {min(t_new, t_new2):.2f}s"
        f"  (passes: old {t_old:.2f}/{t_old2:.2f}, new {t_new:.2f}/{t_new2:.2f})"
    )
    a = {tuple(r) for r in cc_run(False).collect()}
    b = {tuple(r) for r in cc_run(True).collect()}
    print(f"cc parity: {'EXACT' if a == b else 'MISMATCH'} ({len(a)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
