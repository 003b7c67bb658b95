"""Optimization-round A/B probe (r14): same-session, interleaved
min-of-N comparison — the only measurement that survives this host's
noise waves (r13 methodology, tools/probe_r13c.py).

Axes:
  cc        — r13 connected_components (eager localCheckpoint + separate
              count per round = 2 jobs/round) vs r14 lazy-checkpoint
              form (the convergence count materializes the checkpoint =
              1 job/round; same for the pairs sizing count and the
              edges/seed pair).
  substr    — r13 exact_substring_dups (distinct exchange on (doc_id,w)
              + collect_list aggregate exchange on w) vs the REJECTED
              count-aggregate + join-back candidate (spill-safe but its
              broadcast build side re-runs the explode+md5 corpus scan:
              FileScan x2 in the sf0.1 executed plan) vs the shipped
              r14 form (count window on the shared w-exchange:
              spill-safe via the external sorter, one corpus pass).

Usage: python tools/probe_r14.py [--reps N] [--sf DIR] [cc|substr ...]
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


# --- r13 forms, reproduced verbatim for the A side ---------------------


def _fixpoint_r13(edges: DataFrame, max_iters: int) -> DataFrame:
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("_mn"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("_mn")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr = edges.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(
            F.col("a").alias("node"),
            "label",
            F.lit(None).cast("long").alias("old"),
        )
        own = labels.select("node", "label", F.col("label").alias("old"))
        m1 = (
            own.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.min("old").alias("old"))
        )
        lol = m1.select(F.col("node").alias("_ln"), F.col("label").alias("_ll"))
        merged = (
            m1.join(lol, m1["label"] == lol["_ln"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))
                ).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = merged.filter(F.col("label") != F.col("old")).count()
        labels = merged.select("node", "label")
        if changed == 0:
            break
    return labels


def cc_r13(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    from cdc_extractor_spark.partitioning import (
        data_proportional_partitions,
        scoped_shuffle_partitions,
    )

    pairs = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    n_pairs = pairs.count()
    loop_parts = data_proportional_partitions(
        2 * n_pairs,
        parallelism=pairs.sparkSession.sparkContext.defaultParallelism,
    )
    und = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = (
        und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(loop_parts, "b")
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    spark = pairs.sparkSession
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_before = spark.conf.get(aqe_key)
    tiny_loop = loop_parts <= spark.sparkContext.defaultParallelism
    try:
        if tiny_loop:
            spark.conf.set(aqe_key, "false")
        with scoped_shuffle_partitions(spark, loop_parts):
            labels = _fixpoint_r13(edges, max_iters)
    finally:
        spark.conf.set(aqe_key, aqe_before)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def substr_r13(documents: DataFrame, width: int = 40, keep_mod: int = 8):
    wins = (
        documents.where(F.length("text") >= width)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.length("text") - width).cast("long"),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.expr(f"substring(text, CAST(i + 1 AS INT), {width})").alias("w"),
        )
        .where(
            F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
            % keep_mod == 0
        )
        .distinct()
    )
    marked = (
        wins.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.collect_list("doc_id").alias("_docs"),
        )
        .select(
            F.explode("_docs").alias("doc_id"),
            (F.col("_n") >= 2).cast("long").alias("is_dup"),
        )
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("is_dup").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("n_dup_windows * 1000 DIV n_windows").alias("dup_permille"),
        )
    )


def substr_join(documents: DataFrame, width: int = 40, keep_mod: int = 8):
    """The REJECTED r14 candidate: spill-safe count aggregate +
    join-back.  Kept here verbatim because its sf0.1 executed plan
    shows FileScan x2 — AQE's broadcast re-planning of the flag join
    re-executes the whole explode+md5 subtree for the build side
    instead of reusing the w-exchange, i.e. a second corpus pass at
    100 TB."""
    wins = (
        documents.where(F.length("text") >= width)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.length("text") - width).cast("long"),
                )
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.expr(f"substring(text, CAST(i + 1 AS INT), {width})").alias("w"),
        )
        .where(
            F.conv(F.substring(F.md5("w"), 1, 12), 16, 10).cast("long")
            % keep_mod == 0
        )
        .repartition("w")
        .dropDuplicates()
    )
    wcnt = wins.groupBy("w").agg(F.count(F.lit(1)).alias("_n"))
    marked = wins.join(wcnt, "w").select(
        "doc_id", (F.col("_n") >= 2).cast("long").alias("is_dup")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("is_dup").alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("n_dup_windows * 1000 DIV n_windows").alias("dup_permille"),
        )
    )


def main() -> None:
    args = sys.argv[1:]
    reps = REPS
    sf = SF
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]
    axes = args or ["cc", "substr"]

    from cdc_extractor_spark.functions import dedup
    from cdc_extractor_spark.session import get_session

    spark = get_session(
        app_name="probe_r14",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs.count()

    jtracker = spark.sparkContext._jsc.sc().statusTracker()

    def n_jobs() -> int:
        return len(jtracker.getJobIdsForGroup(None))

    if "cc" in axes:
        part = spark.read.parquet(f"{sf}/part.parquet")
        pairs = dedup.record_linkage_blocked(part).select(
            F.col("a_key").alias("doc_a"), F.col("b_key").alias("doc_b")
        ).localCheckpoint()
        pairs.count()

        def A():
            return cc_r13(pairs)

        def B():
            return dedup.connected_components(pairs)

        # parity first
        a = sorted(map(tuple, A().collect()))
        b = sorted(map(tuple, B().collect()))
        print(f"cc parity: {'EXACT' if a == b else 'MISMATCH'} rows={len(a)}")
        timed(A, 1)
        timed(B, 1)
        j0 = n_jobs()
        timed(A, 1)
        ja = n_jobs() - j0 - 1
        j0 = n_jobs()
        timed(B, 1)
        jb = n_jobs() - j0 - 1
        ta, tb = [], []
        for _ in range(reps):
            ta.append(timed(A, 1))
            tb.append(timed(B, 1))
        print(
            f"cc r13(eager+count): min {min(ta):.3f}s jobs/run {ja}  "
            f"reps {[round(x, 3) for x in ta]}"
        )
        print(
            f"cc r14(lazy=1job/rd): min {min(tb):.3f}s jobs/run {jb}  "
            f"reps {[round(x, 3) for x in tb]}"
        )

    if "substr" in axes:
        def A2():
            return substr_r13(docs)

        def B2():
            return substr_join(docs)

        def C2():
            return dedup.exact_substring_dups(docs)

        a = sorted(map(tuple, A2().collect()))
        b = sorted(map(tuple, B2().collect()))
        c = sorted(map(tuple, C2().collect()))
        print(
            f"substr parity: join {'EXACT' if a == b else 'MISMATCH'} / "
            f"window {'EXACT' if a == c else 'MISMATCH'} rows={len(a)}"
        )
        timed(A2, 1)
        timed(B2, 1)
        timed(C2, 1)
        ta, tb, tc = [], [], []
        for _ in range(reps):
            ta.append(timed(A2, 1))
            tb.append(timed(B2, 1))
            tc.append(timed(C2, 1))
        print(
            f"substr r13(collect_list): min {min(ta):.3f}s "
            f"reps {[round(x, 3) for x in ta]}"
        )
        print(
            f"substr rejected(count+join): min {min(tb):.3f}s "
            f"reps {[round(x, 3) for x in tb]}"
        )
        print(
            f"substr r14(count window): min {min(tc):.3f}s "
            f"reps {[round(x, 3) for x in tc]}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
