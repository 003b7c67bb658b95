"""Round-12 A/B probe (ADVICE r11 #2): the keep-first winner join-back
in corpus_prep / training_corpus_manifest currently keys on doc_id
alone, which silently assumes doc_id uniqueness — a duplicated doc_id
that wins one content-hash group would pull back ALL of its rows,
including rows from hash groups it did not win.

CANDIDATE fix (ADVICE): join back on BOTH keys ['doc_id', 'h'].  The
risk at scale: Spark requires co-partitioning on ALL join keys by
default (spark.sql.requireAllClusterKeysForCoPartition), so the
two-key join may re-shuffle the gated frame on (doc_id, h) — and in
training_corpus_manifest the gated frame CARRIES THE TEXT COLUMN,
which would give back exactly the text-never-rides-the-dedup-shuffle
property round 11 bought (SCALE.md, tools/probe_r11.py).

This probe measures old (doc_id-only) vs new (two-key) for both
composites at sf0.1 and .scale/sf1 with sorted-row parity, and prints
whether the two-key plan contains an extra Exchange carrying `text`.

MEASURED VERDICT (reps=4, min-of-N, noop sink): parity EXACT
everywhere and ZERO text-carrying exchanges in either form, but the
two-key join is a consistent regression at 10x docs —
corpus_prep 0.90x, manifest 0.80x at sf1 (1.19x/1.00x at sf0.1, i.e.
noise at small scale, real cost at large).  REJECTED per the
measured-wins-only discipline; the shipped fix is the documented
doc_id-uniqueness precondition (functions/text.py docstrings), which
the upstream quality-gate join already depends on and which
dq_constraint_audit checks as the table's primary-key constraint.

Usage: python tools/probe_r12.py [--reps N] [corpus manifest]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPS = 2


def timed(fn) -> tuple[float, DataFrame]:
    best, df = float("inf"), None
    for _ in range(REPS):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best, df


def parity(a: DataFrame, b: DataFrame) -> bool:
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    return ra == rb


def report(name: str, dims: str, old: float, new: float, same: bool) -> None:
    ratio = old / new if new > 0 else float("inf")
    print(
        f"| {name} | {dims} | {old:.2f} | {new:.2f} | {ratio:.2f}x | "
        f"{'EXACT' if same else 'MISMATCH'} |",
        flush=True,
    )


def corpus_prep_variant(documents: DataFrame, two_key: bool) -> DataFrame:
    from cdc_extractor_spark.functions.text import quality_score

    q = quality_score(documents).where(
        (F.col("n_tokens") >= 20) & (F.col("quality_bp") >= 7000)
    )
    hashes = documents.select("doc_id", F.sha2(F.col("text"), 256).alias("h"))
    gated = hashes.join(
        q.select("doc_id", "lang", "n_tokens", "quality_bp"), "doc_id"
    )
    winners = gated.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    if two_key:
        kept = gated.join(winners, ["doc_id", "h"])
    else:
        kept = gated.join(winners.select("doc_id"), "doc_id")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("quality_bp").alias("sum_quality_bp"),
    )


def manifest_variant(documents: DataFrame, two_key: bool) -> DataFrame:
    from cdc_extractor_spark.functions.text import (
        _token_trigrams,
        quality_score,
    )

    q = quality_score(documents).where(
        (F.col("n_tokens") >= 20) & (F.col("quality_bp") >= 7000)
    )
    if two_key:
        base = documents.select(
            "doc_id", "text", F.sha2(F.col("text"), 256).alias("h")
        )
        gated = base.join(q.select("doc_id", "lang", "n_tokens"), "doc_id")
        winners = gated.select("doc_id", "h").groupBy("h").agg(
            F.min("doc_id").alias("doc_id")
        )
        kept = gated.join(winners, ["doc_id", "h"]).drop("h")
    else:
        # byte-faithful to the shipped r11 form (functions/text.py)
        gated = documents.select("doc_id", "text").join(
            q.select("doc_id", "lang", "n_tokens"), "doc_id"
        )
        winners = gated.select(
            "doc_id", F.sha2(F.col("text"), 256).alias("h")
        ).groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        kept = gated.join(winners.select("doc_id"), "doc_id")
    bucket = ((F.col("doc_id") * 1103515245 + 12345) % 2147483647) % 1000
    split = (
        F.when(bucket < 800, F.lit("train"))
        .when(bucket < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    with_split = kept.select(
        "doc_id", "text", "lang", "n_tokens", split.alias("split")
    )
    sh = with_split.select(
        "doc_id", "split", F.explode(_token_trigrams()).alias("s")
    )
    test_sh = (
        sh.filter(F.col("split") == "test").select("doc_id", "s").distinct()
    )
    train_sh = (
        sh.filter(F.col("split") == "train").select("s").distinct()
        .withColumn("_hit", F.lit(1))
    )
    contam = (
        test_sh.join(train_sh, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.sum(F.coalesce(F.col("_hit"), F.lit(0))) * 10000
                / F.count(F.lit(1))
            ).alias("contam_bp")
        )
        .filter(F.col("contam_bp") >= 5000)
        .select("doc_id")
    )
    clean = with_split.join(contam, "doc_id", "left_anti")
    return clean.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def text_exchanges(df: DataFrame) -> int:
    """Count Exchange nodes whose output carries the text column."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = 0
    for block in plan.split("Exchange")[1:]:
        head = block.split("\n", 1)[0]
        if "text" in head:
            n += 1
    return n


def main() -> None:
    global REPS
    args = list(sys.argv[1:])
    if "--reps" in args:
        i = args.index("--reps")
        REPS = int(args[i + 1])
        del args[i : i + 2]
    which = set(args) or {"corpus", "manifest"}

    from cdc_extractor_spark.session import get_session

    spark = get_session()
    print(f"reps={REPS}")
    print("| query | fixture | old s | new s | ratio | parity |")
    print("|---|---|---|---|---|---|")
    for sf_name, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".scale", "sf1")),
    ):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        if "corpus" in which:
            t_old, d_old = timed(lambda: corpus_prep_variant(docs, False))
            t_new, d_new = timed(lambda: corpus_prep_variant(docs, True))
            report("corpus_prep(2key)", sf_name, t_old, t_new,
                   parity(d_old, d_new))
        if "manifest" in which:
            t_old, d_old = timed(lambda: manifest_variant(docs, False))
            t_new, d_new = timed(lambda: manifest_variant(docs, True))
            report("manifest(2key)", sf_name, t_old, t_new,
                   parity(d_old, d_new))
            print(
                f"  text-carrying exchanges: old="
                f"{text_exchanges(manifest_variant(docs, False))} "
                f"new={text_exchanges(manifest_variant(docs, True))}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
