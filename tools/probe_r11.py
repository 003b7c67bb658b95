"""Round-11 A/B probe (VERDICT r10 task #4, deferred from r10 with
rationale in SCALE.md): the keep-first-per-content-hash stage inside
corpus_prep / training_corpus_manifest.

OLD form (inlined here): rank-1 window over the full gated rows —
``row_number() OVER (PARTITION BY sha2(text) ORDER BY doc_id)`` — which
shuffles the full TEXT column by hash and sorts inside every hash
group.

NEW form (in the package): hash-only ``min(doc_id)`` aggregate on the
slim (sha2(text), doc_id) projection with map-side combine, then a
doc_id join-back to fetch the winner's payload — the text column never
rides the dedup shuffle, and the join-back keys on doc_id, the same
partitioning the quality-gate join already produced.

Both forms keep the identical winner set (lowest doc_id per content
hash among gated docs), so parity is asserted on sorted rows.

Usage: python tools/probe_r11.py [--reps N] [corpus manifest]
Default REPS=2 (min-of-N); recorded SCALE.md numbers state their rep
count per row.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
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


# ----- OLD forms: the r04-r10 window-based keep-first stages ----------


def corpus_prep_old(documents: DataFrame) -> DataFrame:
    from cdc_extractor_spark.functions.text import quality_score

    q = quality_score(documents).where(
        (F.col("n_tokens") >= 20) & (F.col("quality_bp") >= 7000)
    )
    gated = documents.select("doc_id", "text").join(
        q.select("doc_id", "lang", "n_tokens", "quality_bp"), "doc_id"
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("quality_bp").alias("sum_quality_bp"),
    )


def manifest_old(documents: DataFrame) -> DataFrame:
    from cdc_extractor_spark.functions.text import (
        _token_trigrams,
        quality_score,
    )

    q = quality_score(documents).where(
        (F.col("n_tokens") >= 20) & (F.col("quality_bp") >= 7000)
    )
    gated = documents.select("doc_id", "text").join(
        q.select("doc_id", "lang", "n_tokens"), "doc_id"
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
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
    test_sh = sh.filter(F.col("split") == "test").select("doc_id", "s").distinct()
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


# ----- probes ----------------------------------------------------------


def probe_corpus(spark) -> None:
    from cdc_extractor_spark.functions.text import corpus_prep
    from cdc_extractor_spark.io import load_table

    for label, sf in (("sf0.1", "/root/testdata/sf0.1"),
                      ("sf1", "/root/repo/.scale/sf1")):
        if not os.path.exists(sf):
            continue
        docs = load_table(spark, sf, "documents")
        t_old, d_old = timed(lambda: corpus_prep_old(docs))
        t_new, d_new = timed(lambda: corpus_prep(docs))
        report("corpus_prep", label, t_old, t_new, parity(d_old, d_new))


def probe_manifest(spark) -> None:
    from cdc_extractor_spark.functions.text import training_corpus_manifest
    from cdc_extractor_spark.io import load_table

    for label, sf in (("sf0.1", "/root/testdata/sf0.1"),
                      ("sf1", "/root/repo/.scale/sf1")):
        if not os.path.exists(sf):
            continue
        docs = load_table(spark, sf, "documents")
        t_old, d_old = timed(lambda: manifest_old(docs))
        t_new, d_new = timed(lambda: training_corpus_manifest(docs))
        report("manifest", label, t_old, t_new, parity(d_old, d_new))


PROBES = {"corpus": probe_corpus, "manifest": probe_manifest}


def main() -> None:
    global REPS
    argv = sys.argv[1:]
    if "--reps" in argv:
        i = argv.index("--reps")
        try:
            REPS = int(argv[i + 1])
        except (IndexError, ValueError):
            sys.exit("usage: --reps N (positive integer)")
        argv = argv[:i] + argv[i + 2 :]
    names = argv or list(PROBES)
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="probe_r11")
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    print(f"REPS={REPS}")
    print("| probe | fixture | old s | new s | speedup | parity |")
    print("|---|---|---|---|---|---|")
    for n in names:
        PROBES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
