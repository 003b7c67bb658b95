"""Round-10 A/B probes (VERDICT r9 tasks #4/#5): controlled
same-session comparisons of this round's loop-partitioning and
argmax-rewrite candidates, OLD form inlined here vs NEW form in the
package, at 1x (sf0.1 / 32k vectors) and 10x (.scale/sf1 / emb100)
where the relevant fixture exists.  Every pair also asserts result
parity (sorted-rows equality) — a probe that only times would let a
semantics drift ride a perf win.

Probes:
  bfs      — bfs_k_hop loop exchanges: session default vs
             data-proportional repartition-embedded.  REJECTED on
             measurement (5-rep probe: 1.06x at sf0.1, 0.73x at sf1 —
             the bounded subgraph densifies at 10x and lp=1 serializes
             a join 32 cores absorb); the package keeps the session
             layout and the rejected form lives here (bfs_new) for
             re-probing.
  pq       — pq_train Lloyd loop: session default vs scoped
             data-proportional shuffle partitions.
  power    — embedding_power_iteration: 32-partition checkpointed C
             vs coalesce(1) (zero-exchange iterations).
  langid   — lang_id argmax: per-doc row_number window vs min_by
             aggregate (the r9 routing regime).

Usage: python tools/probe_r10.py [--reps N] [probe ...]   (default: all)

Rep counts (ADVICE r10): the module default is REPS=2 (min-of-2, the
bench harness convention).  The recorded bfs REJECTION above was run at
--reps 5 (sub-second timings need the larger rep count per SCALE.md's
probe discipline); the committed pq/power/langid numbers used the
default 2.  Re-running any probe at the recorded rep count reproduces
the committed measurement.
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
        f"{'OK' if same else 'MISMATCH'} |"
    )
    sys.stdout.flush()


# ---------------------------------------------------------------- old forms


def bfs_old(edges: DataFrame, n_seeds: int = 5, hops: int = 3) -> DataFrame:
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = (
        nodes.orderBy("node")
        .limit(n_seeds)
        .select("node", F.lit(0).cast("long").alias("depth"))
    )
    visited = seeds
    frontier = seeds
    for d in range(1, hops + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("depth", F.lit(d).cast("long"))
        )
        visited = (
            visited.unionByName(reached)
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
        )
        frontier = visited.filter(F.col("depth") == d)
    return visited


def bfs_new(
    edges: DataFrame, loop_partitions: int, n_seeds: int = 5, hops: int = 3
) -> DataFrame:
    """The REJECTED data-proportional variant (see module docstring)."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = (
        nodes.orderBy("node")
        .limit(n_seeds)
        .select("node", F.lit(0).cast("long").alias("depth"))
    )
    edges = edges.repartition(loop_partitions, "src")
    visited = seeds
    frontier = seeds
    for d in range(1, hops + 1):
        frontier = frontier.repartition(loop_partitions, "node")
        reached = frontier.join(edges, frontier["node"] == edges["src"]).select(
            F.col("dst").alias("node")
        )
        reached = (
            reached.repartition(loop_partitions, "node")
            .distinct()
            .withColumn("depth", F.lit(d).cast("long"))
        )
        un = visited.unionByName(reached).repartition(loop_partitions, "node")
        visited = un.groupBy("node").agg(F.min("depth").alias("depth"))
        frontier = visited.filter(F.col("depth") == d)
    return visited


def langid_old(documents: DataFrame, spark) -> DataFrame:
    from cdc_extractor_spark.functions.text import LANG_MARKERS, tokens

    markers = spark.createDataFrame(
        [(lang, tok) for lang, toks in LANG_MARKERS.items() for tok in toks],
        "cand_lang string, tok string",
    )
    toks = tokens(documents)
    scores = (
        toks.join(F.broadcast(markers), "tok")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("cand_lang").asc()
    )
    best = (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("lang_pred"), "hits")
    )
    return (
        documents.select("doc_id", "lang")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
        )
    )


# ------------------------------------------------------------------- probes


def probe_bfs(spark) -> None:
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.operators import graph as g
    from cdc_extractor_spark.partitioning import data_proportional_partitions

    for sf_dir in ["/root/testdata/sf0.1", ".scale/sf1"]:
        if not os.path.isdir(sf_dir):
            continue
        e0 = g.canonical_copurchase_edges(load_table(spark, sf_dir, "lineitem"))
        und = e0.unionByName(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).localCheckpoint(eager=True)
        lp = data_proportional_partitions(
            und.count(), parallelism=spark.sparkContext.defaultParallelism
        )
        t_old, d_old = timed(lambda: bfs_old(und))
        t_new, d_new = timed(lambda: bfs_new(und, lp))
        report("bfs_k_hop", f"{os.path.basename(sf_dir)} lp={lp}",
               t_old, t_new, parity(d_old, d_new))


def probe_pq(spark) -> None:
    from cdc_extractor_spark.functions import similarity as s
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.partitioning import data_proportional_partitions

    for sf_dir in ["/root/testdata/sf0.1", ".scale/emb100"]:
        if not os.path.isdir(sf_dir):
            continue
        corpus = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") >= 5)
            .localCheckpoint(eager=True)
        )
        lp = data_proportional_partitions(
            corpus.count() * 8,
            bytes_per_row=100,
            parallelism=spark.sparkContext.defaultParallelism,
        )

        def train(parts):
            codes, cb = s.pq_train(corpus, iters=2, loop_partitions=parts)
            return codes.join(cb, ["s", "cell"]).select(
                "vec_id", "s", "cell"
            )

        t_old, d_old = timed(lambda: train(None))
        t_new, d_new = timed(lambda: train(lp))
        report("pq_train", f"{os.path.basename(sf_dir)} lp={lp}",
               t_old, t_new, parity(d_old, d_new))


def probe_power(spark) -> None:
    from cdc_extractor_spark.functions import similarity as s
    from cdc_extractor_spark.io import load_table

    # OLD form = package form with the narrow checkpoint bypassed is
    # not separable without a copy; instead compare against a local
    # replica that keeps the session-default partitioning.
    import numpy as np
    import pandas as pd

    def power_old(embeddings: DataFrame) -> DataFrame:
        dec = "decimal(38,0)"

        def _gram_partials(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                y = X * 1000.0
                xi = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
                g = xi.T @ xi
                d = g.shape[0]
                ii, jj = np.indices((d, d))
                yield pd.DataFrame(
                    {"i": ii.ravel(), "j": jj.ravel(), "p": g.ravel()}
                )

        cmat = (
            embeddings.select("embedding")
            .mapInPandas(_gram_partials, "i long, j long, p long")
            .groupBy("i", "j")
            .agg(F.sum(F.col("p").cast(dec)).alias("c"))
            .localCheckpoint(eager=True)
        )
        v = cmat.select(F.col("j").alias("vj")).distinct().select(
            "vj", F.lit(1000).cast("long").alias("vv")
        )
        for _ in range(2):
            y = (
                cmat.join(F.broadcast(v), F.col("j") == F.col("vj"))
                .groupBy("i")
                .agg(F.sum(F.col("c") * F.col("vv").cast(dec)).alias("y"))
            )
            mx = y.agg(F.max(F.abs(F.col("y"))).alias("_m"))
            v = (
                y.crossJoin(F.broadcast(mx))
                .select(
                    F.col("i").alias("vj"),
                    F.expr(
                        "CAST(CASE WHEN y < 0 THEN -1 ELSE 1 END "
                        "* ((1000 * abs(y)) div greatest(_m, 1)) AS BIGINT)"
                    ).alias("vv"),
                )
            )
        return v.select(
            F.col("vj").cast("long").alias("dim"),
            F.col("vv").cast("long").alias("loading_permille"),
        )

    for sf_dir in ["/root/testdata/sf0.1", ".scale/emb100"]:
        if not os.path.isdir(sf_dir):
            continue
        emb = load_table(spark, sf_dir, "embeddings")
        t_old, d_old = timed(lambda: power_old(emb))
        t_new, d_new = timed(lambda: s.embedding_power_iteration(emb))
        report("power_iteration", os.path.basename(sf_dir),
               t_old, t_new, parity(d_old, d_new))


def probe_langid(spark) -> None:
    from cdc_extractor_spark.functions import text as t
    from cdc_extractor_spark.io import load_table

    for sf_dir in ["/root/testdata/sf0.1", ".scale/sf1"]:
        if not os.path.isdir(sf_dir) or not os.path.exists(
            os.path.join(sf_dir, "documents.parquet")
        ):
            continue
        docs = load_table(spark, sf_dir, "documents")
        t_old, d_old = timed(lambda: langid_old(docs, spark))
        t_new, d_new = timed(lambda: t.lang_id(docs, spark))
        report("lang_id", os.path.basename(sf_dir),
               t_old, t_new, parity(d_old, d_new))


PROBES = {
    "bfs": probe_bfs,
    "pq": probe_pq,
    "power": probe_power,
    "langid": probe_langid,
}


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

    spark = get_session(app_name="probe_r10")
    # warm the JVM + Python workers once, untimed
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    print("| probe | fixture | old s | new s | speedup | parity |")
    print("|---|---|---|---|---|---|")
    for n in names:
        PROBES[n](spark)
    spark.stop()


if __name__ == "__main__":
    main()
