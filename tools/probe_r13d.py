"""Optimization-round A/B probe (r13): co-purchase pair/edge generation
— shipped distinct+self-join form vs basket collect_set + array
combinatorics. Same-session interleaved min-of-N (the probe_r13c
methodology; cross-session A/Bs flap 2x on this host).

Shipped: op = distinct(o,p) [+ cap agg + semi-join]; pairs = op ⋈ op on
orderkey; count by pair.  Exchanges: distinct (o,p) + join repartition
+ pair agg.
Candidate: baskets = groupBy(o).collect_set(p) (dedup + cap = one
exchange, cap is a free size() filter); pairs explode from the sorted
basket array per order (basket-bounded combinatorics); count by pair.
Exchanges: basket agg + pair agg.

Usage: python tools/probe_r13d.py [--reps N]
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


def pairs_old(lineitem: DataFrame, max_basket: int = 50) -> DataFrame:
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    keep = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("bs"))
        .filter(F.col("bs") <= max_basket)
        .select("l_orderkey")
    )
    op = op.join(keep, "l_orderkey")
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part1"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part2"))
    pairs = a.join(b, "k").filter(F.col("part1") < F.col("part2"))
    return pairs.groupBy("part1", "part2").agg(F.count(F.lit(1)).alias("n_orders"))


def pairs_new(lineitem: DataFrame, max_basket: int = 50) -> DataFrame:
    baskets = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") <= max_basket)
    )
    # ordered pairs (ps[i], ps[j]) with i < j via posexplode + slice
    pr = baskets.select(
        F.posexplode("ps").alias("_i", "part1"),
        F.col("ps"),
    ).select(
        "part1",
        F.explode(
            F.slice(
                F.col("ps"), F.col("_i") + 2, F.greatest(F.size("ps") - F.col("_i") - 1, F.lit(0))
            )
        ).alias("part2"),
    )
    return pr.groupBy("part1", "part2").agg(F.count(F.lit(1)).alias("n_orders"))


def edges_old(lineitem: DataFrame) -> DataFrame:
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def edges_new(lineitem: DataFrame) -> DataFrame:
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    return (
        baskets.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def main() -> None:
    reps = REPS
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="probe_r13d")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.groupBy().count().write.format("noop").mode("overwrite").save()

    print(f"sf_dir={SF} reps={reps} (interleaved, min-of-N)")
    for label, old, new in (
        ("pairs", pairs_old, pairs_new),
        ("edges", edges_old, edges_new),
    ):
        t_old = timed(lambda: old(li), reps)
        t_new = timed(lambda: new(li), reps)
        t_old2 = timed(lambda: old(li), reps)
        t_new2 = timed(lambda: new(li), reps)
        print(
            f"{label}: old {min(t_old, t_old2):.2f}s new {min(t_new, t_new2):.2f}s"
            f"  (passes: old {t_old:.2f}/{t_old2:.2f}, new {t_new:.2f}/{t_new2:.2f})"
        )
        a = {tuple(r) for r in old(li).collect()}
        b = {tuple(r) for r in new(li).collect()}
        print(f"{label} parity: {'EXACT' if a == b else 'MISMATCH'} ({len(a)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
