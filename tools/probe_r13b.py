"""Round-13 A/B probe: PPJoin VERIFY stage — token-explosion form
(shipped) vs array-basket form (candidate) for
setsim_prefix_filter_pairs / setcontain_prefix_filter_pairs.

Shipped verify: cand ⋈ tokens(oa)  [|cand| x |A| rows through a
shuffle] ⋈ tokens(ob, pp) → hash-agg count per pair.
Candidate verify: baskets = tokens.groupBy(o).collect_set(p) once;
cand ⋈ baskets(oa) ⋈ baskets(ob) → size(array_intersect) per row —
no row explosion, no verify hash-agg; the intersect is a per-row JVM
kernel over basket-bounded arrays (baskets here are TPC-H order
baskets, <= 7 parts).

Pair set and every output value are IDENTICAL by construction (exact
verification either way), so the DuckDB oracle is untouched; parity is
asserted on sorted rows at both scales anyway.

MEASURED VERDICT (reps=3, min-of-N, noop sink, fresh session, parity
EXACT at both scales for both operators):
  setsim     sf0.1: old 4.37s, new 4.60s (0.95x — noise band)
             sf1:   old 34.10s, new 12.12s (**2.81x**)
  setcontain sf0.1: old 3.37s, new 2.53s (1.33x)
             sf1:   old 32.85s, new 11.17s (**2.94x**)
The win GROWS with scale exactly where it should: verify volume is
|cand| x basket-size token rows (plus a verify hash-agg) in the old
form vs |cand| array-payload rows in the basket form, and sf1's
candidate list is ~10x larger.  SHIPPED — both operators now use the
basket verify (functions/dedup.py).

Usage: python tools/probe_r13b.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REPS = 2


def timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _old_setsim(lineitem: DataFrame, t: int = 500) -> DataFrame:
    """The pre-round-13 token-explosion verify, inlined verbatim."""
    s = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    sz = s.groupBy("o").agg(F.count(F.lit(1)).alias("n"))
    freq = s.groupBy("p").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        s.join(freq, "p")
        .join(sz, "o")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("o").orderBy(F.asc("f"), F.asc("p"))
            ),
        )
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr(f"({t} * n + 999) div 1000") + 1
    ).select("o", "p", "n", "pos")
    a = prefix.select(
        F.col("o").alias("oa"), F.col("p").alias("pp"),
        F.col("n").alias("na"), F.col("pos").alias("pa"),
    )
    b = prefix.select(
        F.col("o").alias("ob"), F.col("p").alias("pp"),
        F.col("n").alias("nb"), F.col("pos").alias("pb"),
    )
    cand = (
        a.join(b, "pp")
        .filter(
            (F.col("oa") < F.col("ob"))
            & (F.lit(t) * F.greatest("na", "nb")
               <= F.lit(1000) * F.least("na", "nb"))
            & (
                (F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb"))
                 + 1) * F.lit(1000 + t)
                >= F.lit(t) * (F.col("na") + F.col("nb"))
            )
        )
        .select("oa", "ob", "na", "nb")
        .distinct()
    )
    ta = s.select(F.col("o").alias("oa"), F.col("p").alias("pp"))
    tb = s.select(F.col("o").alias("ob"), F.col("p").alias("pp"))
    inter = (
        cand.join(ta, "oa")
        .join(tb, ["ob", "pp"])
        .groupBy("oa", "ob", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.filter(
            F.lit(1000) * F.col("inter")
            >= F.lit(t) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select(
            F.col("oa").alias("order_a"),
            F.col("ob").alias("order_b"),
            F.col("inter").cast("long").alias("inter_size"),
            (F.col("na") + F.col("nb") - F.col("inter"))
            .cast("long")
            .alias("union_size"),
            F.expr("CAST((1000 * inter) div (na + nb - inter) AS BIGINT)")
            .alias("jaccard_permille"),
        )
    )


def _old_setcontain(lineitem: DataFrame, t: int = 800) -> DataFrame:
    """The pre-round-13 token-explosion verify, inlined verbatim."""
    s = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    sz = s.groupBy("o").agg(F.count(F.lit(1)).alias("n"))
    freq = s.groupBy("p").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        s.join(freq, "p")
        .join(sz, "o")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("o").orderBy(F.asc("f"), F.asc("p"))
            ),
        )
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.expr(f"({t} * n + 999) div 1000") + 1
    ).select(F.col("o").alias("oa"), F.col("p").alias("pp"),
             F.col("n").alias("na"))
    full = s.select(F.col("o").alias("ob"), F.col("p").alias("pp"))
    szb = sz.select(F.col("o").alias("ob"), F.col("n").alias("nb"))
    cand = (
        prefix.join(full, "pp")
        .join(szb, "ob")
        .filter(
            (F.col("na") < F.col("nb"))
            | ((F.col("na") == F.col("nb")) & (F.col("oa") < F.col("ob")))
        )
        .select("oa", "ob", "na", "nb")
        .distinct()
    )
    ta = s.select(F.col("o").alias("oa"), F.col("p").alias("pp"))
    tb = s.select(F.col("o").alias("ob"), F.col("p").alias("pp"))
    inter = (
        cand.join(ta, "oa")
        .join(tb, ["ob", "pp"])
        .groupBy("oa", "ob", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.filter(F.lit(1000) * F.col("inter") >= F.lit(t) * F.col("na"))
        .select(
            F.col("oa").alias("order_small"),
            F.col("ob").alias("order_big"),
            F.col("na").cast("long").alias("size_small"),
            F.col("nb").cast("long").alias("size_big"),
            F.col("inter").cast("long").alias("inter_size"),
            F.expr("CAST((1000 * inter) div na AS BIGINT)")
            .alias("containment_permille"),
        )
    )


def parity(a: DataFrame, b: DataFrame) -> bool:
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    return ra == rb


def main() -> None:
    reps = REPS
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    from cdc_extractor_spark.functions import dedup
    from cdc_extractor_spark.io import load_table
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="probe_r13b")
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for label, sf in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1(10x)", os.path.join(base, ".scale", "sf1")),
    ):
        li = load_table(spark, sf, "lineitem")
        for name, old, new in (
            ("setsim", _old_setsim, dedup.setsim_prefix_filter_pairs),
            ("setcontain", _old_setcontain,
             dedup.setcontain_prefix_filter_pairs),
        ):
            ok = parity(old(li), new(li))
            t_old = timed(lambda: old(li), reps)
            t_new = timed(lambda: new(li), reps)
            print(
                f"{name} @ {label}: old {t_old:.2f}s new {t_new:.2f}s "
                f"({t_old / t_new:.2f}x) parity={'EXACT' if ok else 'FAIL'}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
