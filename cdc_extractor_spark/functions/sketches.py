"""Sketch operators — sublinear-memory approximations for the metrics
the reference computed exactly in unbounded driver memory (the commit-ts
map, ``WorkerRunnable.java:37,137-144``, grows for the whole run — §2
bug 5; the distinct-xid HashSet, ``:87,130``, is per-batch exact).

At 100 TB, exact distinct counts and quantiles over the full feed are
shuffle-heavy; the sketch forms are one pass, mergeable, and bounded:
- ``approx_count_distinct`` — HyperLogLog++ (relative error knob);
- ``approx_percentile`` — quantile summary sketch.

Both are engine-native (Tungsten-implemented, mergeable partials).
Accuracy envelopes vs the exact answers are pinned in
tests/test_extensions.py; these stay rows-only in the driver contract
because DuckDB's approximations use different sketch parameters (the
exact twin of each metric is already oracle-checked elsewhere:
distinct_keys A6, group_collect_xids A8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_user_cardinality(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Distinct actors per event type: HLL++ estimate next to the exact
    count, with the absolute relative error surfaced for inspection."""
    per_type = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd).alias("approx_actors"),
        F.countDistinct("user_id").alias("exact_actors"),
    )
    return per_type.withColumn(
        "rel_err_bp",
        (
            F.abs(F.col("approx_actors") - F.col("exact_actors"))
            * 10_000
            / F.col("exact_actors")
        ).cast("long"),
    )


def sketch_value_quantiles(events: DataFrame) -> DataFrame:
    """P50/P90/P99 of the value column per event type via the quantile
    sketch (accuracy parameter 10000 ≈ exact on fixture scales)."""
    return events.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("quantiles"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def mergeable_daily_hll(events: DataFrame) -> DataFrame:
    """Mergeable distinct-count sketches (Datasketches HLL): one sketch
    per (event_type, day) partial, unioned up to per-type totals — the
    two-level rollup pattern that makes "distinct users last quarter"
    a sketch-merge instead of a raw re-scan at 100 TB.  Emitted next to
    the exact count so tests (and the curious) can read the error.

    Scale: daily partials are tiny fixed-size binaries; the union
    aggregates bytes, not rows — the second level shuffles
    O(days × types), independent of event volume.  The exact twin is a
    separate distinct+count (partial-agg'd, no per-group arrays — a
    collect_set exact side would move O(users) arrays through the
    shuffle) joined back on the handful of type keys."""
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(CAST(user_id AS STRING))").alias("sk"))
    approx = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_users")
    )
    exact = (
        events.select("event_type", "user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    return approx.join(exact, "event_type").withColumn(
        "rel_err_bp",
        (F.abs(F.col("approx_users") - F.col("exact_users")) * 10000
         / F.col("exact_users")).cast("long"),
    )


def cms_heavy_hitters(
    events: DataFrame, eps: float = 0.001, confidence: float = 0.99,
    seed: int = 42, k: int = 10,
) -> DataFrame:
    """Heavy hitters via count-min sketch: one mergeable CMS built over
    the key column (map-side partial sketches merged by the aggregate —
    bytes shuffled = one KB-scale sketch per partition, rows never
    move), then a BOUNDED candidate set probed against the merged
    sketch.

    Candidates come from a distributed coarse pre-aggregation:
    ``groupBy(key).count()`` (map-side combined) + ``orderBy(...).
    limit(2k)``, which Spark plans as TakeOrderedAndProject — only 2k
    rows ever reach the driver, and only those 2k keys are probed
    against the JVM sketch (2k py4j calls, k-bounded).  The previous
    form collected EVERY distinct key to the driver and probed each —
    O(|keys|) driver memory + py4j round-trips, a driver OOM at 100×
    key cardinality; this form's driver work is O(k) regardless of
    scale.

    Completes the sketch family (HLL distinct, quantile, CMS
    frequency).  CMS never under-estimates (estimate ≥ exact, within
    εN over-estimate at the chosen confidence) — pinned in pytest
    along with top-k agreement with the exact counts at this ε.
    Degenerate input: zero rows yield a NULL sketch blob — returned as
    an empty frame with the declared schema rather than a TypeError.

    Output carries BOTH tiers: the deterministic exact count of each
    top-k key (rank key, engine-portable, DuckDB-oracle-able) and the
    sketch estimate next to it, so the never-underestimate guarantee
    is checkable row-by-row (``est_count >= exact_count`` always).
    """
    spark = events.sparkSession
    schema = "user_id long, exact_count long, est_count long"
    blob = events.agg(
        F.count_min_sketch(
            "user_id", F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("cms")
    ).first()["cms"]
    if blob is None:  # empty input: agg over zero rows → null sketch
        return spark.createDataFrame([], schema)
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )
    # Distributed candidate top-k (TakeOrderedAndProject): only k rows
    # of (key, exact count) ever reach the driver, and only those k
    # keys are probed against the JVM sketch (k py4j calls, bounded).
    candidates = (
        events.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(k)
        .collect()
    )
    rows = [
        (int(r["user_id"]), int(r["n"]),
         int(cms.estimateCount(jvm.java.lang.Long(int(r["user_id"])))))
        for r in candidates
    ]
    return spark.createDataFrame(rows, schema)


def bitmap_partials(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """The shared (group, bucket) bitmap-partial build: one hash
    aggregate with map-side OR combine over ``bitmap_bucket_number`` /
    ``bitmap_bit_position`` of the key.  Single definition for the
    batch rollup, the overlap matrix and the streaming epoch merge
    (streaming/partials.py) so a bucket-width or key-handling change
    cannot silently diverge between tiers.  Output columns:
    (group_col, bucket, bm)."""
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            group_col,
            F.bitmap_bucket_number(key_col).alias("bucket"),
            F.bitmap_bit_position(key_col).alias("pos"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )


def bitmap_distinct_rollup(events: DataFrame) -> DataFrame:
    """EXACT distinct-actor counts per event type PLUS the all-types
    total, both served from one set of mergeable bitmap partials — the
    OLAP-cube trick (Kylin/Doris-style "precise count distinct") that
    makes exact distincts re-aggregable at 100 TB without ever
    re-shuffling raw ids.

    Spark 4's bitmap builtins split each ``user_id`` into a bucket
    (``id >> 15``) and a bit position inside a 4 KB fixed-size bitmap;
    ``bitmap_construct_agg`` ORs the bits of one (type, bucket) cell
    into a single binary value.  From those partials BOTH report levels
    are pure bitmap algebra:

    - per type: sum of per-bucket popcounts (``bitmap_count``);
    - total (``__all__`` row): OR-merge the per-type bitmaps bucket-wise
      (``bitmap_or_agg``), THEN popcount — computing the union of the
      id sets without touching a raw row again, which a naive
      "sum the per-type distincts" rollup gets wrong whenever one actor
      spans types.

    Scale shape: the raw scan feeds ONE hash aggregate keyed
    (event_type, bucket) with map-side partial ORs; everything after
    operates on ≤ |types|·|buckets| fixed-size blobs.  The same
    partials could be persisted per ingest batch and merged
    incrementally — the whole point of the bitmap representation.

    Reference parity: the distinct-xid HashSet the reference keeps in
    driver memory (WorkerRunnable.java:87,130) is this, minus the
    mergeability and the memory bound.
    """
    partials = bitmap_partials(events, "event_type", "user_id")
    per_type = partials.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_distinct_users")
    )
    total = (
        partials.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        # coalesce: a zero-row corpus still emits the __all__ row (the
        # global agg produces one row) and must say 0, not NULL — the
        # oracle's COUNT(DISTINCT) is 0 there
        .agg(
            F.coalesce(F.sum(F.bitmap_count("bm")), F.lit(0))
            .cast("long")
            .alias("n_distinct_users")
        )
        .select(
            F.lit("__all__").alias("event_type"),
            "n_distinct_users",
        )
    )
    return per_type.unionByName(total)


def bitmap_audience_overlap(events: DataFrame) -> DataFrame:
    """EXACT pairwise audience overlap between event types — |A|, |B|,
    |A∩B| and Jaccard — computed from the same mergeable bitmap
    partials as ``bitmap_distinct_rollup``, never re-touching raw rows
    for the pair enumeration.  Spark ships no scalar/aggregate bitmap
    AND, so the intersection comes from inclusion-exclusion:
    |A∩B| = |A| + |B| − |A∪B|, with |A∪B| one ``bitmap_or_agg`` over
    the two types' bucket partials replicated per pair.

    Scale shape: the only raw-row pass is the (type, bucket) partial
    build (hash agg, map-side OR combine).  Everything pairwise runs on
    |types|·|buckets| fixed-size blobs — with T types each partial is
    replicated T−1 times, so the pair stage costs O(T²·buckets·4KB)
    regardless of row count.  This is the audience-overlap /
    co-occurrence matrix pattern (exact, re-mergeable per ingest
    batch); Jaccard published in integer permille (DIV, no float).
    """
    partials = bitmap_partials(events, "event_type", "user_id")
    sizes = partials.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n")
    )
    t = partials.select("event_type").distinct()
    pairs = (
        t.select(F.col("event_type").alias("ta"))
        .join(t.select(F.col("event_type").alias("tb")))
        .where(F.col("ta") < F.col("tb"))
    )
    rep = pairs.join(
        partials,
        (F.col("event_type") == F.col("ta"))
        | (F.col("event_type") == F.col("tb")),
    )
    union_n = (
        rep.groupBy("ta", "tb", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
        .groupBy("ta", "tb")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_union"))
    )
    sa = sizes.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    return (
        union_n.join(sa, "ta")
        .join(sb, "tb")
        .select(
            "ta",
            "tb",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_common"),
            F.expr(
                "(n_a + n_b - n_union) * 1000 DIV n_union"
            ).alias("jaccard_permille"),
        )
    )
