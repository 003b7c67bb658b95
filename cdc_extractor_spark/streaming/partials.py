"""Incremental EXACT distinct-count maintenance over a change stream —
bitmap partials merged per epoch via ``foreachBatch``.

The batch twin (functions/sketches.py: bitmap_distinct_rollup) shows the
layout; this module shows the reason the layout exists: per epoch, the
stored (group, bucket) bitmaps are OR-merged with the epoch's partials —
a fixed-size-blob merge, never a rescan of history — and any report
level (per-group distinct, unions across groups) reads off the partials
alone.  This is what the reference could not do: its distinct-xid
HashSet (WorkerRunnable.java:87,130) is per-batch exact but per-RUN
unmergeable, so a restart forgets every prior batch; the bitmap table
restores exactly-once distinct counting across restarts because the OR
is idempotent (a replayed epoch merges to the same bitmaps).

Scale: epoch cost is O(batch + |groups|·|buckets| blobs); state lives in
a table, not on the driver; a 100 TB backfill merges day-partial bitmaps
the same way this merges epoch partials.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cache
from .pipeline import read_change_stream

PARTIAL_COLS = ("action", "bucket", "bm")


def epoch_partials(batch: DataFrame) -> DataFrame:
    """One epoch's (action, bucket) bitmap partials over the change
    keys — the shared build (functions/sketches.py: bitmap_partials),
    so the streaming tier can never diverge from the batch rollup."""
    from ..functions.sketches import bitmap_partials

    return bitmap_partials(batch, "action", "key")


def merge_partials(stored: DataFrame | None, epoch: DataFrame) -> DataFrame:
    """OR-merge an epoch's partials into the stored table.  Idempotent:
    re-merging a replayed epoch yields identical bitmaps."""
    if stored is None:
        return epoch
    return (
        stored.unionByName(epoch)
        .groupBy("action", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"))
    )


def run_incremental_bitmap_distinct(
    spark: SparkSession,
    feed_dir: str,
    out_dir: str,
    timeout_sec: int = 180,
) -> DataFrame:
    """Maintain the bitmap-partial table across every available epoch;
    returns the final per-action exact distinct-key counts."""
    part_dir = os.path.join(out_dir, "partials")
    checkpoint_dir = os.path.join(out_dir, "bm_checkpoint")

    def epoch_body(batch_df: DataFrame, epoch_id: int) -> None:
        spark_l = batch_df.sparkSession
        stored = (
            spark_l.read.parquet(part_dir) if os.path.exists(part_dir) else None
        )
        merged = merge_partials(stored, epoch_partials(batch_df)).select(
            *PARTIAL_COLS
        )
        version = part_dir + f".v{epoch_id}"
        merged.write.mode("overwrite").parquet(version)
        # crash-safe pointer swap (cache.publish_snapshot): the partial
        # table is never absent mid-publish, so a crash+replay merges
        # into the PREVIOUS state (idempotent OR) instead of restarting
        # from one epoch.
        cache.publish_snapshot(version, part_dir)

    q = (
        read_change_stream(spark, feed_dir)
        .writeStream.foreachBatch(epoch_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return (
        spark.read.parquet(part_dir)
        .groupBy("action")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_keys"))
    )
