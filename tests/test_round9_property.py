"""Round-9 properties: data-proportional loop partitioning (VERDICT r8
task #3) — the sizing formula's two regimes, conf-scope hygiene, and
the PageRank loop_partitions plan/value contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_extractor_spark.partitioning import (
    data_proportional_partitions,
    scoped_shuffle_partitions,
)


class TestDataProportionalPartitions:
    def test_tiny_state_serializes(self):
        # 512-edge dup-cluster graph: both terms are 1 — the measured
        # 2.2x CC-loop win comes from NOT flooring at parallelism
        assert data_proportional_partitions(512, parallelism=32) == 1

    def test_work_term_uses_cores_for_cpu_bound_loops(self):
        # 2.39M-edge copurchase graph: bytes-only gave 2 partitions and
        # a measured 2x slowdown; the work term restores parallelism
        assert data_proportional_partitions(2_392_000, parallelism=32) == 32

    def test_work_term_never_splits_below_min_rows(self):
        # 118k-edge er graph on 32 cores: 2 chunks of ~59k, not 32 of 4k
        assert data_proportional_partitions(118_332, parallelism=32) == 2

    def test_size_term_dominates_at_scale(self):
        # 1e12 rows x 48 B = ~45.7 TB -> ~460k partitions of 100 MB:
        # far beyond any static session default, bounded by data
        n = data_proportional_partitions(10**12, parallelism=4096)
        assert n == -(-(10**12 * 48) // (100 << 20))
        assert n > 400_000

    def test_monotone_in_rows(self):
        prev = 0
        for rows in [1, 10**3, 10**5, 10**7, 10**9, 10**11]:
            cur = data_proportional_partitions(rows, parallelism=64)
            assert cur >= prev
            prev = cur

    def test_floor_is_one(self):
        assert data_proportional_partitions(0, parallelism=32) == 1


class TestScopedShufflePartitions:
    KEY = "spark.sql.shuffle.partitions"

    def test_sets_and_restores(self, spark):
        before = spark.conf.get(self.KEY)
        with scoped_shuffle_partitions(spark, 3):
            assert spark.conf.get(self.KEY) == "3"
        assert spark.conf.get(self.KEY) == before

    def test_restores_on_exception(self, spark):
        before = spark.conf.get(self.KEY)
        with pytest.raises(RuntimeError):
            with scoped_shuffle_partitions(spark, 3):
                raise RuntimeError("loop blew up")
        assert spark.conf.get(self.KEY) == before

    def test_connected_components_leaves_conf_untouched(self, spark):
        from cdc_extractor_spark.functions import dedup

        before = spark.conf.get(self.KEY)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup.connected_components(pairs).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        assert spark.conf.get(self.KEY) == before


class TestPagerankLoopPartitions:
    def _edges(self, spark):
        from cdc_extractor_spark.io import load_table
        from cdc_extractor_spark.operators import graph

        return graph.copurchase_edges(
            load_table(spark, "/root/testdata/sf0.001", "lineitem")
        ).localCheckpoint(eager=True)

    def test_same_fixpoint_any_loop_partitioning(self, spark):
        # integer arithmetic is reduce-order-independent: the ranked
        # fixpoint must be bit-identical under session layout, 1
        # partition, and 5 partitions
        from cdc_extractor_spark.operators import graph

        edges = self._edges(spark)
        want = graph.pagerank_integer(edges).collect()
        for lp in (1, 5):
            got = graph.pagerank_integer(edges, loop_partitions=lp).collect()
            assert got == want

    def test_loop_exchanges_sized_to_loop_partitions(self, spark):
        # every loop-side hash exchange carries the explicit count; no
        # session-default (8 in tests) exchange remains on the loop keys
        from cdc_extractor_spark.operators import graph
        from cdc_extractor_spark.plans import executed_plan

        edges = self._edges(spark)
        df = graph.pagerank_integer(edges, loop_partitions=5)
        df.collect()
        plan = executed_plan(df).split("== Initial Plan ==")[0]
        assert "REPARTITION_BY_NUM" in plan
        # assert the partition count on the hash-partitioning operator
        # itself, not any literal 5 anywhere in the plan (ADVICE r9)
        import re

        assert re.search(r"hashpartitioning\([^)]*\b5\b\)", plan) or re.search(
            r"REPARTITION_BY_NUM[^\n]*\b5\b", plan
        )
        # the reuse contract survives the explicit repartition
        assert "ReusedExchange" in plan


class TestRound9PlanShapes:
    """Physical-plan evidence for the round-9 operators (100 TB
    rules: broadcast the bounded relations, never a single-task global
    sort, never a cartesian product)."""

    def test_cell_occupancy_broadcasts_bounded_relations(self, spark):
        from cdc_extractor_spark.functions import similarity
        from cdc_extractor_spark.io import load_table
        from cdc_extractor_spark.plans import executed_plan

        df = similarity.cell_occupancy_report(
            load_table(spark, "/root/testdata/sf0.001", "embeddings")
        )
        df.collect()
        plan = executed_plan(df).split("== Initial Plan ==")[0]
        # centroids (cells x dim) and the 1-row total both broadcast
        assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan  # nothing corpus x corpus

    def test_cluster_signature_terms_broadcasts_cluster_df(self, spark):
        from cdc_extractor_spark.functions import similarity, text
        from cdc_extractor_spark.io import load_table
        from cdc_extractor_spark.plans import executed_plan

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        df = text.cluster_signature_terms(
            docs, similarity.ivf_cell_assignments(emb), 3
        )
        df.collect()
        plan = executed_plan(df).split("== Initial Plan ==")[0]
        assert "BroadcastExchange" in plan or "BroadcastQueryStage" in plan
        assert "CartesianProduct" not in plan

    def test_curriculum_order_never_single_partition(self, spark):
        from cdc_extractor_spark.functions import text
        from cdc_extractor_spark.io import load_table
        from cdc_extractor_spark.plans import executed_plan

        df = text.curriculum_quality_order(
            load_table(spark, "/root/testdata/sf0.001", "documents"), 4
        )
        df.collect()
        plan = executed_plan(df).split("== Initial Plan ==")[0]
        # the global training order must come from prefix offsets +
        # (bucket, md5-byte)-partitioned windows, never a global sort
        assert "SinglePartition" not in plan

    def test_minhash_band_stats_is_pure_aggregation(self, spark):
        from cdc_extractor_spark.functions import dedup
        from cdc_extractor_spark.io import load_table
        from cdc_extractor_spark.plans import executed_plan

        df = dedup.minhash_band_stats(
            load_table(spark, "/root/testdata/sf0.001", "documents"), 3
        )
        df.collect()
        plan = executed_plan(df).split("== Initial Plan ==")[0]
        # the whole report is hash aggregates over the signature
        # stream: no join of any kind, no pair ever materialized
        assert "Join" not in plan
        assert "CartesianProduct" not in plan
