#!/usr/bin/env python
"""sf1 (10x) spot bench over the heavy STRUCTURAL queries (VERDICT r13
task #4): the graded sf0.1 bench cannot see the setsim/setcontain/
PPJoin-class wins because their sf0.1 wall is fixed cost (8->32-core
scaling ratio ~0.9), so this tool produces driver-gradeable evidence at
a scale where the structural work dominates the noise floor.

Methodology: IDENTICAL to bench.py — same session factory (honors
$SPARK_GRAFT_CPUS), warmup, min-of-2 reps through the noop sink, batch
canary first/last, and the same two-line stdout contract (full detail
JSON line, then a compact final summary line < 1500 chars with metric
"spot_queries_wall_sf1").  The fixture is the committed 10x replication
of the read-only sf0.1 tables (tools/gen_scale_fixture.py — replica-
tagged text so dedup pair output scales linearly, key offsets applied
consistently so join fan-outs are preserved); it is (re)generated on
demand, never cached across content changes (idempotence is by table
presence only, delete .scale/sf1 to force a rebuild).

Results land in SPOT_BENCH_sf1.md (committed) exactly as BENCH_DETAIL
does for the sf0.1 run.

Usage: python tools/spot_bench_sf1.py [name ...]   (default: SPOT_SET)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF1 = str(REPO / ".scale" / "sf1")

# The heavy structural tier: queries whose sf0.1 wall is dominated by
# fixed cost but whose sf1 wall is dominated by the structural work the
# optimization rounds rewrote (LSH/PPJoin joins, basket combinatorics,
# CC loop, substring fingerprints, simhash aggregate, gram streams).
SPOT_SET = [
    "setsim_prefix_filter_pairs",
    "setcontain_prefix_filter_pairs",
    "dedup_lsh_recall_report",
    "split_leakage_audit",
    "dedup_exact_substrings",
    "dedup_simhash",
    "dedup_cluster_components",
    "er_entity_groups",
    "copurchase_part_pairs",
    "pagerank_copurchase",
    "semantic_dedup_clusters",
    "doc_repetition_flags",
]


def main() -> None:
    names = sys.argv[1:] or SPOT_SET

    if not os.path.isdir(SF1):
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "gen_scale_fixture.py"), SF1],
            check=True,
        )

    from bench import _canary, _quiesce, emit_summary
    from cdc_extractor_spark.queries import QUERIES
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="cdcx_spot_bench_sf1")
    warm = spark.read.parquet(f"{SF1}/region.parquet")
    warm.groupBy("r_name").count().write.format("noop").mode("overwrite").save()
    _canary(spark)
    canary = {"first": _canary(spark)}

    import gc

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        reps[name] = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, SF1)
            df.write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.perf_counter() - t0, 3))
        timings[name] = min(reps[name])
        del df
        gc.collect()

    canary["last"] = _canary(spark)

    try:
        total = round(sum(timings.values()), 3)
        lines = [
            "# SPOT_BENCH_sf1 — heavy structural queries at the 10x fixture",
            "",
            f"queries={len(timings)}  total={total}s  (min of 2 reps, noop "
            f"sink; .scale/sf1 = 10x replication of sf0.1, "
            f"tools/gen_scale_fixture.py)",
            f"cpus={os.environ.get('SPARK_GRAFT_CPUS', '32')}",
            "",
            f"canary (1-row constant query, pure harness overhead): "
            f"first={canary['first']}  last={canary['last']}",
            "",
            "| query | sec | rep1 | rep2 |",
            "|---|---|---|---|",
        ]
        for name, sec in sorted(timings.items(), key=lambda kv: (-kv[1], kv[0])):
            r1, r2 = reps[name]
            lines.append(f"| {name} | {sec:.3f} | {r1:.3f} | {r2:.3f} |")
        (REPO / "SPOT_BENCH_sf1.md").write_text("\n".join(lines) + "\n")
    except OSError:
        pass

    _quiesce(spark)
    emit_summary(timings, 1.0, canary, metric="spot_queries_wall_sf1")


if __name__ == "__main__":
    main()
