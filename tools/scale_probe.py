"""10x scale probe (VERDICT r7 task #2): run the most expensive
registry queries at sf0.1 (driver fixture) and sf1.0 (the 10x fixture
from tools/gen_scale_fixture.py) and report per-query wall ratios.

A query whose plan is data-linear should land near 10x (modulo the
fixed local-mode job overhead that DOMINATES sub-second queries — those
land well UNDER 10x); anything far above ~15x indicates a super-linear
term that would be a scale-killer at 100 TB and gets flagged.

Usage: python tools/scale_probe.py [--reps 2] [--dirs a,b,...] [name ...]
Prints one markdown row per query — the wall at each fixture dir (min
of --reps timed runs each, after a JVM warm query) and the last/first
ratio — plus a machine-readable JSON line at the end.  --dirs defaults
to "/root/testdata/sf0.1,.scale/sf1"; pass three dirs (e.g. adding
.scale/sf03 from gen_scale_fixture.py) for tail-exponent measurement.
Measure in a FRESH session only (SCALE.md round-8 methodology note:
cross-session numbers skew high; never run concurrently with other
Spark jobs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # pair generation / linkage / clustering
    "er_entity_groups",
    "setcontain_prefix_filter_pairs",
    "setsim_prefix_filter_pairs",
    "dedup_minhash_lsh",
    "dedup_cluster_components",
    "dedup_survivorship",
    "dedup_exact_substrings",
    "dedup_fuzzy_verified",
    "dedup_lsh_recall_report",
    "split_leakage_audit",
    # graph / iterative
    "pagerank_copurchase",
    "graph_degree_assortativity",
    "bfs_k_hop",
    "copurchase_association_rules",
    "copurchase_part_pairs",
    # ANN / embeddings
    "topk_cosine_similarity",
    "ann_ivf_topk",
    "ann_lsh_bucketed_topk",
    "ann_pq_adc_oracle",
    "ann_recall_report",
    "semantic_dedup_clusters",
    "embedding_cosine_neardup",
    "embedding_power_iteration",
    "ann_cell_occupancy",
    # round-9 corpus/curriculum operators
    "curriculum_quality_order",
    "cluster_signature_terms",
    "minhash_band_stats",
    # round-10 calibration audit
    "quality_calibration_report",
    # text / corpus
    "decontamination_overlap",
    "domain_affinity_select",
    "doc_ngram_novelty",
    "udtf_char_trigrams",
    # relational / CDC heavies
    "rfm_customer_segments",
    "tpch_waiting_suppliers",
    "orderby_commit_ts",
    # streaming (micro-batch machinery + state at 10x volume)
    "streaming_left_outer_join",
    "streaming_dedup_exactly_once",
]


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    dirs = ["/root/testdata/sf0.1", ".scale/sf1"]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--dirs" in args:
        i = args.index("--dirs")
        dirs = args[i + 1].split(",")
        args = args[:i] + args[i + 2 :]
    names = args or DEFAULT_QUERIES
    dirs = [os.path.abspath(d) for d in dirs]

    from cdc_extractor_spark.queries import QUERIES
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="scale_probe")

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # JVM/codegen warm-up, untimed
    QUERIES["pricing_summary"](spark, dirs[0]).write.format("noop").mode(
        "overwrite"
    ).save()

    labels = [os.path.basename(d) for d in dirs]
    rows = {}
    print("| query | " + " s | ".join(labels) + " s | ratio |")
    print("|---|" + "---|" * (len(dirs) + 1))
    for name in names:
        try:
            walls = [run(name, d) for d in dirs]
        except Exception as exc:  # keep probing the rest
            print(f"| {name} | ERR | {type(exc).__name__}: {exc} |")
            rows[name] = {"err": str(exc)[:200]}
            continue
        ratio = walls[-1] / walls[0] if walls[0] > 0 else float("inf")
        rows[name] = {
            "walls": [round(w, 3) for w in walls],
            "dirs": labels,
            "ratio": round(ratio, 2),
        }
        cells = " | ".join(f"{w:.2f}" for w in walls)
        print(f"| {name} | {cells} | {ratio:.1f}x |")
        sys.stdout.flush()
    print(json.dumps({"reps": reps, "queries": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
