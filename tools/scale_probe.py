"""10x scale probe (VERDICT r7 task #2): run the most expensive
registry queries at sf0.1 (driver fixture) and sf1.0 (the 10x fixture
from tools/gen_scale_fixture.py) and report per-query wall ratios.

A query whose plan is data-linear should land near 10x (modulo the
fixed local-mode job overhead that DOMINATES sub-second queries — those
land well UNDER 10x); anything far above ~15x indicates a super-linear
term that would be a scale-killer at 100 TB and gets flagged.

Usage: python tools/scale_probe.py [--reps 2] [name ...]
Prints one | query | sf0.1 s | sf1 s | ratio | markdown row per query
(min of --reps timed runs each, after a registry-wide JVM warm query)
and a machine-readable JSON line at the end.
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
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args or DEFAULT_QUERIES

    from cdc_extractor_spark.queries import QUERIES
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="scale_probe")
    small = "/root/testdata/sf0.1"
    big = os.path.abspath(".scale/sf1")

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    # JVM/codegen warm-up, untimed
    QUERIES["pricing_summary"](spark, small).write.format("noop").mode(
        "overwrite"
    ).save()

    rows = {}
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        try:
            t_small = run(name, small)
            t_big = run(name, big)
        except Exception as exc:  # keep probing the rest
            print(f"| {name} | ERR | ERR | {type(exc).__name__}: {exc} |")
            rows[name] = {"err": str(exc)[:200]}
            continue
        ratio = t_big / t_small if t_small > 0 else float("inf")
        rows[name] = {
            "sf01": round(t_small, 3),
            "sf1": round(t_big, 3),
            "ratio": round(ratio, 2),
        }
        print(f"| {name} | {t_small:.2f} | {t_big:.2f} | {ratio:.1f}x |")
        sys.stdout.flush()
    print(json.dumps({"reps": reps, "queries": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
