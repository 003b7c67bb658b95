"""Round-13 weak-scaling probe for the three new registrations
(VERDICT r12 task #4): dedup_cluster_sizes, contamination_by_source,
required_word_coverage, timed Spark-side (noop sink, min-of-N) at
sf0.1 and the 10x .scale/sf1 documents fixture.  Hash parity at both
scales is checked separately with tools/parity_check.py (the stricter
repr-multiset form); this probe records the scaling ratios SCALE.md
cites.

MEASURED (tools/scale_probe.py --reps 2, fresh session, sf0.1 ->
.scale/sf1 = 10x docs; data-linear ~10x, sub-second queries land
under on local-mode job overhead):
- required_word_coverage: 0.9x wall — single corpus scan, entirely
  overhead-dominated at these sizes (the gopher_required_words
  regime, r12: 0.98x).
- contamination_by_source: 1.2x wall — the decontamination
  shingle-membership join plus a metadata rollup, shingle-linear.
- dedup_cluster_sizes: 2.5x wall — tracks |candidate pairs| exactly
  like its LSH-family siblings (r12 adjudications 2.3-2.7x on the
  same near-dup-heavy fixture; pair count grows superlinearly there
  by construction).  Nothing super-linear in doc count itself.
Hash parity at sf0.001 / sf0.01 / .scale/sf1 checked with
tools/parity_check.py (EXACT).

Usage: python tools/probe_r13.py [--reps N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 2


def timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    reps = REPS
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    from cdc_extractor_spark.queries import QUERIES
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="probe_r13")
    names = [
        "required_word_coverage",
        "contamination_by_source",
        "dedup_cluster_sizes",
    ]
    base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixtures = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1(10x)": os.path.join(base, ".scale", "sf1"),
    }
    results: dict[str, dict[str, float]] = {}
    for name in names:
        results[name] = {}
        for label, sf in fixtures.items():
            t = timed(lambda: QUERIES[name](spark, sf), reps)
            results[name][label] = t
            print(f"{name} @ {label}: {t:.2f}s", flush=True)
    print("\nweak scaling (t_10x / (10 * t_1x); 1.0 = ideal linear):")
    for name in names:
        r = results[name]["sf1(10x)"] / (10 * results[name]["sf0.1"])
        print(f"  {name}: {r:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
