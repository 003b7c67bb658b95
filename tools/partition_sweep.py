"""Registry-wide PARTITION-COUNT invariance sweep (round 13).

tests/test_partition_invariance.py pins the ~60 layout-sensitive
queries (bucketed ranks, hash sharding, sketch merges, per-block
kernels) at spark.sql.shuffle.partitions=7; this tool runs EVERY
registered query at a hostile partition count and hash-compares
against the DuckDB oracle — the partition-axis twin of
tools/empty_sweep.py (zero-row axis).  A query whose values move with
the shuffle partition count is broken at ANY scale: the driver runs 32,
a cluster runs thousands, and both must hash-identically.

First full runs (round 13, sf0.01): shuffle.partitions=7 →
**288/288 EXACT** (including the 220+ names the SENSITIVE list never
covered); --no-aqe (adaptive execution disabled — at cluster scale
AQE decisions vary run to run, results must not) → **288/288 EXACT**.
Recorded in SCALE.md; re-run when adding operators that derive
ranks/buckets/sample membership from anything physical.

Usage: python tools/partition_sweep.py [--partitions N] [--no-aqe]
       [names...]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> None:
    import duckdb

    from cdc_extractor_spark.io import TABLES
    from cdc_extractor_spark.queries import ORACLES, QUERIES
    from cdc_extractor_spark.session import get_session

    parts = "7"
    argv = sys.argv[1:]
    no_aqe = "--no-aqe" in argv
    if no_aqe:
        argv.remove("--no-aqe")
    if "--partitions" in argv:
        i = argv.index("--partitions")
        parts = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    names = argv or sorted(QUERIES)

    spark = get_session(app_name="partition_sweep")
    if no_aqe:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    else:
        spark.conf.set("spark.sql.shuffle.partitions", parts)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    ok, failed = 0, []
    for name in names:
        try:
            sdf = QUERIES[name](spark, SF)
            scols = sorted(sdf.columns)
            srows = Counter(
                tuple(map(repr, r)) for r in sdf.select(*scols).collect()
            )
            osql = ORACLES[name]
            dcols = sorted(con.sql(osql).columns)
            drows = Counter(
                tuple(repr(x) for x in row)
                for row in con.sql(
                    f"SELECT {', '.join(dcols)} FROM ({osql})"
                ).fetchall()
            )
            if scols != dcols or srows != drows:
                failed.append((name, "MISMATCH"))
                print(f"{name} MISMATCH", flush=True)
            else:
                ok += 1
                print(f"{name} EXACT", flush=True)
        except Exception as ex:
            failed.append((name, repr(ex)[:140]))
            print(f"{name} ERROR {repr(ex)[:140]}", flush=True)
    axis = "aqe=off" if no_aqe else f"partitions={parts}"
    print(f"\nSUMMARY {axis} exact={ok} failed={len(failed)}")
    for name, err in failed:
        print(f"  {name}: {err}")
    spark.stop()


if __name__ == "__main__":
    main()
