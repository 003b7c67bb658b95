"""Fixture-parameterized Spark-vs-DuckDB parity check: run named
registry queries against ANY fixture dir (sf0.01 driver gate, sf1 /
emb100 scale points) and compare repr-level sorted multisets — the
stricter form of the driver's value-hash.  This is the tool behind the
per-round "hash parity at 10x" tables in SCALE.md.

Usage: python tools/parity_check.py <fixture_dir> name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.path.abspath(sys.argv[1])
    names = sys.argv[2:]
    from collections import Counter

    import duckdb

    from cdc_extractor_spark.io import TABLES
    from cdc_extractor_spark.queries import ORACLES, QUERIES
    from cdc_extractor_spark.session import get_session

    spark = get_session(app_name="parity_check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        # driver fixtures are single files; gen_scale_fixture.py writes
        # Spark DIRECTORIES — glob the part files for DuckDB
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    n_ok = 0
    for name in names:
        t0 = time.perf_counter()
        sdf = QUERIES[name](spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = Counter(tuple(map(repr, r)) for r in sdf.select(*scols).collect())
        t_spark = time.perf_counter() - t0
        t0 = time.perf_counter()
        sql = ORACLES[name]
        dcols = sorted(con.sql(sql).columns)
        drows = Counter(
            tuple(repr(x) for x in row)
            for row in con.sql(
                f"SELECT {', '.join(dcols)} FROM ({sql})"
            ).fetchall()
        )
        t_duck = time.perf_counter() - t0
        ok = scols == dcols and srows == drows
        n_ok += ok
        print(
            f"{name}: {'EXACT' if ok else 'MISMATCH'} "
            f"rows={sum(srows.values())} spark={t_spark:.1f}s "
            f"duckdb={t_duck:.1f}s"
        )
        if not ok:
            only_s = list((srows - drows).items())[:2]
            only_d = list((drows - srows).items())[:2]
            print("  spark-only:", only_s)
            print("  oracle-only:", only_d)
        sys.stdout.flush()
    print(f"{n_ok}/{len(names)} exact")
    spark.stop()


if __name__ == "__main__":
    main()
