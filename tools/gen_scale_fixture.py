"""Build an sf1.0-equivalent fixture (10x sf0.1) for scale probing
(VERDICT r7 task #2).

The driver's generator (seed 42) is not available, so the 10x point is
synthesized from the read-only sf0.1 tables by REPLICATION with
consistent key offsets — the construction is chosen so every heavy
query's workload SHAPE scales the way a real 10x corpus would:

- Fact/corpus tables (documents, embeddings, lineitem, orders, events,
  customer, supplier, part) get 10 replicas; replica r offsets every
  key column by r * (max_key + 1), applied CONSISTENTLY across tables
  (orders.o_custkey moves with customer.c_custkey, lineitem moves with
  orders/part/supplier, events.user_id with customer) so join
  fan-outs are preserved, not multiplied.
- String identity fields that drive dedup/linkage (documents.text,
  part name/brand/type) are replica-TAGGED (every token suffixed
  ``_r{r}``; r=0 verbatim): each replica keeps the original's internal
  duplicate/linkage structure but replicas never collide, so pair
  outputs scale linearly (10x) instead of quadratically (100x) — the
  honest model of "10x more data with the same duplication rate".
  Verbatim replication would instead put 10 copies of every document
  in one LSH bucket and grade the engine on an artificial 100x blowup.
- Embeddings perturb component 0 by r * 1e-3 (labels kept): ANN cell
  routing and top-k structure stay realistic without 10-way exact
  ties.
- Dimension tables (region, nation) copy verbatim — at 100 TB the
  dims don't grow with the fact side.

Usage: python tools/gen_scale_fixture.py [--emb-only] [out_dir] [replicas]
Writes parquet tables (same names/schemas as the driver fixtures) to
out_dir (default .scale/sf1). Idempotent: skips tables already present.

--emb-only (VERDICT r8 task #2: the ANN tier was the one family whose
10x point the sf1 fixture could not exercise — embeddings grew only
2k→20k, session overhead dominated): replicate ONLY the embeddings
table (replica r offsets vec_id, perturbs component 0 by r·1e-3,
KEEPS labels — so IVF cell count stays fixed and every cell's
occupancy scales by exactly the replica factor, the realistic
"10x more vectors, same quantizer" shape; the fixed query set
vec_id < n_queries lives in replica 0 verbatim).  All other tables
copy verbatim from sf0.1, so any registry query still runs and the
measured scaling isolates the embeddings axis.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def _tag_tokens(col: str, r: int):
    """Suffix every whitespace token with _r{r} (r=0 → verbatim)."""
    if r == 0:
        return F.col(col)
    return F.regexp_replace(F.col(col), r"(\S+)", rf"$1_r{r}")


def _replicate(
    df: DataFrame,
    n: int,
    offsets: dict[str, int],
    tag_cols: tuple[str, ...] = (),
    perturb_embedding: bool = False,
) -> DataFrame:
    out = []
    for r in range(n):
        rep = df
        for c, base in offsets.items():
            rep = rep.withColumn(c, (F.col(c) + F.lit(r * base)).cast("long"))
        for c in tag_cols:
            rep = rep.withColumn(c, _tag_tokens(c, r))
        if perturb_embedding and r:
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (F.element_at("embedding", 1) + F.lit(r * 1e-3)).cast(
                            "float"
                        )
                    ),
                    F.slice("embedding", 2, 10_000),
                ),
            )
        out.append(rep)
    res = out[0]
    for rep in out[1:]:
        res = res.unionByName(rep)
    return res


def main() -> None:
    args = list(sys.argv[1:])
    emb_only = "--emb-only" in args
    if emb_only:
        args.remove("--emb-only")
    out_dir = args[0] if args else ".scale/sf1"
    n = int(args[1]) if len(args) > 1 else 10
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("gen_scale_fixture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def src(t: str) -> DataFrame:
        return spark.read.parquet(f"{SRC}/{t}.parquet")

    def base(df: DataFrame, key: str) -> int:
        return int(df.agg(F.max(key)).first()[0]) + 1

    cust, sup, part = src("customer"), src("supplier"), src("part")
    orders, events = src("orders"), src("events")
    docs, emb = src("documents"), src("embeddings")
    nc, ns, np_ = base(cust, "c_custkey"), base(sup, "s_suppkey"), base(part, "p_partkey")
    no, ne = base(orders, "o_orderkey"), base(events, "event_id")
    nd, nv = base(docs, "doc_id"), base(emb, "vec_id")

    if emb_only:
        plans = {
            t: src(t)
            for t in (
                "region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents",
            )
        }
        plans["embeddings"] = _replicate(
            emb, n, {"vec_id": nv}, perturb_embedding=True
        )
    else:
        plans = _full_plans(src, n, nc, ns, np_, no, ne, nd, nv)
    for t, df in plans.items():
        dest = f"{out_dir}/{t}.parquet"
        if os.path.exists(dest):
            print(f"{t}: exists, skipped")
            continue
        df.write.mode("overwrite").parquet(dest)
        print(f"{t}: {spark.read.parquet(dest).count()} rows")
    spark.stop()


def _full_plans(src, n, nc, ns, np_, no, ne, nd, nv):
    cust, sup, part = src("customer"), src("supplier"), src("part")
    orders, events = src("orders"), src("events")
    docs, emb = src("documents"), src("embeddings")
    return {
        "region": src("region"),
        "nation": src("nation"),
        "customer": _replicate(cust, n, {"c_custkey": nc}),
        "supplier": _replicate(sup, n, {"s_suppkey": ns}),
        "part": _replicate(
            part, n, {"p_partkey": np_}, tag_cols=("p_name", "p_brand", "p_type")
        ),
        "orders": _replicate(orders, n, {"o_orderkey": no, "o_custkey": nc}),
        "lineitem": _replicate(
            src("lineitem"),
            n,
            {"l_orderkey": no, "l_partkey": np_, "l_suppkey": ns},
        ),
        "events": _replicate(events, n, {"event_id": ne, "user_id": nc}),
        "documents": _replicate(
            docs, n, {"doc_id": nd}, tag_cols=("text",)
        ),
        "embeddings": _replicate(
            emb, n, {"vec_id": nv}, perturb_embedding=True
        ),
    }


if __name__ == "__main__":
    main()
