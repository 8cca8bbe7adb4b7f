"""Scale-probe data generator: replicate an existing SF directory K×
with disjoint key spaces, producing a self-consistent larger dataset
(each replica is a closed "shard" — every FK join lands inside its own
replica, so join/group cardinalities scale linearly with K, which is
exactly the property a scaling probe needs).

Dimension tables (region, nation) are shared across replicas, like a
real warehouse. Every surrogate key is offset by ``replica * OFFSET``;
unique-but-non-joining ids (event_id, doc_id, vec_id) get the same
treatment so dedup/sketch queries see K× distinct entities.

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
                                 [--dst /tmp/sf1] [--k 10]
Writes parquet per table under --dst; idempotent (overwrites).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_seedling_spark.session import build_session  # noqa: E402

OFFSET = 1_000_000_000

#: table -> {timestamp column: per-replica shift interval} so K× data
#: spans ~K× calendar. Without this, replicas stack onto the same
#: dates and every time window densifies K× — the r7 probe measured
#: interval_join_ship_windows at a super-linear 12.6× purely from
#: that artifact (SCALE.md "replica artifact"); real 10× data spans
#: more time. The shift must match EACH table's own base span:
#: orders/lineitem span the TPC-H-ish ~7 years → 8 years/replica keeps
#: replica calendars disjoint; events span ~30 days → 1 month/replica
#: (an 8-year shift there made the sf1 events calendar 876× the base
#: span instead of 10×, and calendar-densifying queries like
#: interpolated_sparse_hourly built 640k-hour grids — a generator
#: artifact in the opposite direction). Order/lineitem shift by the
#: same rule, so intra-replica date arithmetic (ship vs order date)
#: is preserved.
TS_COLS = {
    "events": {"ts": "make_interval(0, _rep)"},
    "orders": {"o_orderdate": "make_interval(8 * _rep)"},
    "lineitem": {"l_shipdate": "make_interval(8 * _rep)"},
}

#: table -> columns to offset per replica
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}


def scale_table(spark, src: str, dst: str, table: str, k: int) -> int:
    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    keys = KEY_COLS[table]
    if not keys:  # shared dimension
        out = df
    else:
        replicas = spark.range(k).select(F.col("id").alias("_rep"))
        ts_cols = TS_COLS.get(table, {})
        cols = []
        for c in df.columns:
            if c in keys:
                cols.append((F.col(c) + F.col("_rep") * OFFSET).alias(c))
            elif c in ts_cols:
                cols.append(F.expr(f"{c} + {ts_cols[c]}").alias(c))
            elif c == "embedding":
                # Perturb vectors per replica: exact duplicates make
                # nearest-neighbor ties ubiquitous (argmin comparisons
                # between identical distances degenerate to id
                # tie-breaks), which is not what 10× real data looks
                # like. A deterministic per-replica epsilon keeps every
                # vector distinct while preserving cluster structure.
                cols.append(
                    F.transform(
                        F.col(c),
                        lambda x, i: x
                        + (F.col("_rep") + 1)
                        * (i + 1).cast("double")
                        * 1e-4,
                    ).alias(c)
                )
            else:
                cols.append(F.col(c))
        out = df.crossJoin(F.broadcast(replicas)).select(*cols)
    out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
    return spark.read.parquet(os.path.join(dst, f"{table}.parquet")).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    spark = build_session("gen-scale")
    for table in KEY_COLS:
        n = scale_table(spark, args.src, args.dst, table, args.k)
        print(f"{table}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
