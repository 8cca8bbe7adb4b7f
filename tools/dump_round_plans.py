"""Dump the PER-ROUND physical plan of the iterative graph operators.

The registry queries return localCheckpoint scans (the iterative work
is already materialized), so ``dump_plans.py`` captures a stub. This
tool rebuilds ONE round's contribution frame for each operator at the
bench scale factor and writes its formatted plan — the artifact that
shows the per-round join strategy (the thing the r14 broadcast-state
optimization changes).

Usage: python tools/dump_round_plans.py --suffix _after [names...]
Names: bfs_level bellman_relax lpa_round pagerank_round hits_round
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_seedling_spark.session import build_session  # noqa: E402
from data_seedling_spark.tables import load_table  # noqa: E402


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--plain",
        action="store_true",
        help="pre-r14 shape: state joined without the broadcast hint",
    )
    ap.add_argument("names", nargs="*", default=[])
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spark = build_session("dump-round-plans")

    from data_seedling_spark.operators import graph

    li = load_table(spark, args.sf, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("w"))
    )

    plans: dict[str, object] = {}

    def one_round(fn, **kw):
        """Run the operator with rounds/hops=1 and capture the LAST
        lazily-built frame BEFORE its checkpoint materializes — not
        possible through the public API, so replicate the round body
        exactly as the operator spells it (kept in sync by eyeball +
        the Exchange/join-strategy assertions living in the committed
        plan files themselves)."""
        return fn(edges, **kw)

    sym = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )

    if not args.names or "bfs_level" in args.names:
        src = sym.agg(F.min("a").alias("node"))
        frontier = src.select("node", F.lit(0).alias("hops")).localCheckpoint()
        visited = frontier
        nxt = (
            sym.join(graph._state(frontier, not args.plain), sym.a == frontier.node)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(graph._state(visited.select("node"), not args.plain), "node", "left_anti")
            .withColumn("hops", F.lit(1))
        )
        plans["bfs_level"] = nxt

    if not args.names or "bellman_relax" in args.names:
        symw = edges.select(
            F.col("u").alias("a"), F.col("v").alias("b"), F.col("w")
        ).unionByName(
            edges.select(F.col("v").alias("a"), F.col("u").alias("b"), F.col("w"))
        )
        srcw = symw.agg(F.min("a").alias("node"))
        dist = srcw.select(
            "node", F.lit(0).cast("long").alias("cost")
        ).localCheckpoint()
        relaxed = (
            symw.join(graph._state(dist, not args.plain), symw.a == dist.node)
            .select(F.col("b").alias("node"), (F.col("cost") + F.col("w")).alias("cost"))
            .unionByName(dist.select("node", "cost"))
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        plans["bellman_relax"] = relaxed

    if not args.names or "hits_round" in args.names:
        h = sym.select(F.col("a").alias("c")).distinct().withColumn(
            "s", F.lit(1000000).cast("long")
        ).localCheckpoint()
        ed = sym.select(F.col("a").alias("c"), F.col("b").alias("p"))
        a_raw = (
            ed.join(graph._state(h.withColumnRenamed("s", "hs"), not args.plain), "c")
            .groupBy("p")
            .agg(F.sum("hs").alias("s"))
        )
        plans["hits_round"] = a_raw

    for name, df in plans.items():
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(_fmt(df))
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
