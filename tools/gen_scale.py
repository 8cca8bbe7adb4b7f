"""Scale-probe data generator: replicate an existing SF directory K×
with disjoint key spaces, producing a self-consistent larger dataset
(each replica is a closed "shard" — every FK join lands inside its own
replica, so join/group cardinalities scale linearly with K, which is
exactly the property a scaling probe needs).

Dimension tables (region, nation) are shared across replicas, like a
real warehouse. Every surrogate key is offset by ``replica * OFFSET``;
unique-but-non-joining ids (event_id, doc_id, vec_id) get the same
treatment so dedup/sketch queries see K× distinct entities. Document
TEXT is seeded-perturbed per clone (see :func:`_perturbed_text`) so
the duplicate rate stays constant as the corpus grows instead of
every doc becoming a K-clique of verbatim copies.

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


def _perturbed_text(k: int, dup_copies: float, sub_rate: float):
    """Column expression for the documents ``text`` under replication.

    Cloning text verbatim K× is NOT what K× real data looks like: every
    source doc becomes a K-clique of exact duplicates, so any pair-
    listing dedup (Jaccard self-join, MinHash-LSH) emits O(K²) pairs
    per doc and the sf10 probe measures the generator, not the
    operator (r9 VERDICT "what's wrong": prefix_filter_jaccard_join
    read 50×/decade purely from 110× more OUTPUT). Real corpora keep a
    roughly constant duplicates-per-document rate as they grow, so
    pair counts scale ~linearly with corpus size. Model that:

    - each source doc keeps an EXACT copy in ``dup_copies`` replicas
      on average, chosen by a seeded coin keyed on (doc_id, _rep) —
      constant expected clique size regardless of K, so exact/near-dup
      output grows linearly with the corpus;
    - every other clone gets a deterministic per-(doc, replica, token)
      substitution at ``sub_rate``: token i is replaced by a replica-
      salted variant when xxhash64(doc_id, _rep, i) lands under the
      rate. At the default 0.35 the clone-vs-original Jaccard is
      ≈ (1-s)/(1+s) ≈ 0.48, safely below the 0.8 near-dup thresholds,
      and two different perturbed replicas are farther apart still.

    Everything is hash-derived — no Math.random — so regeneration is
    bit-identical and DuckDB-side oracles replay the same corpus.
    """
    pct = int(round(sub_rate * 100))
    # mille-grid so FRACTIONAL dup_copies work: pmod(h, k) < 0.5 would
    # quantize up to 1.0 (integer pmod), doubling the requested rate
    keep_exact = F.pmod(
        F.xxhash64(F.col("doc_id"), F.col("_rep")), F.lit(1000 * k)
    ) < F.lit(int(round(1000 * dup_copies)))
    perturbed = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t, i: F.when(
                F.pmod(F.xxhash64(F.col("doc_id"), F.col("_rep"), i), 100)
                < pct,
                F.concat(t, F.lit("~r"), F.col("_rep").cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    return (
        F.when((F.col("_rep") == 0) | keep_exact, F.col("text"))
        .otherwise(perturbed)
        .alias("text")
    )


def scale_table(
    spark,
    src: str,
    dst: str,
    table: str,
    k: int,
    dup_copies: float = 1.0,
    sub_rate: float = 0.35,
) -> int:
    df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
    keys = KEY_COLS[table]
    if not keys:  # shared dimension
        out = df
    else:
        replicas = spark.range(k).select(F.col("id").alias("_rep"))
        ts_cols = TS_COLS.get(table, {})
        perturb_text = table == "documents" and sub_rate > 0
        cols = []
        for c in df.columns:
            if c in keys:
                cols.append((F.col(c) + F.col("_rep") * OFFSET).alias(c))
            elif c in ts_cols:
                cols.append(F.expr(f"{c} + {ts_cols[c]}").alias(c))
            elif c == "text" and perturb_text:
                cols.append(_perturbed_text(k, dup_copies, sub_rate))
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
        if perturb_text and "n_chars" in df.columns:
            # keep the metadata column consistent with the text it
            # describes after perturbation
            out = out.withColumn("n_chars", F.length("text").cast("long"))
        # Scatter the K replicas of each source row across output
        # files: the crossJoin emits a row's clones contiguously, so
        # without this every probe stage inherits a straggler split
        # holding the K copies of the LARGEST rows (measured: one task
        # pinning a 16-task stage for minutes at k=100). Hashing on the
        # offset surrogate key spreads clones uniformly — the layout a
        # real ingest (arrival order) produces.
        n_files = max(16, min(256, 2 * k))
        out = out.repartition(n_files, F.col(keys[0]))
    out.write.mode("overwrite").parquet(os.path.join(dst, f"{table}.parquet"))
    return spark.read.parquet(os.path.join(dst, f"{table}.parquet")).count()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--dup-copies",
        type=float,
        default=1.0,
        help="expected EXACT-duplicate copies kept per source doc "
        "across all replicas (constant in k: real corpora keep a "
        "roughly fixed duplicate rate as they grow)",
    )
    ap.add_argument(
        "--sub-rate",
        type=float,
        default=0.35,
        help="per-token seeded substitution rate for non-duplicate "
        "document clones (0 restores verbatim cloning)",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to generate (default: "
        "all) — e.g. --tables documents for a text-only third-decade "
        "spot set without paying for a 300x lineitem",
    )
    args = ap.parse_args()
    spark = build_session("gen-scale")
    selected = (
        list(KEY_COLS)
        if args.tables is None
        else [t.strip() for t in args.tables.split(",") if t.strip()]
    )
    unknown = [t for t in selected if t not in KEY_COLS]
    if unknown:
        raise SystemExit(f"unknown tables: {unknown}")
    for table in selected:
        n = scale_table(
            spark,
            args.src,
            args.dst,
            table,
            args.k,
            dup_copies=args.dup_copies,
            sub_rate=args.sub_rate,
        )
        print(f"{table}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
