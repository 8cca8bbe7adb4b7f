"""Skew-join strategy benchmark: AQE skew-split vs salted_join.

Synthesizes a large fact table whose join key is heavily skewed (a
configurable fraction of all rows carries ONE hot key; the rest are
uniform) and a non-broadcastable dimension, then times the same
inner-join + aggregate under:

  1. plain sort-merge join, AQE off          (the naive baseline)
  2. sort-merge join, AQE on + skewJoin on   (Spark's runtime fix)
  3. salted_join at several salt factors     (the static fix)

Broadcast is disabled throughout — with a broadcastable dim the right
answer is always F.broadcast and skew is moot; this benchmark is about
the both-sides-large regime where a 100 TB fact meets a 100 GB dim.

Prints one JSON line per strategy; run with
``python tools/bench_skew.py [--rows 20000000] [--hot 0.5]``.
Findings are recorded in docs/SCALE.md §skew.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.operators.relational import salted_join  # noqa: E402
from data_seedling_spark.session import build_session  # noqa: E402


def make_frames(spark, n_rows: int, n_keys: int, hot_frac: float):
    """Skewed fact: ``hot_frac`` of rows on key 0, rest uniform; dim =
    one row per key. Deterministic (seeded rand, id-derived values)."""
    big = spark.range(n_rows).select(
        F.when(F.rand(seed=7) < hot_frac, F.lit(0))
        .otherwise((F.col("id") % (n_keys - 1)) + 1)
        .alias("key"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("key"), (F.col("id") % 97).cast("double").alias("w")
    )
    return big, small


def run_join(df) -> float:
    t0 = time.time()
    df.groupBy().agg(F.count("*").alias("n"), F.sum("v").alias("sv")).write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--hot", type=float, default=0.5)
    ap.add_argument("--salts", type=str, default="4,16,32")
    args = ap.parse_args()

    spark = build_session("bench-skew")
    # Force the shuffle-join regime the benchmark is about.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    big, small = make_frames(spark, args.rows, args.keys, args.hot)
    big.persist().count()  # materialise inputs out of the timed region
    small.persist().count()

    results: list[dict] = []

    def record(strategy: str, seconds: float, **extra) -> None:
        row = {
            "strategy": strategy,
            "sec": seconds,
            "rows": args.rows,
            "keys": args.keys,
            "hot_frac": args.hot,
            **extra,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # 1. plain SMJ, AQE off — every hot-key row lands in one task
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    record("smj_no_aqe", run_join(big.join(small, "key")))

    # 2. AQE skew-split — Spark splits the oversized partition at runtime
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Local-mode partitions are small; lower the skew thresholds so the
    # splitter actually engages at benchmark scale (cluster defaults
    # 5x/256MB target much bigger partitions).
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    record("smj_aqe_skewjoin", run_join(big.join(small, "key")))

    # 3. salted joins (AQE stays on, as in production)
    for factor in (int(s) for s in args.salts.split(",")):
        record(
            f"salted_{factor}",
            run_join(salted_join(big, small, "key", salt_factor=factor)),
            salt_factor=factor,
        )

    best = min(results, key=lambda r: r["sec"])
    print(
        json.dumps(
            {"metric": "skew_join_best", "strategy": best["strategy"], "sec": best["sec"]}
        )
    )


if __name__ == "__main__":
    main()
