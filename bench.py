"""Per-round benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line ``{"metric", "value", "unit", "queries", "sf"}``.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collection cost). Timing excludes session startup and a
one-query JVM warmup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_seedling_spark.session import build_session  # noqa: E402

#: Headline set: one per major operator family; extended as phases land.
HEADLINE = [
    "flagship_revenue_by_nation",
    "pricing_summary",
    "join_segment_rollup",
    "filter_predicates",
    "salted_hash_ids",
    "merge_insert_apply",
    "distinct_users_by_type",
    "datetime_truncation",
    "window_top_orders_per_segment",
    "sessionize_events",
    "asof_join_purchase_click",
    "tumbling_window_events",
    "sql_api_shipping_priority",
    "dedup_exact_documents",
    "minhash_lsh_near_dup",
    "similarity_topk_bruteforce",
    "ivf_ann_topk",
    "text_quality_scores",
    "pseudonymise_customers",
    "feature_extract_documents",
    "train_test_split_hash",
    "sequence_packing_bins",
    "split_contamination_check",
    "embedding_near_dup",
    "nation_trade_volume",
]


def run_one(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = build_session("bench")

    from data_seedling_spark.queries import registry

    reg = registry()
    names = [n for n in HEADLINE if n in reg]

    # Warm up the JVM / parquet footer caches on a small query.
    if names:
        run_one(reg[names[0]].fn, spark, sf_dir)

    # Steady-state timing: whole-stage codegen compiles on first
    # execution (measured ~7s for the widest generated method), so run
    # each query twice and report the better run.
    timings: dict[str, float] = {}
    for name in names:
        first = run_one(reg[name].fn, spark, sf_dir)
        second = run_one(reg[name].fn, spark, sf_dir)
        timings[name] = round(min(first, second), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
