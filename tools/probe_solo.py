"""Solo best-of-N timing probe for named registry queries.

Usage: python tools/probe_solo.py [--sf DIR] [--passes 2] name...

Times each query with the noop sink (guide §1.4) in one session,
clearing the DataFrame cache between passes, and prints per-pass and
best-of-N wall seconds.  Protocol queries re-run their ledger side
effects each pass, same as bench.py's methodology.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.session import build_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = build_session("probe-solo")
    from data_seedling_spark.queries import registry

    reg = registry()
    for name in args.names:
        best = float("inf")
        for i in range(args.passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}")
            t0 = time.time()
            reg[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = min(best, dt)
            print(f"{name} pass{i}: {dt:.3f}s", flush=True)
        print(f"{name} BEST {best:.3f}", flush=True)


if __name__ == "__main__":
    main()
