"""Parquet codec study: size vs scan cost for the engine's hot table.

Usage: python tools/bench_compression.py [sf_dir]

Writes lineitem under snappy / zstd / uncompressed, then times a
full-scan aggregate per codec (best of 3). Findings feed
docs/SCALE.md §storage — at 100 TB the codec choice moves BOTH the
storage bill and the scan throughput, and the right answer depends on
whether the cluster is IO-bound (zstd wins) or CPU-bound (snappy
wins); this harness measures the crossover for this workload shape.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.session import build_session  # noqa: E402
from data_seedling_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("bench-compression")
    lineitem = load_table(spark, sf_dir, "lineitem")
    base = tempfile.mkdtemp(prefix="codec_")
    out = {}
    try:
        for codec in ("snappy", "zstd", "uncompressed"):
            path = os.path.join(base, codec)
            lineitem.write.option("compression", codec).parquet(path)
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
            )
            best = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.time()
                spark.read.parquet(path).selectExpr(
                    "sum(l_extendedprice)", "count(distinct l_partkey)"
                ).collect()
                best = min(best, time.time() - t0)
            out[codec] = {"mb": round(size / 1e6, 1), "scan_s": round(best, 3)}
            print(f"{codec:14s} {out[codec]['mb']:8.1f} MB   scan {out[codec]['scan_s']:.3f}s")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
