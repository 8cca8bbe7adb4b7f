"""Scaling probe: run each headline query ONCE at two SF dirs and
print an incremental JSON line per (query, sf) — robust to timeouts
(a killed run keeps everything measured so far), unlike bench.py's
end-of-run summary. Pair with tools/gen_scale.py's 10× replica set:
a healthy query's wall-clock ratio at 10× data on a fixed 32-core box
is ≤~10× (linear work, fixed parallelism) and usually far less for
overhead-dominated queries; super-linear ratios flag quadratic
candidate generation or driver-side collapse.

Usage: python tools/scale_probe.py --sf /tmp/sf1 [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # Probe the same configuration bench.py times: the Arrow/BLAS
    # kernels (the library default; registry entries pin the fold for
    # oracle exactness unless this is set — see similarity.oracle_arrow).
    # Without it the ANN-family rows measure the deliberately-slow
    # engine-exact fold and read as phantom regressions.
    os.environ.setdefault("DS_SPARK_BENCH_ARROW", "1")

    import bench

    from data_seedling_spark.queries import registry

    spark = build_session("scale-probe")
    reg = registry()
    names = args.names or [n for n in bench.HEADLINE if n in reg]
    bench.run_one(reg[names[0]].fn, spark, args.sf)  # warmup
    for name in names:
        try:
            t = bench.run_one(reg[name].fn, spark, args.sf)
            print(json.dumps({"query": name, "sec": round(t, 3)}), flush=True)
        except Exception as e:  # noqa: BLE001 - keep probing
            print(
                json.dumps({"query": name, "error": type(e).__name__}),
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
