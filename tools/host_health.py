"""15-second host-health probe: runs ONLY bench.py's two calibration
basket components and prints their ratios vs the recorded anchors.

Use before attempting a full bench re-record: ratios near 1.0x mean
the shared box is healthy enough for a pass of record; the r14
optimization phase saw 1.9x-3.9x during degraded windows.

Usage: python tools/host_health.py [--samples 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=2)
    args = ap.parse_args()

    import bench
    from data_seedling_spark.session import build_session

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BASELINE_CALIBRATION.json")) as f:
        anchors = json.load(f)

    spark = build_session("host-health")
    cal = min(bench.calibration_run(spark) for _ in range(args.samples))
    cal_text = min(
        bench.calibration_text_run(spark) for _ in range(args.samples)
    )
    r1 = cal / anchors["calibration_sec"]
    r2 = cal_text / anchors["calibration_text_sec"]
    print(
        f"scan/shuffle {cal:.3f}s = {r1:.2f}x anchor | "
        f"text {cal_text:.3f}s = {r2:.2f}x anchor | "
        f"worst {max(r1, r2):.2f}x"
    )


if __name__ == "__main__":
    main()
