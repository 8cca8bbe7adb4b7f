"""Per-job attribution for a registry query: wall time vs the sum of
Spark job execution times, plus each job's duration/description — the
r14 #7 methodology (driver/action-bound queries show wall >> job sum,
and many small jobs instead of a few big ones).

Usage: python tools/profile_jobs.py [--sf DIR] [--passes 1] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.session import build_session  # noqa: E402


def jobs(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/jobs", timeout=10
    ) as resp:
        return json.load(resp)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = build_session(
        "profile-jobs", extra_conf={"spark.ui.enabled": "true"}
    )
    from data_seedling_spark.queries import registry

    reg = registry()
    # one warmup to compile codegen paths
    spark.catalog.clearCache()
    reg[args.names[0]].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args.names:
        for p in range(args.passes):
            spark.catalog.clearCache()
            seen = {j["jobId"] for j in jobs(spark)}
            t0 = time.time()
            reg[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            time.sleep(0.3)
            new = [j for j in jobs(spark) if j["jobId"] not in seen]
            total_ms = 0
            rows = []
            for j in sorted(new, key=lambda j: j["jobId"]):
                try:
                    t_sub = time.mktime(time.strptime(
                        j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                    t_end = time.mktime(time.strptime(
                        j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                    frac = (float(j["submissionTime"][20:23]) / 1000,
                            float(j["completionTime"][20:23]) / 1000)
                    dur = (t_end + frac[1]) - (t_sub + frac[0])
                except Exception:
                    dur = float("nan")
                total_ms += dur
                rows.append((j["jobId"], dur, j.get("numTasks", -1),
                             (j.get("description") or j.get("name", ""))[:90]))
            print(f"== {name} pass{p}: wall {wall:.2f}s, jobs {len(new)}, "
                  f"job-sum {total_ms:.2f}s, gap {wall - total_ms:.2f}s")
            for jid, dur, ntasks, desc in rows:
                print(f"  job {jid:4d} {dur:6.2f}s {ntasks:5d}t  {desc}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
