"""Plan doctor: per-query physical-plan audit for scale anti-patterns.

Runs each registry query's plan (no execution) and reports the
signals a 100 TB deployment cares about — the user-facing face of the
regression locks in tests/test_plans.py:

- ``cartesian``: CartesianProduct nodes (all-pairs explosion).
- ``bnlj``: BroadcastNestedLoopJoin nodes (non-equi fallback; fine for
  tiny broadcast sides, fatal for two big inputs).
- ``python``: row-at-a-time Python eval (BatchEvalPython). Arrow-batch
  pandas UDFs (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
  are reported separately — they are the sanctioned slow path.
- ``exchanges``: shuffle count in the plan.
- ``codegen``: WholeStageCodegen span count (bigger spans = more of
  the plan fused into JVM loops).
- ``scan_pushdown``: parquet scans carrying PushedFilters.
- ``quad_frame``: window frames ending at UNBOUNDED FOLLOWING with a
  non-unbounded start — Spark's UnboundedFollowingWindowFunctionFrame
  re-scans to the partition end for EVERY row (O(n²) per partition;
  the interpolate_linear bug r8 found and fixed). Express forward
  scans as descending running frames instead. Whole-partition frames
  (UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) evaluate once and are
  fine.

Usage: python tools/plan_doctor.py [--sf DIR] [names...]
Exit code 1 if any query shows a cartesian product or row-wise Python
(the two hard anti-patterns), 0 otherwise.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.config import PYTHON_ROWWISE_ALLOWED  # noqa: E402
from data_seedling_spark.session import build_session  # noqa: E402


def audit_plan(plan: str) -> dict:
    # BatchEvalPythonUDTF (table function) is counted apart from plain
    # row-wise BatchEvalPython: the registry carries exactly one
    # sanctioned UDTF demo (config.PYTHON_ROWWISE_ALLOWED), gated by
    # name below rather than blanket-tolerated.
    udtf = plan.count("BatchEvalPythonUDTF")
    return {
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "python_udtf": udtf,
        "python_rowwise": plan.count("BatchEvalPython") - udtf,
        "python_arrow": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        ),
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "pushed_scans": len(
            re.findall(r"PushedFilters: \[[^\]]+\]", plan)
        ),
        "quad_frame": len(
            re.findall(
                r"specifiedwindowframe\((?:Row|Range)Frame, "
                r"(?!unboundedpreceding)[^,]+, unboundedfollowing\$\(\)\)",
                plan,
            )
        ),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = entry.queries()
    names = args.names or list(qs)
    spark = build_session("plan-doctor", master="local[4]")
    bad = 0
    header = (
        f"{'query':42s} cart bnlj pyRow pyArrow exch codegen pushed"
    )
    print(header)
    print("-" * len(header))
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:42s} PLAN-ERROR {type(e).__name__}")
            bad += 1
            continue
        a = audit_plan(plan)
        flag = ""
        unsanctioned_udtf = a["python_udtf"] and name not in PYTHON_ROWWISE_ALLOWED
        if (a["cartesian"] or a["python_rowwise"] or unsanctioned_udtf
                or a["quad_frame"]):
            flag = "  <-- ANTI-PATTERN"
            bad += 1
        elif a["python_udtf"]:
            flag = "  (sanctioned UDTF demo)"
        print(
            f"{name:42s} {a['cartesian']:4d} {a['bnlj']:4d} "
            f"{a['python_rowwise'] + a['python_udtf']:5d} {a['python_arrow']:7d} "
            f"{a['exchanges']:4d} {a['codegen_spans']:7d} "
            f"{a['pushed_scans']:6d}{flag}"
        )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
