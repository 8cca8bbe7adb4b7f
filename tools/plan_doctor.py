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
- ``global_window``: PARTITION-LESS window specs (``... OVER (ORDER BY
  ...)`` with no partition key) — WindowExec moves the window's entire
  input through ONE task, the single-partition sort that made
  woe_iv/rfm scale-killers at 100× (VERDICT r10 #1/#2). Sanctioned
  per-name via config.GLOBAL_WINDOW_ALLOWED for queries whose window
  input is a bounded frame (sketch centroids, bin/score grids,
  calendar series, top-k shortlists); any UNSANCTIONED hit is a hard
  anti-pattern. Fact-sized ranking belongs on
  operators/sampling.range_rank instead.

Usage: python tools/plan_doctor.py [--sf DIR] [names...]
Exit code 1 if any query shows a cartesian product, row-wise Python,
or an unsanctioned global window (the hard anti-patterns), 0 otherwise.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_seedling_spark.config import (  # noqa: E402
    GLOBAL_WINDOW_ALLOWED,
    GLOBAL_WINDOW_PATTERN,
    PYTHON_ROWWISE_ALLOWED,
)
from data_seedling_spark.session import build_session  # noqa: E402

#: windowspecdefinition whose FIRST argument is already an ordered
#: column/expression (`expr ASC/DESC ...`) — i.e. no partition
#: columns. Single source of truth in config (shared with
#: tests/test_plans.py so the two gates cannot disagree).
GLOBAL_WINDOW_RE = re.compile(GLOBAL_WINDOW_PATTERN)


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
        "global_window": len(GLOBAL_WINDOW_RE.findall(plan)),
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
        f"{'query':42s} cart bnlj pyRow pyArrow exch codegen pushed gWin"
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
        unsanctioned_gwin = (
            a["global_window"] and name not in GLOBAL_WINDOW_ALLOWED
        )
        if (a["cartesian"] or a["python_rowwise"] or unsanctioned_udtf
                or a["quad_frame"] or unsanctioned_gwin):
            flag = "  <-- ANTI-PATTERN"
            bad += 1
        elif a["python_udtf"]:
            flag = "  (sanctioned UDTF demo)"
        elif a["global_window"]:
            flag = "  (sanctioned bounded-frame global window)"
        print(
            f"{name:42s} {a['cartesian']:4d} {a['bnlj']:4d} "
            f"{a['python_rowwise'] + a['python_udtf']:5d} {a['python_arrow']:7d} "
            f"{a['exchanges']:4d} {a['codegen_spans']:7d} "
            f"{a['pushed_scans']:6d} {a['global_window']:4d}{flag}"
        )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
