"""CLI entry point — the spark-submit-able twin of the reference's
``entrypoints/`` modules (reference ``patient_notes/src/patient_notes/
entrypoints/pseudonymisation.py``: build session → run stage →
write/monitor). One binary surface for every registry query::

    python -m data_seedling_spark list [--tag TAG]
    python -m data_seedling_spark run <query> [--sf-dir DIR] [-n N]
    python -m data_seedling_spark explain <query> [--sf-dir DIR]
    python -m data_seedling_spark bench <query> [--sf-dir DIR] [--passes P]

``run`` prints up to N rows as JSON lines (machine-consumable, like
the driver contract); ``explain`` prints the formatted physical plan —
the same artifact the plan tests assert on; ``bench`` times
materialisation; ``doctor`` audits the plan for scale anti-patterns
(cartesians, row-wise Python — JSON verdict, exit 1 on a hit). Exit
code 1 on unknown query names, listing near matches.
"""

from __future__ import annotations

import argparse
import difflib
import json
import sys
import time


def _build(args):
    from .session import build_session

    return build_session("data_seedling_spark.cli")


def _resolve(reg, name: str):
    if name in reg:
        return reg[name]
    near = difflib.get_close_matches(name, reg.keys(), n=5, cutoff=0.4)
    sys.stderr.write(
        f"unknown query {name!r}; near matches: {', '.join(near) or '(none)'}\n"
    )
    raise SystemExit(1)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_seedling_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registry queries")
    lp.add_argument("--tag", default=None, help="filter by tag substring")

    for cmd, hlp in (
        ("run", "run a query, print JSON rows"),
        ("explain", "print the formatted physical plan"),
        ("bench", "time a query's materialisation"),
        ("doctor", "audit the physical plan for scale anti-patterns"),
    ):
        cp = sub.add_parser(cmd, help=hlp)
        cp.add_argument("query")
        cp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if cmd == "run":
            cp.add_argument("-n", type=int, default=20, help="max rows printed")
        if cmd == "bench":
            cp.add_argument("--passes", type=int, default=2)

    args = p.parse_args(argv)

    from .queries import registry

    reg = registry()

    if args.cmd == "list":
        for name, spec in reg.items():
            tags = ",".join(getattr(spec, "tags", ()) or ())
            if args.tag and args.tag not in tags:
                continue
            oracle = "oracle" if getattr(spec, "oracle", None) else "rows-only"
            print(f"{name}\t{oracle}\t{tags}")
        return 0

    spec = _resolve(reg, args.query)
    spark = _build(args)
    df = spec.fn(spark, args.sf_dir)

    if args.cmd == "explain":
        df.explain("formatted")
        return 0

    if args.cmd == "doctor":
        import os as _os
        import sys as _sys

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), "tools")
        )
        from plan_doctor import audit_plan

        plan = df._jdf.queryExecution().executedPlan().toString()
        audit = audit_plan(plan)
        audit["query"] = args.query
        audit["anti_pattern"] = bool(
            audit["cartesian"] or audit["python_rowwise"]
        )
        print(json.dumps(audit))
        return 1 if audit["anti_pattern"] else 0

    if args.cmd == "bench":
        best = float("inf")
        for _ in range(max(args.passes, 1)):
            t0 = time.time()
            n = df.count()
            best = min(best, time.time() - t0)
            df = spec.fn(spark, args.sf_dir)
        print(json.dumps({"query": args.query, "rows": n, "best_sec": round(best, 3)}))
        return 0

    # run
    for row in df.limit(args.n).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
