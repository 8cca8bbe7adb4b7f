"""Regenerate tools/registry_snapshot.txt — run at ROUND START.

The snapshot freezes the registry's names as of the start of the
round; tests/test_bench_contract.py::test_new_oracle_queries_enter_window
then fails if an oracle-backed query is added during the round without
also entering the driver's rotating verification window (queries.py
_ROTATING) — the gap VERDICT r9 #1 flagged (ten r9 queries landed after
the rotation was set and were never driver-verified).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from data_seedling_spark.queries import registry

    path = os.path.join(REPO, "tools", "registry_snapshot.txt")
    with open(path, "w") as f:
        f.write(
            "# Registry names at the START of the current round.\n"
            "# Regenerate at each round start: "
            "python tools/update_registry_snapshot.py\n"
            "# Used by tests/test_bench_contract.py to enforce that every\n"
            "# oracle-backed query added during the round enters the driver's\n"
            "# rotating verification window before round end (VERDICT r9 #1).\n"
        )
        f.write("\n".join(sorted(registry())) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
