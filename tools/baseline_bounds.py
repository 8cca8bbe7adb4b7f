"""Parse the per-query 2x bounds out of BASELINE.md.

BASELINE.md is the human-readable ledger of best-of-2 sf0.1 baselines
(one table per batch of headline additions, in two layouts: 3-column
``| query | sec | bound |`` and the doubled 6-column variant). This
module is the single machine-readable view of it, shared by:

- ``bench.py`` — refuses to run when a HEADLINE query has no recorded
  bound (VERDICT r8 "What's wrong" #1: 15 queries were benched for a
  round with no falsifiable bound), and reports per-query 2x-bound
  violations in the payload;
- ``tests/test_bench_contract.py`` — the same guard as a red test, so
  the gap is caught at commit time, before a bench run.

One alias exists: the r1 table baselined ``embedding_near_dup``; r2
replaced it in the headline set with ``embedding_near_dup_ivf`` and
BASELINE.md's dagger note carries the entry over.
"""

from __future__ import annotations

import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: name-in-table -> name-in-HEADLINE carryovers (documented in BASELINE.md).
ALIASES = {"embedding_near_dup": "embedding_near_dup_ivf"}

_NAME = re.compile(r"[a-z][a-z0-9_]+$")


def time_bounds(path: str | None = None) -> dict[str, tuple[float, float]]:
    """``{query: (baseline_sec, two_x_bound_sec)}`` from every markdown
    table row in BASELINE.md. A row cell counts as a query name when it
    is snake_case (trailing footnote daggers stripped) and the next two
    cells parse as floats — this covers both the 3- and 6-column
    layouts without caring which section a table lives in. Later tables
    override earlier ones (re-baselining adjudications do this)."""
    path = path or os.path.join(_REPO, "BASELINE.md")
    bounds: dict[str, tuple[float, float]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("|"):
                continue
            cells = [c.strip() for c in line.strip("|").split("|")]
            for j in range(len(cells) - 2):
                name = re.sub(r"[^\w].*$", "", cells[j])
                if not _NAME.match(name):
                    continue
                try:
                    sec, bound = float(cells[j + 1]), float(cells[j + 2])
                except ValueError:
                    continue
                bounds[ALIASES.get(name, name)] = (sec, bound)
    return bounds


def unbounded(headline: list[str], path: str | None = None) -> list[str]:
    """Headline queries with no recorded 2x bound — must be empty."""
    bounds = time_bounds(path)
    return [n for n in headline if n not in bounds]
