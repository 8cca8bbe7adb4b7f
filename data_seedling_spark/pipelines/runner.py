"""Pipeline DAG orchestration (reference ``pipeline.json`` analogue).

The reference chains activities through ADF ``dependsOn`` edges
(SURVEY §1.1 "Pipeline DAG"; reference ``patient_notes/pipeline.json:5-55``
— pseudonymisation → feature_extraction). Here the DAG is plain Python:
activities are callables, edges are names, execution is a deterministic
topological order with per-activity success/failure accounting — the
driver-side control plane, with all data movement staying in Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter


@dataclass
class Activity:
    """One pipeline stage (ADF activity analogue)."""

    name: str
    fn: object  # Callable[[], Any]
    depends_on: list[str] = field(default_factory=list)


@dataclass
class ActivityResult:
    name: str
    status: str  # "succeeded" | "failed" | "skipped"
    error: str | None = None
    output: object = None


class PipelineError(RuntimeError):
    pass


def run_pipeline(activities: list[Activity]) -> dict[str, ActivityResult]:
    """Execute activities in dependency order. A failed activity marks
    every transitive dependent as skipped (ADF semantics for the
    default 'Succeeded' dependency condition); independent branches
    still run."""
    by_name = {a.name: a for a in activities}
    unknown = {d for a in activities for d in a.depends_on} - set(by_name)
    if unknown:
        raise PipelineError(f"depends_on references unknown activities: {sorted(unknown)}")

    order = list(TopologicalSorter({a.name: set(a.depends_on) for a in activities}).static_order())
    results: dict[str, ActivityResult] = {}
    for name in order:
        act = by_name[name]
        failed_dep = next(
            (d for d in act.depends_on if results[d].status != "succeeded"), None
        )
        if failed_dep is not None:
            results[name] = ActivityResult(name, "skipped", f"dependency {failed_dep} did not succeed")
            continue
        try:
            results[name] = ActivityResult(name, "succeeded", output=act.fn())
        except Exception as e:  # noqa: BLE001 — fault isolation per activity
            results[name] = ActivityResult(name, "failed", str(e))
    return results
