"""Column-policy configuration model (reference ``common_types.py:20-56``,
``config.py:44-56``).

A ``TableConfig`` declares, per table, which columns get which
pseudonymisation treatment; ``pipelines.pseudonymise.pseudo_transform``
dispatches on it (UD3). This is engine configuration, not schema — the
DataFrame schema stays inherited/dynamic (SURVEY §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class ColumnType(Enum):
    """Treatment classes (reference ``common_types.py:20-28``)."""

    HASH = "hash"                    # salted SHA-256, renamed <col>_hashed
    ROUND_DATETIME = "round_datetime"  # date_trunc generalisation
    REMOVE = "remove"                # dropped entirely
    FREE_TEXT = "free_text"          # NLP anonymisation (entity masking)


class DateTimeRoundOpt(Enum):
    """Truncation granularity (reference ``common_types.py:31-36``)."""

    HOUR = "hour"
    DAY = "day"
    MONTH = "month"
    YEAR = "year"


#: Column-name conventions (SURVEY §1.2).
HASHED_SUFFIX = "_hashed"
EXTRACTED_SUFFIX = "_extracted"


@dataclass
class TableConfig:
    """Per-table policy (reference ``common_types.py:51-56``)."""

    primary_keys: list[str]
    hash_columns: list[str] = field(default_factory=list)
    round_datetime_columns: dict[str, DateTimeRoundOpt] = field(default_factory=dict)
    remove_columns: list[str] = field(default_factory=list)
    free_text_columns: list[str] = field(default_factory=list)
    analysed_columns: list[str] = field(default_factory=list)
    salt: str = ""


#: Demo policy over the synthetic star schema — the analogue of the
#: reference's TABLE_CONFIG for its Notes table (``config.py:44-56``).
TABLE_CONFIG: dict[str, TableConfig] = {
    "customer": TableConfig(
        primary_keys=["c_custkey"],
        hash_columns=["c_custkey"],
        remove_columns=["c_name"],
        salt="2b6ef354-salt",
    ),
    "events": TableConfig(
        primary_keys=["event_id"],
        hash_columns=["user_id"],
        round_datetime_columns={"ts": DateTimeRoundOpt.HOUR},
        remove_columns=["props"],
        salt="2b6ef354-salt",
    ),
    "documents": TableConfig(
        primary_keys=["doc_id"],
        free_text_columns=["text"],
        analysed_columns=["text"],
        salt="2b6ef354-salt",
    ),
}


#: Plan-hygiene allowlist shared by tools/plan_doctor.py and
#: tests/test_plans.py so the two anti-pattern gates can never
#: disagree. Exactly ONE sanctioned Python-UDTF demo exists in the
#: registry: ``udtf_token_spans`` is the API-surface proof for
#: generator-shaped table functions (its own oracle shows the job is
#: also expressible as posexplode(split(..)) — the demo exists to
#: cover the UDTF escape hatch, not because the plan needs Python).
#: Any OTHER query showing BatchEvalPython/BatchEvalPythonUDTF is a
#: hard gate failure.
PYTHON_ROWWISE_ALLOWED: frozenset[str] = frozenset({"udtf_token_spans"})


#: Partition-less window detector — SINGLE SOURCE OF TRUTH shared by
#: tools/plan_doctor.py and tests/test_plans.py (r11 ADVICE: the two
#: copies could drift, and the old first-argument matcher ``[^,()]*``
#: could not cross parentheses, so a global window whose ORDER BY
#: expression was inlined rather than projected to a ``_w#`` attribute
#: — ``windowspecdefinition(floor(x#1L) ASC ...)`` — escaped both
#: gates). The first argument now tolerates up to two levels of nested
#: parens (covers ``floor(x)``, ``cast(round(x, 0) as int)`` — Spark
#: projects anything deeper to an attribute first); top-level commas
#: still terminate it, so a partitioned window (partition column(s)
#: before the ordered column) never matches.
GLOBAL_WINDOW_PATTERN: str = (
    r"windowspecdefinition\(\s*"
    r"(?:[^,()]|\((?:[^()]|\([^()]*\))*\))*"
    r"\s(?:ASC|DESC)[^)]*"
)


#: Global-window sanction list (VERDICT r10 #2) — queries whose plans
#: legitimately contain a PARTITION-LESS window. The defect class this
#: guards: ``row_number()/sum() OVER (ORDER BY ...)`` with no partition
#: key moves the window's ENTIRE input through one task (WindowExec
#: "Moving all data to a single partition") — fatal when the input is a
#: fact-sized frame (the r10 woe_iv/rfm defect, both since rewritten on
#: range_rank). Every name below runs its global window over a BOUNDED
#: frame instead: sketch centroid/bin/grid tables (t-digest, KLL,
#: count-min, equidepth histograms), calendar series (daily/hourly
#: aggregates, changepoint/survival/seasonality series), score grids and
#: ROC/lift/quantile ladders (distinct predicted-probability values,
#: decile tables), or top-k shortlists — cardinality set by value
#:/time/bin granularity, not by corpus row count. Adding a NEW query
#: with an unpartitioned window fails tools/plan_doctor.py and
#: tests/test_plans.py::test_registry_wide_plan_hygiene unless it is
#: deliberately sanctioned here (reviewed for bounded input).
GLOBAL_WINDOW_ALLOWED: frozenset[str] = frozenset({
    # sketch / quantile-grid family — remaining entries run windows
    # only over post-compaction survivors or <=delta centroid frames
    # (price_histogram_equidepth, tdigest_centroids_orders and
    #  tdigest_merge_shards left in r11: their distinct-value CDFs
    #  track fact cardinality and now accumulate via range_cumsum)
    "count_min_heavy_hitters",
    "decayed_quantile_order_price",
    "incremental_quantile_maintenance",
    # (tdigest_merge_shards: its two shard digests build via
    #  range_cumsum; the one remaining global window is the final
    #  centroid-merge re-digest over exactly 2*delta rows —
    #  assume_bounded fast path, see operators/sketch.py)
    "tdigest_merge_shards",
    "incremental_tdigest_maintenance",
    "kll_quantile_sketch",
    "kll_sketch_merge_shards",
    "kll_weighted_quantile_revenue",
    "quantile_drift_tdigest",
    "tdigest_quantiles_orders",
    # calendar-series / changepoint / survival family (date-grained)
    "acf_daily_revenue",
    "burst_detect_hourly_events",
    "cusum_changepoint_orders",
    "kaplan_meier_retention",
    "nelson_aalen_hazard",
    "pettitt_changepoint",
    "seasonal_decompose_revenue",
    "theil_sen_trend_revenue",
    # score-grid / evaluation-ladder family (distinct-value frames)
    # (spearman / logreg_holdout_auc / logreg_holdout_prauc moved OFF
    #  this list in r11: their value grids grow with the fact table or
    #  sit at 1e6 rows, so they now rank via range_cumsum instead;
    #  ks_test_drift followed in the same round — distinct prices are
    #  order-count-sized)
    "conformal_prediction_interval",
    "decision_stump_returns",
    "decision_tree_depth2_returns",
    "group_sequential_obf",
    "isotonic_calibration_orders",
    "logreg_cv_kfold",
    "logreg_decile_lift",
    "logreg_grid_search",
    "multiple_testing_bh",
    "permutation_importance_logreg",
    "poisson_bootstrap_ci",
    # ranking over top-k shortlists / vocab-bounded frames
    # (r11: weighted_sample / bm25 / rag_chunk / maxsim now take
    #  their top-k via sort+limit (TakeOrderedAndProject), so their
    #  remaining global window ranks only the <=k survivors)
    "bm25_rank_documents",
    "hybrid_search_rrf",
    "late_interaction_maxsim",
    "pmi_collocations_top",
    "rag_chunk_retrieval",
    "top_event_paths",
    "weighted_sample_without_replacement",
    "zipf_rank_fit_tokens",
    # misc bounded frames (frontier / audit / bin-packing state)
    "pareto_frontier_parts",
    "sequence_packing_bins",
    "t_closeness_audit",
    "tpcds_q51_cumulative_crossover",
})
