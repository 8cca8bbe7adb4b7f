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
