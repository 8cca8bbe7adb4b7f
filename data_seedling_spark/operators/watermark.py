"""Watermark state protocol (ST1/ST2; reference ``watermark.py``).

A small versioned state table stores one ``low_watermark`` row per
(activity, table). The incremental contract:

- ``low = get_or_create_low_watermark(...)`` — default 0 on first run
  (reference ``watermark.py:21-84``),
- ``high = source.latest_version()`` — table history max (reference
  ``watermark.py:87-103``),
- process versions ``[low, high]``,
- ``update_watermark(..., high)`` sets ``low = high + 1`` **after** the
  write succeeds (reference ``watermark.py:106-130``, advance-last at
  ``datalake.py:232-239``) — at-least-once on failure, effectively
  exactly-once on keys because the merge is idempotent per PK (ST2).

Scale note: the state table is a handful of rows; every operation on it
is a metadata read plus an O(1) overwrite. The 100 TB data volume never
flows through here.
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ledger import VersionedTable

LOW_WATERMARK = "low_watermark"
ACTIVITY = "activity"
TABLE_NAME = "table_name"

WATERMARK_SCHEMA = T.StructType(
    [
        T.StructField(LOW_WATERMARK, T.LongType(), False),
        T.StructField(ACTIVITY, T.StringType(), False),
        T.StructField(TABLE_NAME, T.StringType(), False),
    ]
)


def _condition(activity: str, table_name: str):
    return (F.col(ACTIVITY) == activity) & (F.col(TABLE_NAME) == table_name)


def get_or_create_low_watermark(
    spark: SparkSession, state: VersionedTable, activity: str, table_name: str
) -> int:
    """Return the stored low watermark, creating the row (and the state
    table itself) at 0 when absent (reference ``watermark.py:21-84``)."""
    if not state.exists():
        state.write(
            spark.createDataFrame(
                [Row(low_watermark=0, activity=activity, table_name=table_name)],
                WATERMARK_SCHEMA,
            ),
            mode="overwrite",
        )
        return 0
    rows = (
        state.read()
        .where(_condition(activity, table_name))
        .orderBy(LOW_WATERMARK)
        .first()
    )
    if rows is None:
        state.write(
            spark.createDataFrame(
                [Row(low_watermark=0, activity=activity, table_name=table_name)],
                WATERMARK_SCHEMA,
            ),
            mode="append",
        )
        return 0
    return rows[LOW_WATERMARK]


def get_high_watermark(source: VersionedTable) -> int:
    """Latest committed source version (reference ``watermark.py:87-103``)."""
    return source.latest_version()


def update_watermark(
    state: VersionedTable, activity: str, table_name: str, high_watermark: int
) -> None:
    """Advance ``low = high + 1`` (the ``+1`` at reference
    ``watermark.py:123``) via a point UPDATE (S10). Creates the state
    row first when absent, so advance works standalone."""
    get_or_create_low_watermark(state.spark, state, activity, table_name)
    state.update(
        _condition(activity, table_name),
        {LOW_WATERMARK: F.lit(high_watermark + 1).cast("long")},
    )
