"""Batch-incremental CDC pipeline (reference ``datalake.py:52-239``).

``read_increment`` / ``write_increment`` are the engine's equivalents of
the reference's ``read_delta_table_update`` / ``write_delta_table_update``:
consume only the source versions committed since the last successful
run, apply them idempotently to the target by primary key, then advance
the watermark. A failed run re-reads the same version range on retry
(at-least-once; exactly-once per key thanks to the PK merge — ST2).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.ledger import VersionedTable
from ..operators.merge import (
    CT_DELETE,
    CT_INSERT,
    CHANGE_TYPE,
    strip_reserved_columns,
)
from ..operators.watermark import (
    get_high_watermark,
    get_or_create_low_watermark,
    update_watermark,
)

from pyspark.sql import functions as F


@dataclass
class Increment:
    """One incremental read: the change feed plus its version range."""

    changes: DataFrame
    low_watermark: int
    high_watermark: int

    @property
    def is_empty_range(self) -> bool:
        return self.low_watermark > self.high_watermark


def read_increment(
    spark: SparkSession,
    source: VersionedTable,
    state: VersionedTable,
    activity: str,
    table_name: str,
) -> Increment:
    """S2+ST1: read the unprocessed change feed ``[low, high]``.

    When no new versions exist, returns a schema-preserving empty feed
    (reference ``datalake.py:77-86``) so downstream transforms run
    unchanged.
    """
    low = get_or_create_low_watermark(spark, state, activity, table_name)
    high = get_high_watermark(source)
    if low > high:
        empty = source.empty_like()
        empty = (
            empty.withColumn(CHANGE_TYPE, F.lit(None).cast("string"))
            .withColumn("_commit_version", F.lit(None).cast("long"))
            .withColumn("_commit_timestamp", F.lit(None).cast("long"))
        ).where(F.lit(False))
        return Increment(empty, low, high)
    return Increment(source.read_changes(low, high), low, high)


def write_increment(
    target: VersionedTable,
    increment: Increment,
    primary_keys: list[str],
    state: VersionedTable,
    activity: str,
    table_name: str,
) -> None:
    """ST2/ST3: route the feed into the target, then advance the
    watermark — *advance last* so a failure before commit replays the
    same range (reference ``datalake.py:232-239``).

    - empty feed → no write, no advance (reference ``datalake.py:171-173``)
    - first write → plain save of the insert rows
    - otherwise → MERGE (delete branch, then insert branch; updates
      rejected inside ``VersionedTable.merge``)
    """
    if increment.is_empty_range or increment.changes.isEmpty():
        return
    if not target.exists():
        # Create empty, then merge: the first feed may already span
        # several source versions (insert+delete on one key), and the
        # update-rejection guard must hold on run 1 exactly as on run N.
        schema = strip_reserved_columns(increment.changes).schema
        target.write(
            increment.changes.sparkSession.createDataFrame([], schema),
            mode="overwrite",
        )
    target.merge(increment.changes, primary_keys)
    update_watermark(state, activity, table_name, increment.high_watermark)


def run_incremental_activity(
    spark: SparkSession,
    source: VersionedTable,
    target: VersionedTable,
    state: VersionedTable,
    activity: str,
    table_name: str,
    primary_keys: list[str],
    transform=None,
) -> Increment:
    """One full activity run: read → (optional transform) → merge →
    advance. The frame of the reference's entry points (SURVEY §3.1/§3.2)."""
    inc = read_increment(spark, source, state, activity, table_name)
    if transform is not None and not inc.is_empty_range:
        inc = Increment(transform(inc.changes), inc.low_watermark, inc.high_watermark)
    write_increment(target, inc, primary_keys, state, activity, table_name)
    return inc
