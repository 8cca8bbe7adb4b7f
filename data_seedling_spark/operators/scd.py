"""Slowly-changing-dimension (type 2) history from a change feed.

The classic warehouse pattern on top of the CDC scan (S2): every
``insert`` opens a validity segment at its commit version; the next
change to that key — a ``delete`` or a superseding ``insert`` — closes
it. The result is the full history table (one row per key-lifetime
segment) that point-in-time joins and auditing consume.

Spark-first shape: ONE lead() window per primary key over the feed —
no self-join, no iteration. The window partitions by key, so history
construction parallelises across the key space; per-key state is one
row. Ties inside a commit order deletes before inserts
(``delete`` < ``insert`` lexically), which is exactly Delta CDF's
overwrite semantics (old row deleted and new row inserted at the same
version ⇒ old segment closes at v, new segment opens at v).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .merge import CHANGE_TYPE, COMMIT_VERSION, CT_INSERT


def scd2_from_changes(
    changes: DataFrame,
    primary_keys: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Build the type-2 history: ``value_cols`` per segment with
    ``valid_from_version`` / ``valid_to_version`` (NULL = still
    current) and an ``is_current`` flag."""
    w = W.partitionBy(*primary_keys).orderBy(COMMIT_VERSION, CHANGE_TYPE)
    led = changes.withColumn(
        "valid_to_version", F.lead(COMMIT_VERSION).over(w).cast("long")
    )
    return led.where(F.col(CHANGE_TYPE) == CT_INSERT).select(
        *primary_keys,
        *value_cols,
        F.col(COMMIT_VERSION).cast("long").alias("valid_from_version"),
        "valid_to_version",
        F.col("valid_to_version").isNull().cast("int").alias("is_current"),
    )
