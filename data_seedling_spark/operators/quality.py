"""Data-quality expectation operators: declarative checks evaluated as
single aggregate scans, plus a quarantine splitter for bad records.

The pipeline-engineering complement to the column-policy model: where
``pseudonymise`` transforms columns, these *validate* them before a
write is allowed to advance a watermark. All checks compile into ONE
aggregate pass over the table (no per-check jobs)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    #: boolean Column: True where the row VIOLATES the expectation
    violation: object


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"range_{col}", ~F.col(col).between(lo, hi) | F.col(col).isNull()
    )


def matches(col: str, pattern: str) -> Expectation:
    return Expectation(
        f"matches_{col}", ~F.col(col).rlike(pattern) | F.col(col).isNull()
    )


def check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One-row DataFrame of violation counts per expectation — a single
    aggregate scan regardless of how many checks are declared."""
    return df.agg(
        *[
            F.sum(e.violation.cast("long")).alias(e.name)
            for e in expectations
        ]
    )


def unique_key_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (PK uniqueness check)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .where(F.col("n_rows") > 1)
    )


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose foreign key has no parent (anti-join)."""
    return child.join(
        parent.select(F.col(pk).alias(fk)).distinct(), on=fk, how="left_anti"
    )


def quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) split on the conjunction of expectations. One
    predicate, evaluated once per branch — at scale write both sides in
    a single pass via partitioned output on the flag."""
    bad = F.lit(False)
    for e in expectations:
        bad = bad | e.violation
    return df.where(~bad), df.where(bad)
