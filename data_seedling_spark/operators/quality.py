"""Declarative data-quality expectations over DataFrames — the
lakehouse constraint-audit operator class (Delta CHECK constraints /
DLT expectations / dbt tests): each expectation compiles to ONE
aggregate expression, the whole battery runs as a single scan with
conditional aggregation, and the report is one row per check.

Reference scope: the reference pipeline validates schemas implicitly
(column-existence checks in pseudonymisation config dispatch,
`pseudonymisation/common.py`); a standalone engine needs the audit as
a first-class, composable operator. Scale: every check is a
map-side-combinable SUM/COUNT over the same scan — one pass over
100 TB regardless of how many checks ride along; the uniqueness and
referential checks add one hash aggregate / one broadcast-or-shuffle
anti-join each, still one job total."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null:{col}", F.col(col).isNull())


def in_set(col: str, allowed) -> tuple[str, Column]:
    return (
        f"in_set:{col}",
        ~F.col(col).isin(list(allowed)) | F.col(col).isNull(),
    )


def in_range(col: str, lo=None, hi=None) -> tuple[str, Column]:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return (f"in_range:{col}", cond | F.col(col).isNull())


def matches(col: str, pattern: str) -> tuple[str, Column]:
    return (
        f"matches:{col}",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def expectations_report(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique_keys: list[str] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run an expectation battery and return one row per check:
    ``(check, n_violations, n_rows, passed)``.

    ``row_checks`` are (name, violation-predicate) pairs — all of them
    fold into ONE conditional aggregation over a single scan.
    ``unique_keys`` adds a primary-key uniqueness check (rows beyond
    the first per key count as violations — one hash aggregate).
    ``references`` adds FK checks ``(fk_col, dim_df, pk_col)`` — each
    a left-anti join counting orphans (broadcast when the dim is
    small; Catalyst decides)."""
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("_n")] + [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"_c{i}")
        for i, (_, pred) in enumerate(row_checks)
    ]
    agg_row = df.agg(*aggs)
    reports = []
    for i, (name, _) in enumerate(row_checks):
        reports.append(
            agg_row.select(
                F.lit(name).alias("check"),
                F.col(f"_c{i}").alias("n_violations"),
                F.col("_n").alias("n_rows"),
            )
        )
    if unique_keys:
        dup = (
            df.groupBy(*unique_keys)
            .agg(F.count(F.lit(1)).alias("_k"))
            .agg(
                F.coalesce(
                    F.sum(F.col("_k") - 1), F.lit(0)
                ).cast("long").alias("n_violations"),
                F.coalesce(F.sum("_k"), F.lit(0)).cast("long").alias("n_rows"),
            )
            .select(
                F.lit("unique:" + ",".join(unique_keys)).alias("check"),
                "n_violations",
                "n_rows",
            )
        )
        reports.append(dup)
    for fk_col, dim, pk_col in references or ():
        orphans = (
            df.select(F.col(fk_col))
            .where(F.col(fk_col).isNotNull())
            .join(
                dim.select(F.col(pk_col).alias(fk_col)).distinct(),
                fk_col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(
                F.lit(f"references:{fk_col}").alias("check"),
                "n_violations",
                "n_rows",
            )
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)
