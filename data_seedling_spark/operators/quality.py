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


def in_set(col: str, allowed) -> Expectation:
    return Expectation(
        f"in_set_{col}",
        ~F.col(col).isin(list(allowed)) | F.col(col).isNull(),
    )


def expectations_report(
    df: DataFrame,
    expectations: list[Expectation],
    unique_keys: list[str] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """The audit-report composition over the same Expectation currency
    :func:`check` uses, but LONG form — one row per check,
    ``(check, n_violations, n_rows, passed)`` — plus the two
    non-row-local check classes: primary-key uniqueness (one hash
    aggregate; rows beyond the first per key count as violations) and
    referential integrity ``(fk_col, dim_df, pk_col)`` (left-anti
    orphan counts; broadcast when the dim is small — Catalyst
    decides). All row-level expectations still fold into ONE
    conditional-aggregation scan regardless of count — the report
    shape a pipeline gate consumes (DLT expectations / dbt test
    results)."""
    n_rows = F.count(F.lit(1))
    aggs = [n_rows.alias("_n")] + [
        F.sum(e.violation.cast("long")).alias(f"_c{i}")
        for i, e in enumerate(expectations)
    ]
    agg_row = df.agg(*aggs)
    reports = []
    for i, e in enumerate(expectations):
        reports.append(
            agg_row.select(
                F.lit(e.name).alias("check"),
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
                F.lit("unique_" + "_".join(unique_keys)).alias("check"),
                "n_violations",
                "n_rows",
            )
        )
        reports.append(dup)
    for fk_col, dim, pk_col in references or ():
        orphans = (
            referential_violations(
                df.select(F.col(fk_col)).where(F.col(fk_col).isNotNull()),
                dim,
                fk=fk_col,
                pk=pk_col,
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .crossJoin(df.agg(F.count(F.lit(1)).alias("n_rows")))
            .select(
                F.lit(f"references_{fk_col}").alias("check"),
                "n_violations",
                "n_rows",
            )
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("n_violations") == 0)
