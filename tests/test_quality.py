"""Data-quality operator tests: expectation compilation, quarantine
split, uniqueness and referential checks."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_seedling_spark.operators.quality import (
    check,
    in_range,
    matches,
    not_null,
    quarantine,
    referential_violations,
    unique_key_violations,
)


def bad_df(spark):
    return spark.createDataFrame(
        [
            Row(k=1, price=10.0, code="1-GOOD"),
            Row(k=2, price=None, code="2-GOOD"),
            Row(k=3, price=-5.0, code="bad"),
            Row(k=3, price=20.0, code="3-GOOD"),
        ]
    )


def test_check_counts_violations_single_scan(spark):
    out = check(
        bad_df(spark),
        [not_null("price"), in_range("price", 0, 100), matches("code", r"^[1-5]-")],
    ).first()
    assert out["not_null_price"] == 1
    assert out["range_price"] == 2  # null counts as out-of-range too
    assert out["matches_code"] == 1


def test_quarantine_splits_exactly(spark):
    valid, invalid = quarantine(
        bad_df(spark), [not_null("price"), in_range("price", 0, 100)]
    )
    assert sorted(r["k"] for r in valid.collect()) == [1, 3]
    assert sorted(r["k"] for r in invalid.collect()) == [2, 3]
    assert valid.count() + invalid.count() == 4


def test_unique_key_violations(spark):
    out = unique_key_violations(bad_df(spark), ["k"]).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [(3, 2)]


def test_referential_violations(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=2), Row(fk=9)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    out = referential_violations(child, parent, fk="fk", pk="pk").collect()
    assert [r["fk"] for r in out] == [9]
