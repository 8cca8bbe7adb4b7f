"""Scale-join strategy tests: bucketed joins must be exchange-free,
salted joins must preserve exact join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_seedling_spark.operators.relational import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=4)
    # force a sort-merge join so the test checks bucket co-location
    # (a broadcast join would hide the shuffle anyway)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # result parity with the plain join
    plain = orders.join(lineitem, "o_orderkey")
    assert joined.count() == plain.count()


def test_salted_join_matches_plain_join(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = salted_join(orders, customer, "o_custkey", salt_factor=4)
    plain = orders.join(customer, "o_custkey")
    assert salted.count() == plain.count()
    a = salted.groupBy("o_custkey").count().orderBy("o_custkey").collect()
    b = plain.groupBy("o_custkey").count().orderBy("o_custkey").collect()
    assert a == b


def test_salted_left_join_keeps_unmatched_rows(spark):
    from pyspark.sql import Row

    big = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b"), Row(k=9, v="z")])
    small = spark.createDataFrame([Row(k=1, w="X"), Row(k=2, w="Y")])
    out = salted_join(big, small, "k", salt_factor=3, how="left")
    got = {(r["k"], r["w"]) for r in out.collect()}
    assert got == {(1, "X"), (2, "Y"), (9, None)}


def test_salted_join_rejects_unsupported_how(spark):
    from pyspark.sql import Row

    import pytest as _pytest

    big = spark.createDataFrame([Row(k=1)])
    small = spark.createDataFrame([Row(k=1)])
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="right")
