"""Source/sink tests: catalog DDL registration, gated JDBC errors."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_seedling_spark.io import (
    JdbcConfig,
    jdbc_append,
    register_parquet_table,
    sql,
)
from tests.conftest import SF_SMOKE


def test_register_parquet_table_and_query(spark):
    register_parquet_table(spark, "nation_ext", f"{SF_SMOKE}/nation.parquet")
    out = sql(spark, "SELECT COUNT(*) AS n FROM default.`nation_ext`").first()
    assert out["n"] == 25
    # idempotent re-register
    register_parquet_table(spark, "nation_ext", f"{SF_SMOKE}/nation.parquet")


def test_jdbc_config_url_shape():
    cfg = JdbcConfig(host="h", database="db", username="u", password="p")
    assert cfg.url == "jdbc:sqlserver://h:1433;databaseName=db"
    opts = cfg.options("features")
    assert opts["dbtable"] == "features"
    assert opts["driver"].endswith("SQLServerDriver")


def test_jdbc_append_without_driver_raises_clearly(spark):
    cfg = JdbcConfig(host="h", database="db", username="u", password="p")
    df = spark.createDataFrame([Row(value=1)])
    with pytest.raises(RuntimeError, match="driver .* not on the classpath"):
        jdbc_append(df, cfg, "features")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from data_seedling_spark.io import read_partitioned, write_partitioned

    events = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    out = str(tmp_path / "parted")
    write_partitioned(events, out, ["o_orderstatus"])
    df = read_partitioned(spark, out).where("o_orderstatus = 'F'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # only the F partition contributes rows
    assert df.count() == events.where("o_orderstatus = 'F'").count()
    got_statuses = {r["o_orderstatus"] for r in df.select("o_orderstatus").distinct().collect()}
    assert got_statuses == {"F"}
