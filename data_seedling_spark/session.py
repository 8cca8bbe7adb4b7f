"""SparkSession construction tuned for both local testing and scale.

The reference creates bare sessions (``SparkSession.builder.getOrCreate()``,
reference ``entrypoints/pseudonymisation.py:33``) and relies on cluster
config. We centralise the conf so every entry point (tests, bench,
driver contract) gets the same Catalyst posture:

- AQE on (runtime coalesce / skew-join handling — the 100 TB lever),
- Arrow on (Pandas-UDF fast path),
- UTC session timezone (oracle comparability; parquet NTZ timestamps),
- shuffle partitions sized to the local core count rather than the
  200 default (on a real cluster this is overridden per-job).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "data_seedling_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's standard conf."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    # SPARK_GRAFT_SHUFFLE: per-run override for scale probes — at sf10
    # in one JVM the 32-partition default makes per-task hash maps the
    # memory ceiling; more, smaller tasks is the per-executor sizing a
    # real cluster applies (SCALE.md "heap" notes).
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", max(cpus, 8))
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The synthetic events table stores TIMESTAMP(NANOS) which the
        # vectorized parquet reader rejects; read as long and convert in
        # tables.load_table (lossless: values are µs-aligned).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
