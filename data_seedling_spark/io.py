"""Source/sink surface beyond parquet (SURVEY §2.1 S12/S13/S15).

- ``jdbc_*``: the reference's feature-store sink (S12; reference
  ``db.py:59-136``) — connection options assembled the same way. The
  path is exercised end-to-end against embedded Derby (the jars ship
  inside the Spark distribution; ``JdbcConfig.derby_memory``); for
  servers whose driver jar isn't on the classpath (e.g. the
  reference's SQL Server target) callers get a clear error instead of
  a Py4J stack.
- ``register_parquet_table``: catalog DDL (S13; reference
  ``datalake.py:102-120``) via ``CREATE TABLE ... USING parquet
  LOCATION`` — the external-location registration pattern, minus Unity
  Catalog.
- ``sql``: ad-hoc SQL entry point (S15).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcConfig:
    """Connection shape mirroring the reference's ``DatabaseConfig``
    (``db.py:59-108``): host/db/credentials → url + properties.

    ``url_override`` swaps the server-form URL for an embedded target
    (``derby_memory`` builds one) without changing the option plumbing
    the sink/source use — the same seam the reference's config object
    gives its tests.
    """

    host: str
    database: str
    username: str
    password: str
    port: int = 1433
    driver: str = "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    url_override: str | None = None

    @classmethod
    def derby_memory(cls, database: str) -> "JdbcConfig":
        """Embedded in-memory Derby target (jars ship with Spark) —
        the offline stand-in for the reference's SQL Server feature
        store; exercises the exact same reader/writer code path."""
        return cls(
            host="embedded",
            database=database,
            username="",
            password="",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
            url_override=f"jdbc:derby:memory:{database};create=true",
        )

    @property
    def url(self) -> str:
        if self.url_override:
            return self.url_override
        return f"jdbc:sqlserver://{self.host}:{self.port};databaseName={self.database}"

    def options(self, table: str) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": table,
            "user": self.username,
            "password": self.password,
            "driver": self.driver,
        }


def _driver_available(spark: SparkSession, driver: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
        return True
    except Exception:  # noqa: BLE001
        return False


def jdbc_append(
    df: DataFrame, config: JdbcConfig, table: str, batchsize: int = 10_000
) -> None:
    """S12 feature-store append (reference ``db.py:111-136``).

    ``batchsize`` bounds rows per INSERT round-trip; partition count =
    concurrent connections, so repartition small before calling if the
    target DB can't take the writer fan-in.
    """
    spark = df.sparkSession
    if not _driver_available(spark, config.driver):
        raise RuntimeError(
            f"JDBC driver {config.driver} is not on the classpath; add the "
            "driver jar via spark.jars to enable the feature-store sink"
        )
    (
        df.write.format("jdbc")
        .mode("append")
        .options(batchsize=str(batchsize), **config.options(table))
        .save()
    )


def jdbc_read(spark: SparkSession, config: JdbcConfig, query: str) -> DataFrame:
    """JDBC source with predicate pushdown via a pushdown query."""
    if not _driver_available(spark, config.driver):
        raise RuntimeError(
            f"JDBC driver {config.driver} is not on the classpath; add the "
            "driver jar via spark.jars to enable the JDBC source"
        )
    # ``AS`` is required by Derby for a derived-table alias and accepted
    # by every other dialect.
    return spark.read.format("jdbc").options(**config.options(f"({query}) AS q")).load()


def register_parquet_table(
    spark: SparkSession, name: str, location: str, catalog_schema: str = "default"
) -> None:
    """S13 catalog DDL (reference ``datalake.py:102-120``): register an
    external parquet location as a queryable table, idempotently."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {catalog_schema}.`{name}` "
        f"USING parquet LOCATION '{location}'"
    )


def sql(spark: SparkSession, statement: str) -> DataFrame:
    """S15 ad-hoc SQL entry point."""
    return spark.sql(statement)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout: one directory per
    partition value. Reads filtered on the partition columns prune
    whole directories before any I/O (PartitionFilters in the scan
    node) — the physical-layout lever for time/tenant-partitioned
    100 TB tables."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink with header (interchange format; schema degrades to
    strings on read without an explicit schema)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV source. Always pass ``schema`` in production — inference
    costs an extra full scan and guesses types."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_json_lines(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per row)."""
    df.write.mode(mode).json(path)


def read_json_lines(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format (Hive
    ecosystems). Types, nested structs, and predicate-pushdown stats
    survive the round-trip like parquet's."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source; schema comes from file metadata (self-describing),
    and filters push down to stripe/row-group level like parquet."""
    return spark.read.orc(path)


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], partitions: int | None = None
) -> None:
    """Range-partition + sort-within-partitions before writing: parquet
    row-group min/max stats become narrow and disjoint on the sort key,
    so selective scans skip whole row groups (data skipping without an
    index). The single-column analogue of Z-ordering."""
    if partitions:
        df = df.repartitionByRange(partitions, *sort_cols)
    else:
        df = df.repartitionByRange(*sort_cols)
    df.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw-asset ingestion for the multimodal pipeline: Spark's
    ``binaryFile`` source yields one row per file — ``(path,
    modificationTime, length, content: binary)`` — which is exactly the
    opaque-payload + typed-metadata contract
    ``operators.multimodal`` builds on. ``glob`` filters by filename
    pattern (pushed to the file index, so non-matching files are never
    opened).

    Scale note: each file must fit in one row (driver maxes at
    ``spark.sql.files.maxPartitionBytes`` per task either way) — the
    right granularity for images/audio clips; chunk video into segment
    files upstream. Listing parallelises across executors for large
    directories.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
