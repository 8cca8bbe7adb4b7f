"""Storage-backend seam: the protocol every pipeline writes against.

The engine's local substrate is :class:`~data_seedling_spark.operators.
ledger.VersionedTable` — a parquet + JSON-commit-ledger table that
reproduces the observable Delta Lake semantics the reference relies on
(change data feed with ``_change_type`` insert/delete rows, time
travel, vacuum, CHECK constraints, mergeSchema evolution; reference
``patient_notes/src/patient_notes/datalake.py:88-94`` reads Delta CDF
with exactly these options). ``TableBackend`` names that contract so a
real delta-spark table can drop in where the jars exist (Databricks /
OSS Delta): :class:`DeltaBackend` is that adapter, import-gated
because this environment ships no Delta jars.

Activation: ``backend_for(spark, path, fmt="delta")`` on a cluster
with ``delta-spark`` installed; everything downstream
(``streaming.incremental``'s read_increment/merge_increment protocol,
the foreachBatch CDC apply, the watermark table) only touches the
protocol surface. ``tests/test_backends.py`` is the conformance suite:
it runs against every *available* backend, so the same assertions that
gate the ledger locally gate Delta wherever it can import.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession

from .operators.ledger import VersionedTable


@runtime_checkable
class TableBackend(Protocol):
    """The storage contract the engine's pipelines depend on.

    Semantics (the conformance suite asserts each):

    - ``write(df, mode)``: append | overwrite; returns the new version
      (0-based, monotone).
    - ``merge(changes, primary_keys)``: apply an insert/delete change
      feed keyed on ``primary_keys``; update rows are rejected
      upstream (reference merge semantics — S7/S8/S9).
    - ``read(version=None)``: latest or time-travel snapshot.
    - ``read_changes(lo, hi)``: row-level CDF for versions [lo, hi],
      Delta column names (``_change_type``/``_commit_version``/
      ``_commit_timestamp``), overwrite = delete-all + insert-all.
    - ``history()``: commit metadata, newest first.
    - ``update(condition, assignments)``: point UPDATE as a new
      version.
    - ``vacuum(...)``: drop unreferenced data beyond the retention
      policy without breaking the latest snapshot.
    """

    def exists(self) -> bool: ...

    def latest_version(self) -> int: ...

    def write(self, df: DataFrame, mode: str = "append", **kwargs) -> int: ...

    def merge(self, changes: DataFrame, primary_keys: list[str]) -> int: ...

    def read(self, version: int | None = None) -> DataFrame: ...

    def read_changes(self, starting_version: int, ending_version: int) -> DataFrame: ...

    def history(self) -> list[dict]: ...

    def update(self, condition, assignments: dict) -> int: ...

    def empty_like(self) -> DataFrame: ...

    def vacuum(self, retain_last_versions: int | None = None) -> list: ...


class DeltaBackend:
    """delta-spark adapter for :class:`TableBackend`.

    Maps the protocol onto a real Delta table 1:1 — written for the
    delta-spark ≥2.4 API the reference pins
    (``patient_notes/pyproject.toml:14``):

    - ``write`` → ``df.write.format("delta")`` with
      ``delta.enableChangeDataFeed=true`` set at creation,
    - ``merge`` → ``DeltaTable.merge`` with ``whenMatchedDelete`` on
      ``_change_type = 'delete'`` + ``whenNotMatchedInsert`` for
      inserts (update feeds are rejected before the sink, matching the
      ledger's guard),
    - ``read_changes`` → ``spark.read.format("delta")
      .option("readChangeFeed", "true")`` with starting/endingVersion —
      the exact option surface the reference consumes,
    - ``update``/``vacuum``/``history`` → their DeltaTable twins.

    Change data feed is enabled the way the reference does it
    (``patient_notes/conftest.py:58``): the session default
    ``spark.databricks.delta.properties.defaults.enableChangeDataFeed``
    is set at adapter construction, so every table this backend
    creates gets the ``delta.enableChangeDataFeed`` TABLE property in
    its creation commit itself — CDF covers version 0 onward, and no
    reliance on writer-level ``delta.*`` options (which are not
    reliably persisted as table properties across delta-spark
    versions).

    Import-gated: constructing it without delta-spark on the classpath
    raises ImportError with the activation hint; no other module
    imports delta at module scope, so the engine stays runnable
    without the jars.
    """

    def __init__(self, spark: SparkSession, path: str):
        try:
            from delta.tables import DeltaTable  # noqa: F401
        except ImportError as e:  # pragma: no cover - no jars here
            raise ImportError(
                "DeltaBackend needs delta-spark (pip install delta-spark and "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension); "
                "use VersionedTable for the jar-free local substrate"
            ) from e
        self.spark = spark
        self.path = path
        # Reference mechanism for CDF-on-create; a per-table property
        # set post-hoc would miss the creation commit's changes.
        spark.conf.set(
            "spark.databricks.delta.properties.defaults.enableChangeDataFeed",
            "true",
        )

    def _table(self):  # pragma: no cover - exercised only with jars
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def exists(self) -> bool:  # pragma: no cover
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path)

    def latest_version(self) -> int:  # pragma: no cover
        return int(self._table().history(1).collect()[0]["version"])

    def write(self, df: DataFrame, mode: str = "append", **kwargs) -> int:  # pragma: no cover
        (
            df.write.format("delta")
            .mode(mode)
            .option("mergeSchema", str(kwargs.get("merge_schema", False)).lower())
            .save(self.path)
        )
        return self.latest_version()

    def merge(self, changes: DataFrame, primary_keys: list[str]) -> int:  # pragma: no cover
        from .operators.merge import CHANGE_TYPE, CT_DELETE, CT_INSERT

        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in primary_keys)
        data_cols = [c for c in changes.columns if c != CHANGE_TYPE]
        (
            self._table()
            .alias("t")
            .merge(changes.alias("s"), cond)
            .whenMatchedDelete(condition=f"s.`{CHANGE_TYPE}` = '{CT_DELETE}'")
            .whenNotMatchedInsert(
                condition=f"s.`{CHANGE_TYPE}` = '{CT_INSERT}'",
                values={f"t.`{c}`": f"s.`{c}`" for c in data_cols},
            )
            .execute()
        )
        return self.latest_version()

    def read(self, version: int | None = None) -> DataFrame:  # pragma: no cover
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.path)

    def read_changes(self, starting_version: int, ending_version: int) -> DataFrame:  # pragma: no cover
        return (
            self.spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", starting_version)
            .option("endingVersion", ending_version)
            .load(self.path)
            # Delta splits overwrites into update_preimage/postimage
            # when rows match; normalise to the insert/delete vocabulary
            # the engine's apply_change_feed consumes.
            .replace(
                {"update_preimage": "delete", "update_postimage": "insert"},
                subset=["_change_type"],
            )
        )

    def history(self) -> list[dict]:  # pragma: no cover
        return [r.asDict() for r in self._table().history().collect()]

    def update(self, condition, assignments: dict) -> int:  # pragma: no cover
        self._table().update(condition=condition, set=assignments)
        return self.latest_version()

    def empty_like(self) -> DataFrame:  # pragma: no cover
        return self.spark.createDataFrame([], self.read().schema)

    def vacuum(self, retain_last_versions: int | None = None) -> list:  # pragma: no cover
        """Protocol-shaped vacuum. ``None`` → Delta's default-retention
        vacuum (the reference's no-op call shape, S14). An int is
        translated to Delta's hour-based retention via the commit
        timestamp of the Nth-newest version in ``history()`` — files
        referenced by a retained snapshot survive either way. Delta
        guards sub-default retention behind
        ``spark.databricks.delta.retentionDurationCheck.enabled``;
        callers opting into aggressive version-based cleanup must
        disable that check, exactly as on any Delta deployment.
        Returns [] — Delta does not report vacuumed versions, and
        vacuumed history stays queryable, matching the ledger.
        """
        if retain_last_versions is None:
            self._table().vacuum()
            return []
        import datetime

        hist = sorted(self.history(), key=lambda h: h["version"], reverse=True)
        keep = hist[: max(retain_last_versions, 1)]
        cutoff = min(h["timestamp"] for h in keep)
        now = datetime.datetime.now(tz=cutoff.tzinfo)
        hours = max((now - cutoff).total_seconds() / 3600.0, 0.0)
        self._table().vacuum(hours)
        return []


def backend_for(
    spark: SparkSession, path: str, fmt: str = "ledger", **kwargs
) -> TableBackend:
    """Factory: ``fmt="ledger"`` (always available) or ``fmt="delta"``
    (requires delta-spark on the classpath)."""
    if fmt == "delta":
        return DeltaBackend(spark, path)
    if fmt == "ledger":
        return VersionedTable(spark, path, **kwargs)
    raise ValueError(f"unknown table backend {fmt!r} (ledger | delta)")
