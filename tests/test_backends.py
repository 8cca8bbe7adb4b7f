"""TableBackend conformance suite.

One set of assertions over the protocol's *observable semantics*,
parameterized over every backend constructible in this environment —
the ledger always; DeltaBackend joins the matrix automatically
wherever delta-spark imports (Databricks / OSS Delta clusters), so the
exact tests that gate the local substrate gate the production one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_seedling_spark.backends import (
    DeltaBackend,
    IcebergBackend,
    TableBackend,
    backend_for,
)
from data_seedling_spark.operators.ledger import VersionedTable
from data_seedling_spark.operators.merge import CHANGE_TYPE


def _delta_available() -> bool:
    try:
        import delta.tables  # noqa: F401

        return True
    except ImportError:
        return False


def _iceberg_catalog(spark) -> str | None:
    import os as _os

    cat = _os.environ.get("ICEBERG_TEST_CATALOG", "iceberg")
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{cat}")
    except Exception:
        return None
    return cat if impl and "iceberg" in impl.lower() else None


BACKENDS = ["ledger"] + (["delta"] if _delta_available() else [])


@pytest.fixture(params=BACKENDS)
def backend(request, spark, tmp_path) -> TableBackend:
    return backend_for(spark, str(tmp_path / "tbl"), fmt=request.param)


@pytest.fixture(autouse=False)
def _maybe_add_iceberg(spark):
    """Iceberg joins the matrix via BACKENDS when a catalog resolves;
    kept out of the param list in this jar-free sandbox."""


def _rows(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def test_protocol_is_structural(spark, tmp_path):
    """VersionedTable satisfies TableBackend without inheriting it —
    the seam is structural, so delta-spark (or any future backend)
    plugs in by shape alone."""
    vt = VersionedTable(spark, str(tmp_path / "t"))
    assert isinstance(vt, TableBackend)
    assert issubclass(DeltaBackend, object) and not issubclass(
        DeltaBackend, VersionedTable
    )


def test_unknown_backend_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown table backend"):
        backend_for(spark, str(tmp_path / "t"), fmt="hudi")


def test_delta_backend_import_gate_names_activation(spark, tmp_path):
    if _delta_available():
        pytest.skip("delta importable here; gate not reachable")
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaBackend(spark, str(tmp_path / "t"))


def test_write_versions_are_monotone(backend, spark):
    v0 = backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    v1 = backend.write(_rows(spark, [(2, "b")]))
    assert backend.exists()
    assert (v0, v1) == (0, 1)
    assert backend.latest_version() == 1
    assert sorted(r["k"] for r in backend.read().collect()) == [1, 2]


def test_time_travel_reads_old_snapshot(backend, spark):
    backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    backend.write(_rows(spark, [(1, "z")]), mode="overwrite")
    assert [r["v"] for r in backend.read(version=0).collect()] == ["a"]
    assert [r["v"] for r in backend.read().collect()] == ["z"]


def test_merge_applies_inserts_and_deletes(backend, spark):
    backend.write(_rows(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    feed = _rows(spark, [(2, "b"), (3, "c")]).withColumn(
        CHANGE_TYPE,
        F.when(F.col("k") == 2, F.lit("delete")).otherwise(F.lit("insert")),
    )
    backend.merge(feed, ["k"])
    assert sorted(r["k"] for r in backend.read().collect()) == [1, 3]


def test_change_feed_roundtrips_the_merge(backend, spark):
    backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    feed = _rows(spark, [(2, "b")]).withColumn(CHANGE_TYPE, F.lit("insert"))
    v = backend.merge(feed, ["k"])
    changes = backend.read_changes(v, v).collect()
    assert [(r["k"], r[CHANGE_TYPE]) for r in changes] == [(2, "insert")]


def test_change_feed_overwrite_is_delete_plus_insert(backend, spark):
    backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    v = backend.write(_rows(spark, [(2, "b")]), mode="overwrite")
    got = sorted(
        (r["k"], r[CHANGE_TYPE]) for r in backend.read_changes(v, v).collect()
    )
    assert got == [(1, "delete"), (2, "insert")]


def test_point_update_creates_new_version(backend, spark):
    backend.write(_rows(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    v = backend.update(F.col("k") == 1, {"v": F.lit("patched")})
    assert v == backend.latest_version() > 0
    assert dict((r["k"], r["v"]) for r in backend.read().collect()) == {
        1: "patched",
        2: "b",
    }


def test_history_is_append_only_metadata(backend, spark):
    backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    backend.write(_rows(spark, [(2, "b")]))
    hist = backend.history()
    assert len(hist) == 2
    versions = sorted(h["version"] for h in hist)
    assert versions == [0, 1]


def test_empty_like_preserves_schema(backend, spark):
    backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    empty = backend.empty_like()
    assert empty.count() == 0
    assert empty.schema == backend.read().schema


def test_vacuum_default_is_noop_change(backend, spark):
    """Protocol vacuum with no argument is the reference's no-op call
    shape (S14): latest snapshot unchanged, a list comes back, and the
    call is polymorphic across backends (one agreed signature)."""
    backend.write(_rows(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    removed = backend.vacuum()
    assert isinstance(removed, list)
    assert sorted(r["k"] for r in backend.read().collect()) == [1, 2]


def test_vacuum_retention_keeps_recent_snapshots(backend, spark):
    """Version-based retention through the protocol signature: after
    vacuum(retain_last_versions=1) the latest snapshot must read
    intact. (The ledger also deletes superseded version dirs —
    asserted in test_ledger.py; Delta's physical deletion depends on
    its retention-check conf, so the portable contract is
    latest-snapshot integrity.)"""
    backend.write(_rows(spark, [(1, "a")]), mode="overwrite")
    backend.write(_rows(spark, [(9, "z")]), mode="overwrite")
    if isinstance(backend, DeltaBackend):
        # Delta guards sub-default (168 h) retention; aggressive
        # version-based cleanup opts in, exactly as on any deployment.
        spark.conf.set(
            "spark.databricks.delta.retentionDurationCheck.enabled", "false"
        )
        try:
            backend.vacuum(retain_last_versions=1)
        finally:
            spark.conf.set(
                "spark.databricks.delta.retentionDurationCheck.enabled", "true"
            )
    else:
        backend.vacuum(retain_last_versions=1)
    assert [r["k"] for r in backend.read().collect()] == [9]


def test_iceberg_backend_gate_names_activation(spark, tmp_path):
    """Without a configured Iceberg catalog the adapter refuses with
    the activation recipe (config-gated, not import-gated — Iceberg
    has no Python package to probe)."""
    from tests.test_backends import _iceberg_catalog

    if _iceberg_catalog(spark):
        pytest.skip("iceberg catalog configured here; gate not reachable")
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        IcebergBackend(spark, "iceberg.db.tbl")


def test_iceberg_backend_is_protocol_shaped():
    """Structural conformance: the adapter exposes every TableBackend
    method with protocol-compatible signatures (so the conformance
    matrix can include it unchanged the moment a catalog exists)."""
    import inspect

    for name in (
        "exists", "latest_version", "write", "merge", "read",
        "read_changes", "history", "update", "empty_like", "vacuum",
    ):
        assert hasattr(IcebergBackend, name), name
    sig = inspect.signature(IcebergBackend.vacuum)
    assert "retain_last_versions" in sig.parameters


def test_iceberg_snapshot_ordering_tiebreaks_on_snapshot_id():
    """Same-millisecond commits must map to versions deterministically
    (ADVICE r6): order by (committed_at, snapshot_id), so the listing
    is a total order regardless of metadata-table row order."""
    rows = [
        {"snapshot_id": 902, "committed_at": 1000},
        {"snapshot_id": 17, "committed_at": 1000},   # tied millisecond
        {"snapshot_id": 445, "committed_at": 999},
        {"snapshot_id": 1, "committed_at": 1001},
    ]
    got = IcebergBackend.order_snapshots(rows)
    assert [r["snapshot_id"] for r in got] == [445, 17, 902, 1]
    # Permutation-invariant: any input order yields the same mapping.
    got2 = IcebergBackend.order_snapshots(list(reversed(rows)))
    assert got2 == got
