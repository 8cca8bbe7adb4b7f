"""Observation-based metrics tests (A5 without the eager-count
anti-pattern)."""

from __future__ import annotations

from pyspark.sql import Row

from data_seedling_spark.operators.observe import (
    MetricsLog,
    observed_rows,
    write_with_metrics,
)


def test_observed_rows_piggybacks_on_action(spark):
    df = spark.createDataFrame([Row(v=i) for i in range(7)])
    observed, obs = observed_rows(df)
    observed.write.format("noop").mode("overwrite").save()  # the ONE action
    assert obs.get["n_rows"] == 7


def test_write_with_metrics_accumulates_tagged_sums(spark, tmp_path):
    metrics = MetricsLog()
    df = spark.createDataFrame([Row(v=i) for i in range(5)])

    def writer(d):
        d.write.mode("overwrite").parquet(str(tmp_path / "out"))

    n = write_with_metrics(df, writer, metrics, activity="pseudo", table="Notes")
    assert n == 5
    write_with_metrics(df, writer, metrics, activity="pseudo", table="Notes")
    assert metrics.get("rows_updated", activity="pseudo", table="Notes") == 10
    assert metrics.get("rows_updated", activity="other", table="Notes") == 0


def test_metrics_exporter_seam_receives_raw_measurements(spark, tmp_path):
    """The exporter fan-out (reference monitoring.py's Azure exporter
    seam): each record() pushes the raw measurement to every exporter
    while the local tagged sums keep accumulating."""
    shipped = []
    metrics = MetricsLog(exporters=[lambda n, v, t: shipped.append((n, v, t))])
    df = spark.createDataFrame([Row(v=i) for i in range(4)])

    def writer(d):
        d.write.mode("overwrite").parquet(str(tmp_path / "out2"))

    write_with_metrics(df, writer, metrics, activity="pseudo", table="Notes")
    write_with_metrics(df, writer, metrics, activity="pseudo", table="Notes")
    assert shipped == [
        ("rows_updated", 4, {"activity": "pseudo", "table": "Notes"}),
        ("rows_updated", 4, {"activity": "pseudo", "table": "Notes"}),
    ]
    assert metrics.get("rows_updated", activity="pseudo", table="Notes") == 8


def test_jsonl_exporter_appends_parseable_lines(tmp_path):
    import json

    from data_seedling_spark.operators.observe import MetricsLog, jsonl_exporter

    path = str(tmp_path / "metrics.jsonl")
    log = MetricsLog(exporters=[jsonl_exporter(path)])
    log.record("rows_updated", 10, activity="pseudonymise", table="notes")
    log.record("rows_updated", 5, activity="pseudonymise", table="notes")
    lines = [json.loads(line) for line in open(path)]
    assert [ln["value"] for ln in lines] == [10, 5]
    assert all(ln["metric"] == "rows_updated" for ln in lines)
    assert lines[0]["tags"] == {"activity": "pseudonymise", "table": "notes"}
    # local sums unaffected by the export fan-out
    assert log.get("rows_updated", activity="pseudonymise", table="notes") == 15
