"""Pipeline DAG runner tests (dependsOn semantics) + the two-stage
bronze→silver→gold composition the reference's pipeline.json encodes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_seedling_spark.pipelines.runner import (
    Activity,
    PipelineError,
    run_pipeline,
)


def test_topological_execution_and_outputs():
    log = []
    results = run_pipeline(
        [
            Activity("b", lambda: log.append("b") or "vb", depends_on=["a"]),
            Activity("a", lambda: log.append("a") or "va"),
            Activity("c", lambda: log.append("c") or "vc", depends_on=["a", "b"]),
        ]
    )
    assert log == ["a", "b", "c"]
    assert results["c"].status == "succeeded"
    assert results["b"].output == "vb"


def test_failure_skips_dependents_but_not_siblings():
    def boom():
        raise ValueError("nope")

    results = run_pipeline(
        [
            Activity("a", boom),
            Activity("b", lambda: "ok", depends_on=["a"]),
            Activity("c", lambda: "ok", depends_on=["b"]),
            Activity("other", lambda: "ran"),
        ]
    )
    assert results["a"].status == "failed"
    assert results["b"].status == "skipped"
    assert results["c"].status == "skipped"
    assert results["other"].status == "succeeded"


def test_unknown_dependency_rejected():
    with pytest.raises(PipelineError):
        run_pipeline([Activity("a", lambda: 1, depends_on=["ghost"])])


def test_bronze_silver_gold_composition(spark, tmp_path):
    """The reference's pipeline shape: pseudonymisation feeds feature
    extraction through the versioned silver zone (pipeline.json:24-31)."""
    from data_seedling_spark.config import TABLE_CONFIG, TableConfig
    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.pipelines.feature_extraction import extract_features
    from data_seedling_spark.pipelines.pseudonymise import pseudo_transform
    from data_seedling_spark.streaming.incremental import run_incremental_activity
    from tests.conftest import SF_SMOKE

    bronze = VersionedTable(spark, str(tmp_path / "bronze"), write_partitions=2)
    silver = VersionedTable(spark, str(tmp_path / "silver"), write_partitions=2)
    gold = VersionedTable(spark, str(tmp_path / "gold"), write_partitions=2)
    state = VersionedTable(spark, str(tmp_path / "state"), write_partitions=1)

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    bronze.write(docs, mode="overwrite")

    def pseudonymise():
        return run_incremental_activity(
            spark, bronze, silver, state,
            activity="pseudonymisation", table_name="documents",
            primary_keys=["doc_id"],
            transform=lambda df: pseudo_transform(df, TABLE_CONFIG["documents"]),
        )

    def feature_extract():
        return run_incremental_activity(
            spark, silver, gold, state,
            activity="feature_extraction", table_name="documents",
            primary_keys=["doc_id"],
            transform=lambda df: extract_features(
                df, TableConfig(primary_keys=["doc_id"], analysed_columns=["text"])
            ),
        )

    results = run_pipeline(
        [
            Activity("pseudonymisation", pseudonymise),
            Activity("feature_extraction", feature_extract, depends_on=["pseudonymisation"]),
        ]
    )
    assert all(r.status == "succeeded" for r in results.values())
    out = gold.read()
    assert out.count() == 50
    assert "text_extracted" in out.columns
    # silver text was anonymised before gold extraction (PERSON mask applied)
    masked = out.where(F.col("text").contains("<PERSON>")).count()
    assert masked > 0


def test_cli_doctor_clean_query_exits_zero(capsys):
    import json

    from data_seedling_spark.__main__ import main

    rc = main(
        ["doctor", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["anti_pattern"] is False
    assert out["cartesian"] == 0 and out["python_rowwise"] == 0
