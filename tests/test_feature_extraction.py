"""Feature-extraction tests (reference ``test_feature_extraction.py``
coverage: nested output shape, dotted-path queries, sharding behaviour,
small-input single-key path)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_seedling_spark.config import TableConfig
from data_seedling_spark.pipelines.feature_extraction import (
    analyse_text,
    extract_features,
    mock_extract_batch,
)


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_mock_extractor_shape():
    import pandas as pd

    out = mock_extract_batch(pd.Series(["customer sends order", "nothing here", None]))
    assert out[0]["document"]["entities"] == [
        {"text": "customer", "category": "ROLE", "offset": 0},
        {"text": "order", "category": "EVENT", "offset": 2},
    ]
    assert out[0]["document"]["relations"] == [
        {"relationType": "FOLLOWED_BY", "source": "customer", "target": "order"}
    ]
    assert out[1]["document"]["entities"] == []
    assert out[2] is None


def test_analyse_text_nested_schema_and_dotted_path(spark):
    """P5: dotted-path projection into array-of-struct (reference
    ``test_feature_extraction.py:181-215``)."""
    df = docs_df(spark, ["customer makes a query", "plain words only"])
    out = analyse_text(df, "text")
    assert "text_extracted" in out.columns
    entity_texts = out.select(
        "doc_id", F.col("text_extracted.document.entities.text").alias("texts")
    ).collect()
    got = {r["doc_id"]: r["texts"] for r in entity_texts}
    assert got[0] == ["customer", "query"]
    assert got[1] == []


def test_extract_features_small_input_single_path(spark):
    """<100 rows → no sharding (reference ``feature_extraction.py:113-118``)."""
    df = docs_df(spark, ["customer order", "supplier part"])
    cfg = TableConfig(primary_keys=["doc_id"], analysed_columns=["text"])
    out = extract_features(df, cfg, api_keys=("k0", "k1"), probe_rows=100)
    assert out.count() == 2
    assert "text_extracted" in out.columns


def test_extract_features_sharded_reassembles_all_rows(spark):
    """Sharded path: randomSplit shards → extract → PK join → union
    must cover every input row exactly once."""
    texts = [f"customer number {i} sends order" for i in range(40)]
    df = docs_df(spark, texts)
    cfg = TableConfig(primary_keys=["doc_id"], analysed_columns=["text"])
    out = extract_features(
        df, cfg, api_keys=("k0", "k1", "k2"), probe_rows=10, rejoin=True
    )
    rows = out.select("doc_id", "text_extracted.document.entities").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(40))
    # every doc has the same two entities
    for r in rows:
        assert [e["text"] for e in r["entities"]] == ["customer", "order"]


def test_extract_features_multiple_columns(spark):
    """analysed_columns with >1 entry: each gets its own _extracted
    struct (reference analyses a configurable column list)."""
    from pyspark.sql import functions as F

    df = docs_df(spark, ["customer makes order", "supplier ships part"]).withColumn(
        "title", F.lit("query scan")
    )
    cfg = TableConfig(primary_keys=["doc_id"], analysed_columns=["text", "title"])
    out = extract_features(df, cfg)
    assert {"text_extracted", "title_extracted"} <= set(out.columns)
    r = out.orderBy("doc_id").first()
    assert [e["text"] for e in r["text_extracted"]["document"]["entities"]] == [
        "customer",
        "order",
    ]
    assert [e["text"] for e in r["title_extracted"]["document"]["entities"]] == [
        "query",
        "scan",
    ]
