"""Feature-extraction stage (reference ``stages/feature_extraction.py``).

Re-expresses the reference's external-NLP operator (UD2/UD4) Spark-first:

- the extractor is an Arrow-batched ``mapInPandas`` operator producing a
  **nested** ``<col>_extracted`` struct —
  ``document.entities[]{text,category,offset}`` and
  ``document.relations[]{relationType,source,target}`` — the same shape
  the reference queries with dotted paths (P5; reference
  ``test_feature_extraction.py:181-228``),
- orchestration keeps the reference's scale patterns: cheap ``take(n)``
  size probe (reference ``feature_extraction.py:84-86``), repartition
  to a minimum parallelism before expensive per-row work (X1,
  ``:87-89``), quota sharding across API keys via seeded
  ``randomSplit`` (X2, ``:91-92``), per-shard extraction, PK join back
  (J1, ``:108``) and n-way union (U1, ``:111``).

The default extractor is a deterministic local mock (vocabulary-based
entity tagger) standing in for the external service; a real client
plugs in as ``extractor=`` with the same batch contract. External-call
batching/throttling (reference batchSize=10/concurrency=8) becomes the
Arrow batch size + one HTTP session per python worker.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import EXTRACTED_SUFFIX, TableConfig

#: Deterministic mock vocabulary: token → entity category.
ENTITY_VOCAB: dict[str, str] = {
    "customer": "ROLE",
    "supplier": "ROLE",
    "part": "ITEM",
    "order": "EVENT",
    "query": "ACTION",
    "scan": "ACTION",
}

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField(
            "document",
            T.StructType(
                [
                    T.StructField(
                        "entities",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("text", T.StringType()),
                                    T.StructField("category", T.StringType()),
                                    T.StructField("offset", T.IntegerType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "relations",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("relationType", T.StringType()),
                                    T.StructField("source", T.StringType()),
                                    T.StructField("target", T.StringType()),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def mock_extract_batch(texts: pd.Series) -> list:
    """Vocabulary tagger: whitespace tokens found in ``ENTITY_VOCAB``
    become entities (with token offset); consecutive entities are
    linked by a FOLLOWED_BY relation. Deterministic, NULL-safe."""
    out = []
    for text in texts:
        if text is None:
            out.append(None)
            continue
        entities = []
        for i, tok in enumerate(text.split(" ")):
            cat = ENTITY_VOCAB.get(tok)
            if cat is not None:
                entities.append({"text": tok, "category": cat, "offset": i})
        relations = [
            {
                "relationType": "FOLLOWED_BY",
                "source": entities[i]["text"],
                "target": entities[i + 1]["text"],
            }
            for i in range(len(entities) - 1)
        ]
        out.append({"document": {"entities": entities, "relations": relations}})
    return out


def analyse_text(
    df: DataFrame, text_col: str, extractor=None, api_key: str | None = None
) -> DataFrame:
    """UD2 operator: add ``<text_col>_extracted`` nested struct via
    ``mapInPandas`` (Arrow batches; extractor state initialised once
    per python worker, not broadcast-pickled)."""
    extractor = extractor or mock_extract_batch
    out_col = text_col + EXTRACTED_SUFFIX
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, EXTRACT_SCHEMA)])

    def run(batches):
        for pdf in batches:
            pdf[out_col] = mock_to_rows(extractor(pdf[text_col]))
            yield pdf

    def mock_to_rows(values):
        # Arrow wants None or {"document": {...}} dicts; extractor
        # already returns that shape.
        return values

    return df.mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame,
    config: TableConfig,
    extractor=None,
    api_keys: tuple[str, ...] = ("key0",),
    probe_rows: int = 100,
    min_parallelism: int = 32,
    seed: int = 42,
    rejoin: bool = False,
) -> DataFrame:
    """UD4 orchestration (reference ``feature_extraction.py:54-120``).

    Size-probe with ``take`` (cheaper than count), scale parallelism up
    for the expensive stage, shard across API keys, extract per shard,
    union. Small inputs skip sharding and use a single key (reference
    ``feature_extraction.py:113-118``).

    ``rejoin=True`` reproduces the reference's exact dataflow — project
    to (pks + analysed columns), extract on the projection, PK-join the
    result back (J1). That shape matters when the extractor ships rows
    to an external service (minimal payload); for the colocated
    ``mapInPandas`` path it only adds a shuffle, so the default
    extracts in place (Arrow passthrough of untouched columns is free).
    """
    pks = config.primary_keys
    probe = df.take(probe_rows)
    small = len(probe) < probe_rows

    if small or len(api_keys) == 1:
        result = df
        for col in config.analysed_columns:
            result = analyse_text(result, col, extractor, api_keys[0])
        return result

    df = df.repartition(
        max(min_parallelism, df.sparkSession.sparkContext.defaultParallelism)
    )
    shards = df.randomSplit([1.0] * len(api_keys), seed=seed)
    done = []
    for shard, key in zip(shards, api_keys):
        if rejoin:
            sub = shard.select(*pks, *config.analysed_columns)
            for col in config.analysed_columns:
                sub = analyse_text(sub, col, extractor, key)
            extracted_cols = [c + EXTRACTED_SUFFIX for c in config.analysed_columns]
            done.append(shard.join(sub.select(*pks, *extracted_cols), on=pks))
        else:
            sub = shard
            for col in config.analysed_columns:
                sub = analyse_text(sub, col, extractor, key)
            done.append(sub)
    return reduce(DataFrame.unionByName, done)
