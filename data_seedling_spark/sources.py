"""Custom connectors via the Python Data Source API (Spark 4,
SPARK-44076): the engine's extension point for sources no built-in
reader covers — internal services, bespoke formats, synthetic load.

``SyntheticDocsDataSource`` is the reference implementation: a
deterministic, PARTITIONED document generator (seeded per partition, so
`local[32]` and a 1000-executor cluster produce byte-identical corpora
— the property load-generation and soak tests need). Each partition
plans independently: Spark schedules one task per ``InputPartition``
and the generator never materialises on the driver.

Usage::

    from data_seedling_spark.sources import register_sources
    register_sources(spark)
    df = (spark.read.format("synthetic_docs")
          .option("rows", 10_000).option("partitions", 8).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_WORDS = (
    "the a and of to data spark table row scan filter join merge batch "
    "stream window agg sort hash value part key fast slow big small line "
    "customer order query vector"
).split()

_LANGS = ("en", "de", "es", "fr", "pt")


class _Partition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        per = -(-self.rows // self.n_parts)  # ceil
        return [
            _Partition(i * per, min((i + 1) * per, self.rows))
            for i in range(self.n_parts)
            if i * per < self.rows
        ]

    def read(self, partition):
        # Pure function of doc_id — partitioning never changes content.
        for i in range(partition.start, partition.end):
            n_words = 20 + (i * 37) % 80
            words = [_WORDS[(i * 13 + j * 7) % len(_WORDS)] for j in range(n_words)]
            text = " ".join(words)
            yield (i, text, _LANGS[i % len(_LANGS)], f"synth/{i % 10}", len(text))


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register_sources(spark) -> None:
    """Register all custom Python data sources on the session."""
    spark.dataSource.register(SyntheticDocsDataSource)
