"""data_seedling_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of SAFEHR-data/Data-Seedling (see
SURVEY.md), generalized into a config-driven operator library that is
designed for 100 TB scale:

- ``session``    — tuned SparkSession builder (AQE, Arrow, UTC).
- ``tables``     — parquet table loaders / temp-view registration.
- ``config``     — column-policy model (ColumnType / TableConfig),
                   mirroring reference ``common_types.py:20-56``.
- ``operators``  — relational ops, CDC merge, watermark protocol,
                   dedup, similarity search, text analysis,
                   multimodal columns.
- ``pipelines``  — pseudonymisation and feature-extraction stage
                   compositions (reference ``transform.py`` /
                   ``feature_extraction.py`` capabilities).
- ``streaming``  — batch-incremental + Structured Streaming variants.
- ``queries``    — the query catalog exported through
                   ``__spark_entry__.py`` (queries + DuckDB oracles).

Everything here is built on the public Apache Spark DataFrame/SQL API;
the physical strategy is left to Catalyst/Tungsten (broadcast hints,
repartitioning and Pandas-UDF batching are applied only where the
declarative plan genuinely needs help).
"""

__version__ = "0.1.0"

from .session import build_session  # noqa: E402,F401
from .tables import load_table, load_tables, register_views  # noqa: E402,F401

__all__ = [
    "build_session",
    "load_table",
    "load_tables",
    "register_views",
]
