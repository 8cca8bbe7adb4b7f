"""Pipeline-protocol queries: CDC roundtrip, watermark advance.

These exercise the Phase-2 machinery (``operators.ledger``,
``operators.watermark``, ``streaming.incremental``) end-to-end inside a
driver-checkable query: the versioned table is built in a fresh temp
dir from deterministic slices of ``orders``, processed incrementally,
and the final snapshot is returned — which plain SQL can reproduce.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.ledger import VersionedTable
from .queries import query
from .tables import load_table

_ORDER_COLS = ("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "cdc_incremental_roundtrip",
    oracle="""
    WITH created  AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                      FROM orders WHERE o_orderkey % 4 = 1),
         appended AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                      FROM orders WHERE o_orderkey % 4 = 2),
         inserted AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                      FROM orders WHERE o_orderkey % 4 = 3),
         deleted  AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 8 = 1)
    SELECT * FROM (
      SELECT * FROM created UNION ALL
      SELECT * FROM appended UNION ALL
      SELECT * FROM inserted
    ) s
    WHERE NOT EXISTS (SELECT 1 FROM deleted d WHERE d.o_orderkey = s.o_orderkey)
    """,
    tags=("S2", "S6", "S7", "S8", "ST1", "ST2", "ST3"),
)
def cdc_incremental_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full incremental protocol over a versioned source built from
    deterministic ``orders`` slices:

    - v0 create (keys ≡1 mod 4), v1 append (≡2), v2 merge feed
      (delete ≡1 mod 8, insert ≡3 mod 4),
    - two pipeline runs: after v0–v1, then after v2 — watermark
      advances ``lo = hi + 1`` between them,
    - returns the target's final snapshot, which the oracle reproduces
      relationally.

    Capability parity: reference entry-point frame SURVEY §3.1 (read
    CDF → merge → advance) on the reference's own Delta semantics
    (overwrite-as-delete+insert included via v2's merge commit).
    """
    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    base = tempfile.mkdtemp(prefix="cdc_roundtrip_")
    # Small-data protocol demo: cap commit files and shuffle width so
    # the many tiny jobs don't pay 200-partition overhead under a
    # default session. (Data tables at scale keep full parallelism.)
    source = VersionedTable(spark, f"{base}/src", write_partitions=4)
    target = VersionedTable(spark, f"{base}/dst", write_partitions=4)
    state = VersionedTable(spark, f"{base}/state", write_partitions=1)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _run_roundtrip(spark, orders, source, target, state)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _run_roundtrip(spark, orders, source, target, state) -> DataFrame:
    from .operators.merge import CHANGE_TYPE, CT_DELETE, CT_INSERT
    from .streaming.incremental import run_incremental_activity

    key = F.col("o_orderkey")
    source.write(orders.where(key % 4 == 1), mode="overwrite")
    source.write(orders.where(key % 4 == 2), mode="append")

    # run 1: consume v0..v1
    run_incremental_activity(
        spark, source, target, state,
        activity="cdc_roundtrip", table_name="orders",
        primary_keys=["o_orderkey"],
    )

    # v2: merge feed with deletes and inserts
    feed = (
        orders.where(key % 8 == 1)
        .withColumn(CHANGE_TYPE, F.lit(CT_DELETE))
        .unionByName(orders.where(key % 4 == 3).withColumn(CHANGE_TYPE, F.lit(CT_INSERT)))
    )
    source.merge(feed, primary_keys=["o_orderkey"])

    # run 2: consume v2 only (watermark skips v0..v1)
    run_incremental_activity(
        spark, source, target, state,
        activity="cdc_roundtrip", table_name="orders",
        primary_keys=["o_orderkey"],
    )
    return target.read()
