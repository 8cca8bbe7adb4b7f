"""sf10 delete-batch probe for the mapped-index tombstone path
(VERDICT r13 #3 "Done" condition): build the LSH band-row index over
the full documents table in ONE commit, apply a ~1%% GDPR delete
batch, and time the delete-bearing refresh in both modes —
``rewrite`` (anti-join + full overwrite, O(index)) vs ``tombstone``
(append-only, O(changes)) — plus the consumer read after each.

Usage: python tools/probe_tombstone.py [--sf /tmp/sf10]
Solo-session rule applies (SCALE.md probe-discipline note).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_seedling_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf10")
    ap.add_argument("--mods", type=int, default=97,
                    help="delete doc_id %% mods == 0 (~1%% of the corpus)")
    args = ap.parse_args()

    from data_seedling_spark.operators.dedup import MaterializedLshIndex
    from data_seedling_spark.operators.ledger import VersionedTable
    from data_seedling_spark.operators.merge import CHANGE_TYPE, CT_DELETE

    spark = build_session("tomb_probe")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    n_del = docs.where(F.col("doc_id") % args.mods == 0).count()
    print(f"corpus={n_docs} docs, delete batch={n_del} "
          f"({100.0 * n_del / n_docs:.2f}%)")

    for mode in ("rewrite", "tombstone"):
        base = tempfile.mkdtemp(prefix=f"tomb_{mode}_")
        src = VersionedTable(spark, f"{base}/src", write_partitions=32)
        idx = MaterializedLshIndex(
            spark,
            VersionedTable(spark, f"{base}/idx", write_partitions=32),
            text_col="text",
            id_col="doc_id",
            deletes=mode,
        )
        src.write(docs, mode="overwrite")                      # v0
        t0 = time.time()
        assert idx.refresh(src) == (0, 0)
        t_build = time.time() - t0
        feed = docs.where(F.col("doc_id") % args.mods == 0).withColumn(
            CHANGE_TYPE, F.lit(CT_DELETE)
        )
        src.merge(feed, primary_keys=["doc_id"])               # v1
        t0 = time.time()
        assert idx.refresh(src) == (1, 1)
        t_delete = time.time() - t0
        t0 = time.time()
        n_live = idx.read().count()
        t_read = time.time() - t0
        print(
            f"{mode:9s} build={t_build:7.2f}s  delete-refresh="
            f"{t_delete:7.2f}s  read={t_read:6.2f}s  live_rows={n_live}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
