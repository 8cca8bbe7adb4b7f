"""Join strategies for scale: bucketed co-located joins and salted
skew joins.

These are the two manual levers left once Catalyst/AQE has done its
part (SURVEY §4 — the reference leaves everything to Catalyst; a 100 TB
deployment cannot):

- **Bucketing** pre-shuffles a table once at write time
  (``bucketBy(n, key).saveAsTable``); every later equi-join or
  aggregation on the key reads co-located buckets and skips the
  exchange entirely. Worth it for any fact table joined repeatedly on
  the same key.
- **Salting** splits a pathologically hot key across ``salt_factor``
  sub-keys: the big side gets a random salt, the small side is
  exploded across all salts, and the join key becomes (key, salt) —
  turning one straggler partition into ``salt_factor`` even ones.
  AQE's skew-join split handles moderate skew automatically; salting
  is for the extreme tail (a single key holding >1 partition's worth).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 8, sort: bool = True
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggs on ``key`` between tables bucketed the same way run
    without a shuffle Exchange (verified in tests by plan inspection).

    Drops any previous incarnation first: a stale warehouse location
    from an earlier session would otherwise fail the save."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    stale = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.exists(stale):
        shutil.rmtree(stale)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free
    by construction."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side randomly, explode
    the small side across every salt, join on (key, salt).

    Row multiplicity is preserved exactly (each big-side row matches
    precisely the one small-side replica carrying its salt), so the
    result equals ``big.join(small, key, how)`` for inner/left joins.
    Other join types would count each unmatched small-side replica
    separately and are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(the exploded small side breaks right/full/semi multiplicity)"
        )
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_factor).cast("int")
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    return (
        salted_big.join(exploded_small, on=[key, "_salt"], how=how).drop("_salt")
    )


#: Runtime bloom-filter join pruning (Spark's row-level runtime
#: filtering): when one join side carries a selective filter, Spark
#: builds a bloom filter over its join keys at runtime and pushes a
#: might_contain probe into the other side's scan — at 100 TB this
#: drops most of the big side's rows BEFORE the shuffle instead of
#: after it. Off by default below large thresholds; these confs turn
#: it on for mid-size plans. Plan signature: bloom_filter_agg on the
#: creation side, might_contain in the application side's filter.
RUNTIME_BLOOM_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # apply even to small application-side scans (default 10GB gate)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def enable_runtime_bloom(spark) -> None:
    """Turn on runtime bloom-filter join pruning for this session.
    Sessions built for 100 TB runs should set these at submit time;
    this helper exists so tests and notebooks can flip them and assert
    the plan shape (`test_relational.py`)."""
    for k, v in RUNTIME_BLOOM_CONF.items():
        spark.conf.set(k, v)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Big×big point-in-interval join without a nested loop: bin the
    numeric point key, explode each interval into every bin it
    overlaps, equi-join on the bin, refine with the exact
    ``lo <= point < hi`` predicate.

    A raw theta join between two large tables falls back to
    BroadcastNestedLoopJoin (or a cartesian) — the classic range-join
    scale cliff. Binning turns it into a shuffle equi-join: cost is
    O(points + intervals × mean_span/bin_width) rows through the
    shuffle, and each (point, interval) pair meets in exactly one bin
    (the point's own), so no dedup pass is needed. ``bin_width``
    trades interval fan-out against bin selectivity — pick it near the
    median interval span so each interval explodes into ~2 bins.
    """
    pb = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "_bin", how)
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def hll_registers(df, col: str, p: int = 8):
    """Deterministic HyperLogLog registers (Flajolet et al. 2007) over
    ``col``: md5-prefix bucketing into ``m = 2^p`` registers, register
    value = 1 + leading-zero-bits of the next 60 hash bits (rank
    computed from the hex string — no float log on wide integers, so
    every engine lands the identical register). Returns one
    ``(bucket, reg)`` row per non-empty register — mergeable state:
    shards/days combine by ``max(reg)`` per bucket, the whole point of
    HLL at 100 TB.

    Unlike the DataSketches-backed ``hll_sketch_agg`` (library-opaque
    bytes, rows-only checkable), this register frame is reproducible
    in ANY engine with md5 — which upgrades the distinct-count sketch
    to a hash-exact oracle check."""
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % (1 << p)
    tail = F.substring(h, 3, 15)  # 60 bits
    stripped = F.regexp_replace(tail, "^0+", "")
    lead_hex_zeros = F.length(tail) - F.length(stripped)
    first_val = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    rho = F.when(F.length(stripped) == 0, F.lit(61)).otherwise(
        4 * lead_hex_zeros + (F.lit(4) - F.floor(F.log2(first_val))) 
    ).cast("int")
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(registers, p: int = 8):
    """Distinct-count estimate from an HLL register frame: the
    standard raw estimator ``α_m · m² / Σ 2^(−M_j)`` with the
    small-range linear-counting correction. The 2^(−M) sum is scaled
    by 2^61 into exact decimal integers so it is addition-order
    independent — the same determinism contract as every money sum.
    Returns a 1-row frame ``(estimate, n_buckets_used)``; merge shards
    by max-per-bucket BEFORE calling (see ``hll_registers``)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), 61 - F.col("reg")).cast("decimal(38,0)"))
        .cast("double")
        .alias("_scaled"),
        F.count("*").alias("n_buckets_used"),
    )
    empty = m - F.col("n_buckets_used")
    # empty registers contribute 2^0 = 1 each → 2^61 each when scaled
    raw = (
        F.lit(alpha * m * m * float(2**61))
        / (F.col("_scaled") + empty.cast("double") * F.lit(float(2**61)))
    )
    corrected = F.when(
        (raw <= 2.5 * m) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.round(corrected, 4).alias("estimate"), "n_buckets_used"
    )


def zorder_key2(a, b, a_min, a_max, b_min, b_max, bits: int = 8):
    """Z-order (Morton) interleaved clustering key for two integer
    dimensions — the OPTIMIZE ZORDER BY layout primitive: sort/compact
    by this key and BOTH columns' per-file min/max ranges stay tight,
    so file-stats pruning works for predicates on either dimension
    (the multi-dimensional generalization of ``compact(sort_by=...)``
    single-key range clustering).

    Each value is scaled to ``bits`` buckets with EXACT integer
    arithmetic — ``div((v - vmin) * 2^bits, vmax - vmin + 1)``, Spark's
    IntegralDivide — then the two bucket ids' bits interleave (a takes
    odd positions). No floats anywhere, so the key is engine-reproducible
    (DuckDB mirrors it with ``//``); min/max come
    in as parameters (one tiny stats aggregate the caller computes, or
    table-level stats the catalog already holds).
    """
    def _c(v):
        from pyspark.sql import Column

        return v if isinstance(v, Column) else F.lit(v)

    n = F.lit(1 << bits)
    a_min, a_max, b_min, b_max = map(_c, (a_min, a_max, b_min, b_max))
    # `div` is Spark's IntegralDivide: exact long arithmetic end to end.
    # floor(double `/`) would round-trip through a 53-bit mantissa and
    # can disagree with integer division once (v - vmin) * 2^bits nears
    # 2^53 or a quotient lands just below an integer.
    qa = F.call_function(
        "div", ((a - a_min) * n).cast("long"), (a_max - a_min + F.lit(1)).cast("long")
    )
    qb = F.call_function(
        "div", ((b - b_min) * n).cast("long"), (b_max - b_min + F.lit(1)).cast("long")
    )
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(qa, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(qb, i).bitwiseAND(F.lit(1))
        key = (
            key
            + F.shiftleft(abit, 2 * i + 1).cast("long")
            + F.shiftleft(bbit, 2 * i).cast("long")
        )
    return key


def hilbert_key2(a, b, a_min, a_max, b_min, b_max, bits: int = 4):
    """Hilbert-curve clustering key for two integer dimensions — the
    locality-preserving upgrade of :func:`zorder_key2` (consecutive
    keys are ALWAYS grid-adjacent, so per-file bounding boxes stay
    compact where Z-order's bit-interleave takes long diagonal jumps
    at power-of-two boundaries; this is the layout primitive behind
    "Hilbert clustering beats Z-order" in modern lakehouse OPTIMIZE
    implementations).

    Values bucketize to ``2^bits`` cells with the same EXACT integer
    arithmetic as ``zorder_key2``, then the standard xy→d walk unrolls
    ``bits`` iterations of quadrant-rotate-and-flip — pure integer
    CASE/bit algebra (the n−1−x mirror keeps coordinates non-negative,
    so no engine-specific negative bit semantics), engine-reproducible
    in SQL. Default 4 bits/dim → 256 curve positions, the same region
    granularity the z-order twin groups by."""

    def _c(v):
        from pyspark.sql import Column

        return v if isinstance(v, Column) else F.lit(v)

    n = 1 << bits
    a, b = _c(a), _c(b)
    a_min, a_max = _c(a_min), _c(a_max)
    b_min, b_max = _c(b_min), _c(b_max)
    # `div` is Spark's IntegralDivide — exact long arithmetic, same
    # rationale as zorder_key2 (floor(double /) can disagree near 2^53)
    x = F.call_function(
        "div",
        ((a - a_min) * F.lit(n)).cast("long"),
        (a_max - a_min + F.lit(1)).cast("long"),
    )
    y = F.call_function(
        "div",
        ((b - b_min) * F.lit(n)).cast("long"),
        (b_max - b_min + F.lit(1)).cast("long"),
    )
    d = F.lit(0).cast("long")
    s = n >> 1
    while s > 0:
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d + F.lit(s * s) * (rx * 3).bitwiseXOR(ry)
        fx = F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        fy = F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        x, y = (
            F.when(ry == 0, fy).otherwise(x),
            F.when(ry == 0, fx).otherwise(y),
        )
        s >>= 1
    return d


def with_hilbert_key(
    df,
    a_col: str,
    b_col: str,
    a_min,
    a_max,
    b_min,
    b_max,
    bits: int = 8,
    out_col: str = "hkey",
):
    """Hilbert xy→d as ONE CHAINED PROJECTION PER BIT LEVEL: each
    rotate-and-flip step references the previous step's (x, y, d) as
    plain column attributes, so the plan stays linear in ``bits``
    (the single-expression :func:`hilbert_key2` re-inlines prior
    steps and grows ~5^bits — fine at 4 bits, hopeless at 8; Catalyst
    keeps the stacked Projects separate because each alias is
    referenced more than once). Same integer-exact bucketing and
    CASE algebra as the expression form, so both produce identical
    keys and the SQL oracle mirrors either."""
    n = 1 << bits
    x0 = F.call_function(
        "div",
        ((F.col(a_col) - a_min) * F.lit(n)).cast("long"),
        (a_max - a_min + F.lit(1)).cast("long"),
    )
    y0 = F.call_function(
        "div",
        ((F.col(b_col) - b_min) * F.lit(n)).cast("long"),
        (b_max - b_min + F.lit(1)).cast("long"),
    )
    keep = list(df.columns)
    df = df.select(
        *keep,
        x0.alias("_hx"),
        y0.alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    s = n >> 1
    while s > 0:
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_hd")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = d + F.lit(s * s) * F.when(rx == 1, F.lit(3) - ry).otherwise(ry)
        fx = F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        fy = F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        df = df.select(
            *keep,
            F.when(ry == 0, fy).otherwise(x).alias("_hx"),
            F.when(ry == 0, fx).otherwise(y).alias("_hy"),
            nd.alias("_hd"),
        )
        s >>= 1
    return df.select(*keep, F.col("_hd").alias(out_col))
