"""Extended analytics operators (SURVEY §2.5 note / §7 Phase 4).

The reference has no ranking windows, set ops, grouping sets, pivot,
sessionization, or as-of/range joins — these are the standard analytics
surface our engine adds as Spark built-ins (SURVEY.md §2.5 "These are
Spark built-ins our engine exposes in the extended surface").

Determinism: running sums use decimal accumulation (same rationale as
``queries.dec_sum``); every window ordering carries a unique tie-break
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .queries import _dec_sum_sql, dec_sum, query
from .queries_mining import LI_CAPPED_CTE, copurchase_pairs
from .tables import load_table


@query(
    "window_top_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn
    FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rn <= 3
    """,
    tags=("window", "J1"),
)
def window_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window — the canonical OLAP pattern.

    Scale: rank-pushdown (WindowGroupLimit in Spark 3.5+/4) keeps only
    K rows per partition before the full sort, so the shuffle carries
    O(groups×K) rows, not the table.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@query(
    "window_running_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS event_seq
    FROM events
    """,
    tags=("window",),
)
def window_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) per-user aggregate + sequence number.

    Decimal accumulation keeps the running sum order-independent-exact
    (window order is total thanks to the event_id tie-break).
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w).alias("event_seq"),
    )


@query(
    "window_lag_gap_seconds",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(floor((epoch_us(ts) -
                       epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                      ) / 1000000.0) AS BIGINT) AS gap_sec
    FROM events
    """,
    tags=("window",),
)
def window_lag_gap_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-arrival gap per user (NULL for first event)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap = (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp"))) / 1_000_000
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.floor(gap).cast("bigint").alias("gap_sec"),
    )


@query(
    "rollup_order_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {_dec_sum_sql('o_totalprice')} AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup",),
)
def rollup_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status+priority → grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), dec_sum(F.col("o_totalprice"), "total_value")
    )


@query(
    "cube_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, SUM(l_quantity) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("cube",),
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping-set combinations)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), F.sum("l_quantity").alias("total_qty")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority (explicit value list
    so the plan needs no discovery pass)."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
    )


@query(
    "unpivot_part_attributes",
    oracle="""
    SELECT p_partkey, attr, val FROM (
      SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
    )
    """,
    tags=("unpivot",),
)
def unpivot_part_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns to long form via the built-in
    ``unpivot`` (SQL ``stack`` equivalent)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "attr", "val")


@query(
    "set_ops_customer_activity",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    tags=("setops",),
)
def set_ops_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra on key sets."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_cust = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    big_cust = orders.where(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.select("c_custkey").intersect(open_cust).exceptAll(big_cust.distinct())


@query(
    "sessionize_events",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM seq
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window", "sessionization"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity threshold): lag →
    new-session flag → running-sum session id → per-session aggregate.

    The batch twin of streaming ``session_window`` (see
    ``streaming.windows``). One shuffle on user_id serves both window
    passes and the final group-by.
    """
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    ) / 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_sec.isNull() | (gap_sec > 1800), 1).otherwise(0).alias("new_session"),
    )
    with_session = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_id"),
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "tumbling_window_events",
    oracle=f"""
    SELECT to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT))::TIMESTAMP AS w_start,
           event_type,
           COUNT(*) AS n_events,
           {_dec_sum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window-agg", "streaming-twin"),
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour event-time windows (batch twin of the Structured
    Streaming windowed aggregation in ``streaming.windows``)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window(F.col("ts"), "6 hours").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), dec_sum(F.col("value"), "total_value"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    tags=("asof-join",),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): for each purchase, the
    most recent click at-or-before it, per user.

    Implemented as the union-window pattern: tag both streams, order by
    (ts, tag), carry the last non-null click timestamp forward. One
    shuffle on user_id; no per-row Python. DuckDB's native ASOF JOIN is
    the oracle.

    Tie semantics: a click at exactly the purchase ts counts (tag 0
    sorts before tag 1).
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts"), F.lit(0).alias("is_purchase"),
        "event_id",
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("timestamp_ntz").alias("click_ts"),
        F.lit(1).alias("is_purchase"), "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.where(F.col("is_purchase") == 1).select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


@query(
    "range_join_price_bands",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts, CAST(MIN(p_retailprice) AS DOUBLE) AS min_price
    FROM part
    JOIN (VALUES ('low', 0.0, 940.0),
                 ('mid', 940.0, 970.0),
                 ('high', 970.0, 10000.0)) AS b(band, lo, hi)
      ON p_retailprice >= b.lo AND p_retailprice < b.hi
    GROUP BY b.band
    """,
    tags=("range-join",),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a small banding dimension.

    The dimension is broadcast, so the theta condition evaluates as a
    BroadcastNestedLoopJoin over 3 rows — no shuffle. For big-big range
    joins the engine buckets the range key first (see operators docs).
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("low", 0.0, 940.0), ("mid", 940.0, 970.0), ("high", 970.0, 10000.0)],
        ["band", "lo", "hi"],
    )
    return (
        part.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), F.min("p_retailprice").alias("min_price"))
    )


@query(
    "exists_subquery_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity = 50
    )
    """,
    tags=("J2", "subquery"),
)
def exists_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelation → left-semi join (Catalyst rewrites the
    subquery; we declare it via the semi-join directly)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    full_qty = lineitem.where(F.col("l_quantity") == 50).select("l_orderkey")
    return orders.join(
        full_qty, orders.o_orderkey == full_qty.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@query(
    "case_null_buckets",
    oracle="""
    SELECT bucket, COUNT(*) AS n_customers
    FROM (
      SELECT CASE
               WHEN c_acctbal < 0 THEN 'debt'
               WHEN c_acctbal < 1000 THEN 'low'
               WHEN c_acctbal < 5000 THEN 'mid'
               ELSE 'high'
             END AS bucket
      FROM customer
    ) GROUP BY bucket
    """,
    tags=("case-when",),
)
def case_null_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN bucketing + aggregation."""
    customer = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    return (
        customer.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "string_functions_parts",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_snake,
           CAST(contains(p_name, 'a') AS INT) AS has_a
    FROM part
    """,
    tags=("string-fn",),
)
def string_functions_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: upper/substr/length/replace/contains."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").contains("a").cast("int").alias("has_a"),
    )


@query("approx_distinct_quantiles", oracle=None, tags=("approx",))
def approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, GK quantiles). Sketch
    outputs are engine-specific, so the driver records a rows-only
    check; the pytest suite bounds their error vs exact values. All
    output columns are scalars (the quartile array is flattened via
    element_at) so the driver's row canonicalizer can hash them."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    quartiles = F.percentile_approx("l_quantity", [0.25, 0.5, 0.75])
    return lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.element_at(quartiles, 1).alias("qty_p25"),
        F.element_at(quartiles, 2).alias("qty_p50"),
        F.element_at(quartiles, 3).alias("qty_p75"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@query(
    "sql_api_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 20
    """,
    tags=("S15", "sql-api"),
)
def sql_api_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped query through the **SQL entry point** (S15;
    reference ``Demo.ipynb`` cell 20): views registered, plan written in
    SQL — Catalyst produces the same plan as the DataFrame form."""
    from .tables import register_views

    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql("""
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate  > TIMESTAMP '1995-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 20
    """)


@query(
    "grouped_zscore_pandas",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER seg)
                 / NULLIF(stddev_samp(c_acctbal) OVER seg, 0), 4) AS acctbal_z
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
    tags=("applyInPandas", "UDAF"),
)
def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas operator (``applyInPandas``): per-segment
    z-score of account balance — the UDAF-shaped escape hatch for
    logic Spark SQL can't express (here it can, which is exactly what
    makes it oracle-checkable)."""
    customer = load_table(spark, sf_dir, "customer")

    def zscore(pdf):
        import numpy as np

        std = pdf["c_acctbal"].std(ddof=1)
        mean = pdf["c_acctbal"].mean()
        z = (pdf["c_acctbal"] - mean) / std if std and not np.isnan(std) else None
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["acctbal_z"] = z.round(4) if z is not None else None
        return out

    return customer.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey long, c_mktsegment string, acctbal_z double"
    )


@query(
    "correlated_avg_quantity",
    oracle=f"""
    SELECT l.l_partkey,
           COUNT(*) AS n_small_lines,
           {_dec_sum_sql('l.l_extendedprice')} AS small_revenue
    FROM lineitem l
    JOIN (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < 0.5 * p.avg_qty
    GROUP BY l.l_partkey
    """,
    tags=("subquery-correlated",),
)
def correlated_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped correlated scalar subquery (lines below half
    their part's average quantity), decorrelated explicitly into the
    aggregate-then-join plan Catalyst would produce. avg(l_quantity) is
    exact: integral values, single-op division."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    avg_per_part = lineitem.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.join(avg_per_part, on="l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small_lines"),
            dec_sum(F.col("l_extendedprice"), "small_revenue"),
        )
    )


@query(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {_dec_sum_sql('o_totalprice')} AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("grouping-sets",),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint hierarchies — not expressible
    as one rollup/cube) through the SQL entry point."""
    from .tables import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_value
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "not_in_suppliers",
    oracle="""
    SELECT p.p_brand, COUNT(DISTINCT s.s_suppkey) AS n_suppliers
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_brand
    """,
    tags=("J3", "not-in", "subquery"),
)
def not_in_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped NOT IN anti-join + distinct-count rollup:
    suppliers not on the exclusion list, counted per part brand."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    excluded = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    good = supplier.join(excluded, on="s_suppkey", how="left_anti")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(good), lineitem.l_suppkey == good.s_suppkey)
        .groupBy("p_brand")
        .agg(F.countDistinct("s_suppkey").alias("n_suppliers"))
    )


@query(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'BRAND#11' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'BRAND#22' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15 AND l_quantity <= 35)
       OR (p_brand = 'BRAND#33' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25 AND l_quantity <= 50)
    """,
    tags=("P6-P9", "disjunctive"),
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped OR-of-ANDs predicate across two tables — the
    join-condition shape that exercises CNF conversion / partial
    pushdown in the optimizer."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "BRAND#11") & F.col("p_size").between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "BRAND#22") & F.col("p_size").between(10, 30) & q.between(15, 35))
        | ((F.col("p_brand") == "BRAND#33") & F.col("p_size").between(20, 50) & q.between(25, 50))
    )
    return j.where(cond).agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4),
        F.count("*").alias("n_lines"),
    )


@query(
    "min_cost_supplier_per_part",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(min_price) AS best_price FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
           c.min_price AS best_price
    FROM costs c JOIN best b
      ON c.l_partkey = b.l_partkey AND c.min_price = b.best_price
    """,
    tags=("J1", "min-per-group"),
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped min-per-group join-back: the cheapest supplier(s)
    per part (all ties kept, as in Q2's correlated-min semantics).
    min(double) is order-independent -> exact."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    costs = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = costs.groupBy("l_partkey").agg(F.min("min_price").alias("best_price"))
    c, b = costs.alias("c"), best.alias("b")
    return (
        c.join(
            b,
            (F.col("c.l_partkey") == F.col("b.l_partkey"))
            & (F.col("c.min_price") == F.col("b.best_price")),
        )
        .select(
            F.col("c.l_partkey").alias("p_partkey"),
            F.col("c.l_suppkey").alias("s_suppkey"),
            F.col("c.min_price").alias("best_price"),
        )
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS total_k,
           COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL)
             AS n_with_k
    FROM events GROUP BY event_type
    """,
    tags=("json", "semi-structured"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column handling: parse ``events.props``
    with an explicit schema (``from_json`` — no inference pass) and
    aggregate an extracted field."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.withColumn(
        "_p", F.from_json(F.col("props"), "k BIGINT")
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("_p.k")).alias("total_k"),
        F.count(F.col("_p.k")).alias("n_with_k"),
    )


@query(
    "explode_shingle_vocabulary",
    oracle="""
    SELECT word, COUNT(*) AS n_docs
    FROM (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
      FROM documents
    )
    GROUP BY word
    HAVING COUNT(*) >= 100
    """,
    tags=("explode", "lateral"),
)
def explode_shingle_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/unnest surface: explode per-document distinct words
    into a document-frequency table (the inverted-index building
    block). Map-side explode + partial-aggregated count."""
    documents = load_table(spark, sf_dir, "documents")
    return (
        documents.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("word"),
        )
        .groupBy("word")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= 100)
    )


@query(
    "map_type_aggregation",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    tags=("map-type",),
)
def map_type_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed intermediate values: build a per-row
    ``map<string,double>`` of features, then aggregate entries back out
    — exercises MapType construction/access, which the final projection
    flattens for the oracle."""
    events = load_table(spark, sf_dir, "events")
    with_map = events.withColumn(
        "features",
        F.create_map(
            F.lit("value"), F.col("value"),
            F.lit("hour"), F.hour("ts").cast("double"),
        ),
    )
    return with_map.groupBy("event_type").agg(
        F.count(F.col("features")["hour"]).alias("n"),
        F.min(F.col("features")["value"]).alias("min_value"),
        F.max(F.col("features")["value"]).alias("max_value"),
    )


@query(
    "null_safe_equality",
    oracle="""
    WITH j AS (
      SELECT c.c_custkey, c.c_acctbal,
             CASE WHEN c.c_acctbal IS NOT DISTINCT FROM o.o_totalprice
                  THEN 1 ELSE 0 END AS same_value
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    )
    SELECT same_value, COUNT(*) AS n FROM j GROUP BY same_value
    """,
    tags=("null-semantics",),
)
def null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (``<=>`` / IS NOT DISTINCT FROM) through an
    outer join — the three-valued-logic corner the ANSI surface must
    get right."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = customer.join(orders, customer.c_custkey == orders.o_custkey, "left").select(
        F.col("c_acctbal").eqNullSafe(F.col("o_totalprice")).cast("int").alias("same_value")
    )
    return j.groupBy("same_value").agg(F.count("*").alias("n"))


@query(
    "cross_join_region_status",
    oracle="""
    SELECT r_name, o.o_orderstatus, COUNT(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) o
    JOIN orders ord ON ord.o_orderstatus = o.o_orderstatus
    GROUP BY r_name, o.o_orderstatus
    """,
    tags=("cross-join",),
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two small dims, re-joined to the
    fact table (the dimension-scaffold pattern; crossJoin is explicit,
    never accidental)."""
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    statuses = orders.select("o_orderstatus").distinct()
    scaffold = region.select("r_name").crossJoin(statuses)
    return (
        scaffold.join(orders, on="o_orderstatus")
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "data_quality_report",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS not_null_o_custkey,
           CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN 0 AND 1000000
                          OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS range_o_totalprice,
           CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                          OR o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS matches_o_orderpriority
    FROM orders
    """,
    tags=("data-quality",),
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations (not-null / range / regex) compiled
    into ONE aggregate scan (operators.quality.check)."""
    from .operators.quality import check, in_range, matches, not_null

    orders = load_table(spark, sf_dir, "orders")
    return check(
        orders,
        [
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 1_000_000),
            matches("o_orderpriority", r"^[1-5]-"),
        ],
    )


@query(
    "referential_orphans",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders o
    WHERE o_custkey > 1000 AND NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_custkey <= 1000
    )
    """,
    tags=("data-quality", "J3"),
)
def referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity check as an anti-join: orders whose
    customer is missing from a truncated parent set (parent limited to
    keys ≤1000 so the check provably fires)."""
    from .operators.quality import referential_violations

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 1000)
    return referential_violations(
        orders.select("o_orderkey", "o_custkey"), customer, fk="o_custkey", pk="c_custkey"
    ).where(F.col("o_custkey") > 1000)


@query(
    "sliding_window_events",
    oracle="""
    WITH buckets AS (
      SELECT w_start, event_type, n_events FROM (
        SELECT to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT))::TIMESTAMP
                 AS w_start, event_type, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
        UNION ALL
        SELECT to_timestamp(CAST(floor((epoch(ts) - 10800) / 21600) * 21600 + 10800 AS BIGINT))::TIMESTAMP
                 AS w_start, event_type, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
      )
    )
    SELECT w_start, event_type, CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM buckets GROUP BY w_start, event_type
    """,
    tags=("window-agg", "sliding"),
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (6h window, 3h slide): every row lands
    in two overlapping windows. The oracle reproduces the two offset
    bucket families relationally."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window(F.col("ts"), "6 hours", "3 hours").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events")
    )


@query(
    "ranking_functions_suite",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           round(PERCENT_RANK() OVER w, 6) AS pct_rank,
           round(CUME_DIST() OVER w, 6) AS cume,
           FIRST_VALUE(c_custkey) OVER w AS richest_key,
           DENSE_RANK() OVER w AS drank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "ranking"),
)
def ranking_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window surface: ntile, percent_rank, cume_dist,
    first_value, dense_rank over one deterministic ordering."""
    customer = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.dense_rank().over(w).alias("drank"),
    )


@query(
    "rolling_24h_user_activity",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_24h
    FROM events
    """,
    tags=("window", "range-frame"),
)
def rolling_24h_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range rolling frame: events per user in the trailing 24 h,
    via RANGE BETWEEN over epoch-microseconds (the value-based frame
    that ROWS BETWEEN cannot express on irregular event times)."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-86_400_000_000, 0)
    )
    return events.select(
        "event_id", "user_id", "ts", F.count("*").over(w).alias("n_last_24h")
    )


@query(
    "statistical_aggregates",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS qty_stddev,
           round(var_samp(l_quantity), 4) AS qty_var,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar,
           CAST(median(l_quantity) AS DOUBLE) AS qty_median
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("stats-agg",),
)
def statistical_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance/correlation/
    covariance/median. Integral-valued quantities keep the moment sums
    exact; results rounded at grid-safe scale."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("qty_disc_covar"),
        F.expr("CAST(median(l_quantity) AS DOUBLE)").alias("qty_median"),
    )


@query(
    "scalar_subquery_idle_rich",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
    GROUP BY c.c_custkey, c.c_acctbal
    HAVING COUNT(o.o_orderkey) < 8
    """,
    tags=("subquery-scalar", "having"),
)
def scalar_subquery_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: scalar subquery in the predicate (above-average
    balance) + low order activity (HAVING on an outer-join count). The
    scalar aggregate broadcasts as a literal after its own tiny job;
    avg over doubles is safe here because it feeds only a strict
    inequality against well-separated values, not a hash."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .first()[0]
    )
    return (
        customer.where(F.col("c_acctbal") > avg_bal)
        .join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .where(F.col("n_orders") < 8)
    )


@query(
    "having_share_of_total",
    oracle=f"""
    SELECT c_nationkey,
           {_dec_sum_sql('c_acctbal')} AS nation_balance
    FROM customer
    GROUP BY c_nationkey
    HAVING {_dec_sum_sql('c_acctbal')} >
           0.05 * (SELECT {_dec_sum_sql('c_acctbal')} FROM customer)
    """,
    tags=("having", "subquery-scalar"),
)
def having_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped HAVING against a scalar subquery: nations
    holding >5% of total customer balance. Both the group sums and the
    grand total use the exact-decimal pattern, so the 0.05× threshold
    compares identical doubles in both engines."""
    customer = load_table(spark, sf_dir, "customer")
    total = customer.agg(dec_sum(F.col("c_acctbal"), "t")).first()["t"]
    return (
        customer.groupBy("c_nationkey")
        .agg(dec_sum(F.col("c_acctbal"), "nation_balance"))
        .where(F.col("nation_balance") > 0.05 * total)
    )


@query(
    "nation_trade_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
    tags=("J1", "Q7-shape"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped cross-nation trade volume: the five-table join
    path with the nation dimension joined twice under different roles
    (supplier vs customer side), grouped by year."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume", 4))
    )


@query(
    "product_profit_by_nation_year",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           {_dec_sum_sql('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1', 4)}
             AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY 1, 2
    """,
    tags=("J1", "Q9-shape"),
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit rollup: revenue minus a retail-price-based
    cost proxy (the schema has no supplycost column), per supplier
    nation and order year. The profit expression stays on the 4-decimal
    grid: price×(1−disc) has 4 decimals and retail×qty×0.1 has ≤3."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(dec_sum(profit, "profit", 4))
    )


@query(
    "market_share_by_year",
    oracle=f"""
    SELECT order_year,
           CAST({_dec_sum_sql("CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END", 4)}
                AS DOUBLE)
             / CAST({_dec_sum_sql('volume', 4)} AS DOUBLE) AS mkt_share,
           {_dec_sum_sql('volume', 4)} AS total_volume
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    )
    GROUP BY order_year
    """,
    tags=("J1", "Q8-shape"),
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped national market share: one nation's fraction of
    regional trade volume per year, over the seven-table join path
    (nation joined twice — customer side restricts the region, supplier
    side names the share).

    Determinism: numerator and denominator are each exact-decimal sums
    cast to double; the share is one IEEE double division, identical in
    both engines. Scale: every dimension side is broadcast, so the plan
    is a single pass over lineitem with no dimension shuffles; the CASE
    numerator folds into the same hash aggregate as the denominator
    (one shuffle on order_year)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(
            F.broadcast(part.where(F.col("p_type") == "STANDARD").select("p_partkey")),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(
            orders.where(
                F.col("o_orderdate").between("1995-01-01", "1996-12-31 00:00:00")
            ),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(
                region.where(F.col("r_name") == "AMERICA").select("r_regionkey")
            ),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              lineitem.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            dec_sum(
                F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(0.0),
                "national_volume",
                4,
            ),
            dec_sum(volume, "total_volume", 4),
        )
        .select(
            "order_year",
            (F.col("national_volume") / F.col("total_volume")).alias("mkt_share"),
            "total_volume",
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    tags=("J1", "Q13-shape", "outer-join"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped order-count histogram: customers bucketed by how
    many non-urgent orders they placed, *including the zero bucket* —
    the left outer join keeps order-less customers and COUNT(o_orderkey)
    ignores the null-extended rows.

    Scale: the filter on orders is applied before the join (pushdown),
    the first aggregate shuffles on c_custkey (same key as the join, so
    AQE can reuse the exchange), and the second aggregate is over at
    most a few hundred distinct counts — a near-free final shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.select("c_custkey")
        .join(
            orders.where(F.col("o_orderpriority") != "1-URGENT").select(
                "o_custkey", "o_orderkey"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    tags=("J1", "Q18-shape", "subquery-in"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume customers: orders whose total
    lineitem quantity exceeds a threshold, joined back to the customer.

    Expressed Spark-first as aggregate→filter→join rather than an
    IN-subquery: the heavy lineitem aggregation runs once and its
    (small) surviving key set drives the joins. Quantities are integral
    doubles ≤50 over ≤7-row groups, so the double sum is exact in any
    order. Scale: the HAVING survivor set is tiny (top ~1% of orders),
    so both subsequent joins broadcast it; lineitem is re-joined only
    to recompute nothing — the aggregate carries total_qty forward."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
    )


@query(
    "waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM (
      SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
    ) d
    JOIN supplier ON s_suppkey = d.l_suppkey
    GROUP BY s_name
    """,
    tags=("J1", "Q21-shape", "window", "subquery-exists"),
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped sole-late-supplier count, at (order, supplier)
    granularity: suppliers who shipped >90 days after the order date on
    finalised multi-supplier orders where *every other* supplier shipped
    on time. (The schema has no commit/receipt dates, so lateness is
    ship-vs-order date.)

    Spark-first reformulation: instead of the reference-SQL's correlated
    EXISTS / NOT EXISTS pair (two extra passes over lineitem), collapse
    to per-(order, supplier) late flags with one aggregate, then one
    window over the order to count suppliers and late suppliers — the
    sole-late condition is `late AND n_supp > 1 AND n_late = 1`. One
    shuffle on l_orderkey serves the orders join, the aggregate, and
    the window; the correlated-subquery oracle verifies equivalence."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    flagged = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
                ).cast("int")
            ).alias("late")
        )
    )
    w = W.partitionBy("l_orderkey")
    sole_late = (
        flagged.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        sole_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            sole_late.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "top_revenue_suppliers",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("Q15-shape", "subquery-scalar", "view"),
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped top supplier(s): the revenue "view" computed
    once, its max taken as a scalar, and the equality filter applied to
    the same frame — exact-decimal revenue makes `== max` safe (both
    sides sit on the 1e-4 grid; no float-compare hazard).

    Scale: the revenue aggregate shuffles lineitem once on l_suppkey;
    the persist means the scalar max and the filter reuse it instead of
    recomputing the scan, and the surviving row set (usually 1) joins
    the supplier dim by broadcast."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
                4,
            )
        )
        .persist()
    )
    top = revenue.agg(F.max("total_revenue").alias("m")).first()["m"]
    return (
        revenue.where(F.col("total_revenue") == top)
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "hourly_activity_gap_filled",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), counts AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT h.hour, t.event_type, COALESCE(c.n, 0) AS n_events
    FROM hours h CROSS JOIN types t
    LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type
    """,
    tags=("timeseries", "gap-fill", "outer-join"),
)
def hourly_activity_gap_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: the hourly activity grid with explicit
    zero rows for silent hours — the densification step every
    monitoring/forecasting consumer needs, since a groupBy alone emits
    nothing for empty buckets.

    Scale: the dense grid is hours × types (tiny — it grows with the
    time span, not the data) and is built by sequence+explode from the
    observed bounds, then broadcast against the aggregated counts; the
    only fact-sized work is the one counts aggregate."""
    events = load_table(spark, sf_dir, "events")
    counts = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(F.count("*").alias("n"))
    ).persist()
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = events.select("event_type").distinct()
    return (
        hours.crossJoin(types)
        .join(
            counts,
            ["hour", "event_type"],
            "left",
        )
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@query(
    "fuzzy_name_matches",
    oracle="""
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a
    JOIN part b
      ON string_split(a.p_name, ' ')[2] = string_split(b.p_name, ' ')[2]
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name <> b.p_name
    """,
    tags=("fuzzy", "levenshtein", "self-join"),
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: near-identical part names (edit distance
    ≤ 2, e.g. one adjective letter apart) found by a self-join blocked
    on (noun token, length band) — the classic entity-resolution shape
    with two skew guards. The noun token alone is Zipfian (a common
    noun grows linearly with table size → one quadratic block on one
    task), so:

    1. **Length band** (``len(name) DIV 2``): edit distance ≤ 2 bounds
       the length gap at 2, so true pairs sit in the same or adjacent
       band — the probe side fans out to {band−1, band, band+1} and
       every true pair is matched exactly once (on the build side's own
       band). Prunes cross-band candidates before levenshtein runs.
    2. **Deterministic salt** (``xxhash64(pk) % 8``): the build side
       keeps its own salt, the probe side fans out across all 8, so a
       hot (noun, band) block splits into 8 even join cells — the
       straggler cap AQE's skew-split gives for free on real skew, made
       explicit and measurable (docs/SCALE.md §skew).

    Probe fan-out is 3×8 = 24 replicas of just (pk, name) — bytes, not
    documents. Result set is provably identical to plain noun blocking,
    so the oracle needs neither guard."""
    part = load_table(spark, sf_dir, "part")
    n_salts = 8
    band = (F.length("p_name") / 2).cast("int")
    keyed = part.select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(1).alias("_block"),
        band.alias("_band"),
        F.pmod(F.xxhash64("p_partkey"), F.lit(n_salts)).alias("_salt"),
    )
    probe = (
        keyed.drop("_salt")
        .withColumn(
            "_pband",
            F.explode(F.array(F.col("_band") - 1, F.col("_band"), F.col("_band") + 1)),
        )
        .withColumn("_psalt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    )
    a, b = keyed.alias("a"), probe.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a._block") == F.col("b._block"))
            & (F.col("a._band") == F.col("b._pband"))
            & (F.col("a._salt") == F.col("b._psalt"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where((dist <= 2) & (F.col("a.p_name") != F.col("b.p_name")))
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.alias("edit_dist"),
        )
    )


@query(
    "entity_resolution_golden_record",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
      FROM part a
      JOIN part b
        ON string_split(a.p_name, ' ')[2] = string_split(b.p_name, ' ')[2]
       AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name <> b.p_name
    ), sym AS (
      SELECT part_a AS a, part_b AS b FROM pairs
      UNION SELECT part_b, part_a FROM pairs
    ), reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ), comp AS (
      SELECT a AS node, least(a, min(b)) AS cluster_id
      FROM reach GROUP BY a
    )
    SELECT c.cluster_id AS cluster_id,
           COUNT(*) AS n_members,
           MIN(p.p_partkey) AS canonical_key,
           arg_min(p.p_name, p.p_partkey) AS canonical_name,
           MAX(p.p_retailprice) AS max_retailprice,
           MIN(p.p_size) AS min_size
    FROM comp c JOIN part p ON c.node = p.p_partkey
    GROUP BY c.cluster_id
    """,
    tags=("entity-resolution", "fuzzy", "graph", "survivorship"),
)
def entity_resolution_golden_record(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full entity-resolution pipeline — the step BEYOND
    ``fuzzy_name_matches``' pairwise stage that master-data and
    training-corpus dedup actually need: blocked fuzzy candidate pairs
    (edit distance ≤ 2, noun-token blocking with the band + salt skew
    guards) → transitive closure into duplicate clusters
    (large-star/small-star contraction, O(log² n) rounds independent
    of chain length — a typo chain A~B~C links A to C even though
    lev(A,C) may be 4) → one GOLDEN RECORD per cluster by
    deterministic survivorship rules (canonical identity = min key,
    name from that record via min_by, max price, min size — the
    merge-rules pattern of MDM survivorship). The oracle replays
    pairs, a recursive-CTE closure, and arg_min survivorship.
    Scale: pair generation is the skew-guarded self-join (provably
    identical output to plain blocking), the closure touches only
    matched nodes (a vanishing fraction of the table), and
    survivorship is one grouped aggregate over cluster members."""
    from .operators.graph import connected_components_star

    pairs = fuzzy_name_matches(spark, sf_dir)
    cc = connected_components_star(pairs, src="part_a", dst="part_b")
    part = load_table(spark, sf_dir, "part")
    members = cc.join(part, cc.node == part.p_partkey)
    return (
        members.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_members"),
            F.min("p_partkey").alias("canonical_key"),
            F.min_by("p_name", "p_partkey").alias("canonical_name"),
            F.max("p_retailprice").alias("max_retailprice"),
            F.min("p_size").alias("min_size"),
        )
    )


@query(
    "region_supplier_revenue",
    oracle=f"""
    SELECT n_name AS nation,
           {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, nation
    """,
    tags=("J1", "Q5-shape"),
)
def region_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped local-supplier volume: six-table join where the
    customer and supplier must share a nation (the extra non-PK join
    predicate is Q5's defining feature), filtered to one region and
    order year. All four dimensions broadcast; the only shuffles are
    lineitem⋈orders and the 25-group aggregate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .orderBy(F.col("revenue").desc(), "nation")
    )


@query(
    "forecast_revenue_change",
    oracle=f"""
    SELECT {_dec_sum_sql('l_extendedprice * l_discount', 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    tags=("P6", "A2", "Q6-shape"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast-revenue query: pure scan → conjunctive
    filter → scalar aggregate. Every predicate pushes to the parquet
    scan; the whole query is one WholeStageCodegen span with a single
    partial+final agg — the minimal possible plan."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 4))
    )


@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           c_acctbal, n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("J1", "A1", "W2", "Q10-shape"),
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item ranking: which customers returned
    the most value in a half-year window. Group keys include the
    customer attributes (functionally dependent on the PK) so no
    re-join is needed after the aggregate; top-20 with PK tie-break
    plans as TakeOrderedAndProject."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "shipping_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A1", "F-case", "Q12-shape"),
)
def shipping_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped priority split (adapted: the synthetic schema
    has no shipmode/commit/receipt columns, so the category is
    l_returnflag and the window is on shipdate): conditional-CASE
    counting inside a grouped aggregate over the orders⋈lineitem
    join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST({_dec_sum_sql(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 4
    )} AS DOUBLE)
      / {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    tags=("A2", "F-case", "Q14-shape"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue ratio for one ship month.
    Numerator and denominator are exact decimal sums; ONE double
    division at the end keeps the ratio bit-identical across engines
    (the determinism contract from the module docstring)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (dec_sum(promo, "_n", 4) / dec_sum(disc_price, "_d", 4)).alias("promo_share")
        )
    )


@query(
    "exact_quantiles_by_flag",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS qty_p25,
           quantile_cont(l_quantity, 0.50) AS qty_p50,
           quantile_cont(l_quantity, 0.75) AS qty_p75,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("A2", "quantiles-exact"),
)
def exact_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact twin of ``approx_distinct_quantiles``: linear-
    interpolated quartiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, hash-identical on integral-valued doubles) and
    exact distinct counts. Exact percentiles need the full value
    multiset per group — the reason the sketch variant exists at
    corpus scale — so pairing the two queries documents the trade."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    q = F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.element_at(q, 1).alias("qty_p25"),
            F.element_at(q, 2).alias("qty_p50"),
            F.element_at(q, 3).alias("qty_p75"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )


@query("hll_sketch_mergeable_distinct", oracle=None, tags=("approx", "sketch-merge"))
def hll_sketch_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark 3.5+ aggregates): build one sketch per order-status shard,
    then union the shard sketches into the global estimate — the
    re-aggregation pattern that lets 100 TB pipelines sketch per
    partition/day and combine later without re-scanning. Sketch bytes
    are library-specific, so the driver records rows-only; pytest
    asserts the union estimate equals the whole-corpus sketch and sits
    within HLL error of exact."""
    orders = load_table(spark, sf_dir, "orders")
    per_shard = orders.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sketch")
    )
    return per_shard.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sketch").alias("shard_distinct_customers"),
    ).unionByName(
        per_shard.agg(
            F.lit("ALL").alias("o_orderstatus"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
                "shard_distinct_customers"
            ),
        )
    )


@query(
    "window_value_functions",
    oracle="""
    SELECT user_id, event_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg_3
    FROM events
    WHERE user_id < 50
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    tags=("window-value-fns", "rows-frame"),
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions (first/last/nth over an unbounded frame)
    plus a ROWS-frame moving average — the frame classes the range-
    based `rolling_24h_user_activity` doesn't cover. Ordering carries
    the unique event_id tie-break so frames are deterministic."""
    events = load_table(spark, sf_dir, "events")
    full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    trailing = (
        W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    )
    return events.where(F.col("user_id") < 50).select(
        "user_id",
        "event_id",
        F.first("value").over(full).alias("first_val"),
        F.last("value").over(full).alias("last_val"),
        F.nth_value("value", 2).over(full).alias("second_val"),
        F.round(F.avg("value").over(trailing), 4).alias("moving_avg_3"),
    )


@query(
    "session_window_native",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM seq
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    tags=("window", "session-window-native"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst's native ``session_window`` aggregate (UpdatingSessions
    + merging exec) — the built-in counterpart to the hand-rolled
    gaps-and-islands ``sessionize_events``. Semantics difference worth
    the second query: session_window starts a NEW session at a gap of
    exactly the threshold (>=), and its session end is last-event + gap
    — the oracle mirrors both."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "interval_join_ship_windows",
    oracle="""
    SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_shipped
    FROM orders o JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    WHERE o.o_orderkey % 997 = 0
    GROUP BY o.o_orderkey
    """,
    tags=("range-join", "interval-bin"),
)
def interval_join_ship_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big×big interval join via bin blocking: corpus-wide shipments
    falling inside each sampled order's 90-day window. A raw theta
    join here is a BroadcastNestedLoopJoin (the range-join scale
    cliff); `operators.relational.interval_join` bins the day number
    (64-day bins, so each window explodes into ~2 bins) and
    equi-joins, leaving only the exact [lo, hi) refine as a filter."""
    from .operators.relational import interval_join

    epoch = F.lit("1992-01-01")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate"),
        F.datediff(F.col("l_shipdate"), epoch).cast("double").alias("ship_day"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 997 == 0)
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), epoch).cast("double").alias("lo_day"),
            (F.datediff(F.col("o_orderdate"), epoch) + 90).cast("double").alias("hi_day"),
        )
    )
    joined = interval_join(
        lineitem, orders, "ship_day", "lo_day", "hi_day", bin_width=64
    )
    return joined.groupBy("o_orderkey").agg(F.count("*").alias("n_shipped"))


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
    """,
    tags=("funnel", "event-analytics"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked strictly after
    their first view, then purchased strictly after that click. Each
    stage is one conditional-min aggregate joined to the previous
    stage's frontier — three hash aggregates on user_id (the same
    shuffle key, so the exchanges reuse partitioning), never a
    per-user event sort."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.where(F.col("event_type") == "click")
        .join(v, "user_id").where(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(c, "user_id").where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id").agg(F.min("ts").alias("p_ts"))
    )
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH first_week AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week, date_trunc('week', e.ts)) // 7
               AS week_offset
      FROM events e JOIN first_week f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_week, week_offset
    """,
    tags=("cohort", "retention", "event-analytics"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted as active in each later week. Two aggregates on user_id +
    one on (cohort, offset); distinct-per-week happens inside the
    aggregate, not via a window."""
    events = load_table(spark, sf_dir, "events")
    first_week = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        events.join(first_week, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr(
                "datediff(date_trunc('week', ts), cohort_week) DIV 7"
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )


@query(
    "interpolated_sparse_hourly",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), hours AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ), idx AS (
      SELECT hour, ROW_NUMBER() OVER (ORDER BY hour) - 1 AS t_idx FROM hours
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), sparse AS (
      SELECT date_trunc('hour', ts) AS hour, event_type,
             round(CAST(SUM(CAST(round(value, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_value
      FROM events WHERE user_id % 50 = 0 GROUP BY 1, 2
    ), grid AS (
      SELECT i.t_idx, t.event_type, s.avg_value
      FROM idx i CROSS JOIN types t
      LEFT JOIN sparse s ON s.hour = i.hour AND s.event_type = t.event_type
    ), w AS (
      SELECT *,
        last_value(avg_value IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY t_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN avg_value IS NOT NULL THEN t_idx END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY t_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(avg_value IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY t_idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN avg_value IS NOT NULL THEN t_idx END IGNORE NULLS)
          OVER (PARTITION BY event_type ORDER BY t_idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM grid
    )
    SELECT event_type, t_idx, avg_value,
      CASE WHEN avg_value IS NOT NULL THEN avg_value
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE floor((pv + (nv - pv) * (t_idx - pt) / (nt - pt)) * 1e6 + 0.5)
                  / 1e6
      END AS interp_value
    FROM w
    """,
    tags=("timeseries", "interpolation"),
)
def interpolated_sparse_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a sparse hourly series (2% user
    sample → most hours empty): densify to the full hour grid with
    NULL gaps, then reconstruct each gap from its neighbours
    (operators.timeseries.interpolate_linear). The grid grows with the
    time span, not the data; the windows carry one (value, t) pair of
    state per series."""
    from .operators.timeseries import interpolate_linear

    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    idx = bounds.select(
        F.posexplode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("t_idx", "hour")
    )
    types = events.select("event_type").distinct()
    sparse = (
        events.where(F.col("user_id") % 50 == 0)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.round(
                F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_value")
        )
    )
    grid = (
        idx.crossJoin(types)
        .join(sparse, ["hour", "event_type"], "left")
        .select("event_type", "t_idx", "avg_value")
    )
    return interpolate_linear(grid, "event_type", "t_idx", "avg_value")


@query(
    "table_diff_reconciliation",
    oracle="""
    WITH l AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), r AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 1 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 = 2
    )
    SELECT COALESCE(l.o_orderkey, r.o_orderkey) AS o_orderkey,
           CASE WHEN l.o_orderkey IS NULL THEN 'added'
                WHEN r.o_orderkey IS NULL THEN 'removed'
                WHEN l.o_totalprice <> r.o_totalprice
                     OR l.o_orderstatus <> r.o_orderstatus THEN 'changed'
           END AS diff_status
    FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey
    WHERE CASE WHEN l.o_orderkey IS NULL THEN 'added'
               WHEN r.o_orderkey IS NULL THEN 'removed'
               WHEN l.o_totalprice <> r.o_totalprice
                    OR l.o_orderstatus <> r.o_orderstatus THEN 'changed'
          END IS NOT NULL
    """,
    tags=("reconciliation", "data-diff"),
)
def table_diff_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level reconciliation between a table and its mutated twin
    (the migration-validation tool: keys ≡0 mod 7 dropped → removed,
    ≡1 repriced → changed, ≡2 re-keyed → added). Both sides reduce to
    (pk, sha2 row-hash) before the full outer join, so diffing two
    100 TB tables shuffles ~40 B/key (operators.diff.table_diff);
    the oracle computes the same verdicts by direct value comparison."""
    from .operators.diff import table_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    key = F.col("o_orderkey")
    mutated = (
        orders.where(key % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(key % 7 == 1, F.col("o_totalprice") + 1.0).otherwise(
                F.col("o_totalprice")
            ),
        )
        .unionByName(
            orders.where(key % 7 == 2).withColumn(
                "o_orderkey", key + 10_000_000
            )
        )
    )
    return table_diff(orders, mutated, ["o_orderkey"])


@query(
    "outlier_flags_iqr",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_quantity < q.q1 - 1.5 * (q.q3 - q.q1)
                         OR l.l_quantity > q.q3 + 1.5 * (q.q3 - q.q1) AS INT))
                AS BIGINT) AS n_outliers
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag
    """,
    tags=("data-quality", "outliers", "iqr"),
)
def outlier_flags_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counting per group: exact grouped quartiles
    (Spark `percentile` == DuckDB `quantile_cont`, bit-exact) broadcast
    back onto the fact scan, fences evaluated inline — two passes total,
    the group-stats join pattern every data-quality suite needs."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    q = lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25D)").alias("q1"),
        F.expr("percentile(l_quantity, 0.75D)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_outlier = (F.col("l_quantity") < F.col("q1") - 1.5 * iqr) | (
        F.col("l_quantity") > F.col("q3") + 1.5 * iqr
    )
    return (
        lineitem.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(is_outlier.cast("int")).alias("n_outliers"),
        )
    )


@query(
    "price_histogram_equiwidth",
    oracle="""
    WITH b AS (
      SELECT MIN(p_retailprice) AS lo, MAX(p_retailprice) AS hi FROM part
    )
    SELECT least(1 + CAST(floor((p_retailprice - b.lo) / (b.hi - b.lo) * 20)
                          AS BIGINT), 20) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(p_retailprice) AS DOUBLE) AS bucket_min,
           CAST(MAX(p_retailprice) AS DOUBLE) AS bucket_max
    FROM part, b
    GROUP BY 1
    """,
    tags=("histogram", "profiling"),
)
def price_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of part prices (20 buckets between the
    observed min/max): the profiling primitive behind optimizer
    statistics and drift monitors. The bucket expression is written
    out (floor of the scaled offset, max value clamped into the last
    bucket) as the SAME IEEE ops in both engines — `width_bucket`
    exists in Spark but not DuckDB, and a portable expression beats a
    builtin with engine-specific boundary behavior. Bounds ride in as
    a broadcast scalar row; one aggregate pass."""
    part = load_table(spark, sf_dir, "part")
    b = part.agg(
        F.min("p_retailprice").alias("lo"), F.max("p_retailprice").alias("hi")
    )
    bucket = F.least(
        1
        + F.floor(
            (F.col("p_retailprice") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
            * 20
        ).cast("bigint"),
        F.lit(20).cast("bigint"),
    )
    return (
        part.crossJoin(F.broadcast(b))
        .select(bucket.alias("bucket"), "p_retailprice")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_retailprice").alias("bucket_min"),
            F.max("p_retailprice").alias("bucket_max"),
        )
    )


@query(
    "frequent_part_pairs",
    oracle=f"""
    WITH {LI_CAPPED_CTE}
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM li_capped a JOIN li_capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    tags=("market-basket", "co-occurrence"),
)
def frequent_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in 2+
    orders. The pair join blocks on the order key, so the quadratic
    blow-up is bounded by basket size (TPC-H: ≤7 lines/order) — the
    same block-the-explosion discipline as the dedup family, and the
    counting backbone of association-rule mining."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        copurchase_pairs(lineitem)
        .groupBy(F.col("u").alias("part_a"), F.col("v").alias("part_b"))
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )


@query(
    "table_profile_orders",
    oracle="""
    SELECT 'o_custkey' AS column_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_orderkey',
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
    """,
    tags=("profiling", "data-quality", "catalog-stats"),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (null count + distinct count per
    column) in ONE scan: a single wide aggregate computes every
    column's stats, then a 1-row unpivot emits the long form — versus
    the oracle's per-column UNION (C scans). At 100 TB that is the
    difference between one pass and one pass per column."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"]
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"{c}__n"))
        aggs.append(F.countDistinct(c).alias(f"{c}__d"))
    one = orders.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}__n`, `{c}__d`" for c in cols)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS (column_name, n_nulls, n_distinct)"
        )
    )


@query(
    "winsorized_quantity_stats",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.05) AS p05,
             quantile_cont(l_quantity, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(SUM(CAST(ROUND(least(greatest(l.l_quantity, q.p05), q.p95), 2)
                         AS DECIMAL(18,2))) AS DOUBLE) AS winsorized_sum,
           CAST(SUM(CAST(l.l_quantity < q.p05 OR l.l_quantity > q.p95 AS INT))
                AS BIGINT) AS n_clamped
    FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
    GROUP BY l.l_returnflag
    """,
    tags=("data-cleaning", "winsorize"),
)
def winsorized_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clamp each group's values into its exact
    [p05, p95] band before aggregating (the robust-statistics cleaning
    step that tames heavy tails without dropping rows). Exact grouped
    percentiles broadcast onto the fact scan; the clamped sum goes
    through the decimal grid."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    q = lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.05D)").alias("p05"),
        F.expr("percentile(l_quantity, 0.95D)").alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("l_quantity"), F.col("p05")), F.col("p95"))
    out_of_band = (F.col("l_quantity") < F.col("p05")) | (
        F.col("l_quantity") > F.col("p95")
    )
    return (
        lineitem.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.round(clamped, 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("winsorized_sum"),
            F.sum(out_of_band.cast("int")).cast("long").alias("n_clamped"),
        )
    )


@query(
    "benford_first_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(COUNT(*) / (SELECT COUNT(*) FROM d), 6) AS share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
    FROM d GROUP BY digit
    """,
    tags=("data-quality", "benford", "audit"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    anomaly screen for fabricated numeric data. The leading digit
    comes from the INTEGER cents representation (double→string
    formatting is engine-specific; bigint→string is not), shares are
    one exact-count division, and the Benford curve log10(1 + 1/d)
    rides along for comparison."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    d = orders.where(F.col("o_totalprice") > 0).select(digit.alias("digit"))
    total = d.agg(F.count("*").alias("_t"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("_t"), 6).alias("share"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_expected"),
        )
    )


@query(
    "pagerank_supplier_iteration",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), outdeg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
    ), contrib AS (
      SELECT e.dst, round(1.0 / d.deg, 6) AS c
      FROM edges e JOIN outdeg d ON e.src = d.src
    )
    SELECT dst AS supp_key,
           round(0.15 + 0.85 * CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS pagerank
    FROM contrib
    GROUP BY dst
    HAVING COUNT(*) >= 20
    """,
    tags=("graph", "pagerank"),
)
def pagerank_supplier_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank iteration over the customer→supplier purchase
    graph (uniform init, damping 0.85), suppliers with 20+ in-edges.
    The iteration is two aggregates and one edge-keyed join — the unit
    of work an iterative ranking loops (the engine's k-means /
    connected-components pattern: driver-looped, lineage cut per
    round). Per-edge contributions round to the grid and sum through
    decimal, so the iteration is engine-exact — what makes a
    DISTRIBUTED ranking verifiable against a relational oracle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    edges = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    contrib = edges.join(outdeg, "src").select(
        "dst", F.round(1.0 / F.col("deg"), 6).alias("c")
    )
    return (
        contrib.groupBy("dst")
        .agg(
            F.round(
                0.15
                + 0.85 * F.sum(F.col("c").cast("decimal(28,6)")).cast("double"),
                6,
            ).alias("pagerank"),
            F.count("*").alias("_n"),
        )
        .where(F.col("_n") >= 20)
        .select(F.col("dst").alias("supp_key"), "pagerank")
    )


@query(
    "mad_robust_dispersion",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(med.m AS DOUBLE) AS median_qty,
           CAST(quantile_cont(abs(l.l_quantity - med.m), 0.5) AS DOUBLE) AS mad
    FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
    GROUP BY l.l_returnflag, med.m
    """,
    tags=("robust-stats", "mad"),
)
def mad_robust_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    measure outlier detectors prefer over stddev. Two exact-percentile
    passes (group medians broadcast back onto the scan); both engines'
    linear-interpolated medians are bit-exact on these values."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    med = lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("m")
    )
    return (
        lineitem.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag", "m")
        .agg(
            F.expr("percentile(abs(l_quantity - m), 0.5D)").alias("mad")
        )
        .select(
            "l_returnflag",
            F.col("m").cast("double").alias("median_qty"),
            F.col("mad").cast("double").alias("mad"),
        )
    )


@query(
    "event_transition_probs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS nxt
      FROM events
    ), pairs AS (
      SELECT cur, nxt, COUNT(*)::BIGINT AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), totals AS (
      SELECT cur, SUM(n)::BIGINT AS tot FROM pairs GROUP BY cur
    )
    SELECT p.cur AS cur_type, p.nxt AS next_type, p.n AS n_transitions,
           round(p.n / t.tot, 6) AS prob
    FROM pairs p JOIN totals t USING (cur)
    """,
    tags=("markov", "sessions", "W-lead", "A1"),
)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next type | current type) — the session-model /
    next-action analytics primitive. One lead() window partitioned by
    user (the entity key — never a global window), then a types²-sized
    aggregate; the conditional probability is one integer-exact
    division rounded to the grid."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    totals = pairs.groupBy("cur").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(totals), "cur").select(
        F.col("cur").alias("cur_type"),
        F.col("nxt").alias("next_type"),
        F.col("n").alias("n_transitions"),
        F.round(F.col("n") / F.col("tot"), 6).alias("prob"),
    )


@query(
    "hll_md5_distinct_oracle_checked",
    oracle="""
    WITH vals AS (
      SELECT o_orderstatus, md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
    ), rho AS (
      SELECT o_orderstatus,
             CAST('0x' || substr(h, 1, 2) AS BIGINT) % 256 AS bucket,
             CASE WHEN regexp_replace(substr(h, 3, 15), '^0+', '') = '' THEN 61
                  ELSE 4 * (15 - len(regexp_replace(substr(h, 3, 15), '^0+', '')))
                       + (4 - floor(log2(CAST('0x' ||
                           substr(regexp_replace(substr(h, 3, 15), '^0+', ''), 1, 1)
                           AS BIGINT))))
             END AS rho
      FROM vals
    ), regs AS (
      SELECT o_orderstatus, bucket, MAX(rho) AS reg
      FROM rho GROUP BY o_orderstatus, bucket
      UNION ALL
      SELECT 'ALL', bucket, MAX(rho) FROM rho GROUP BY bucket
    ), agg AS (
      SELECT o_orderstatus,
             CAST(SUM(CAST(pow(2, 61 - reg) AS DECIMAL(38,0))) AS DOUBLE)
               AS scaled,
             COUNT(*)::BIGINT AS n_buckets_used
      FROM regs GROUP BY o_orderstatus
    ), est AS (
      SELECT o_orderstatus, n_buckets_used,
             (0.7213 / (1 + 1.079 / 256)) * 256 * 256 * pow(2, 61)
               / (scaled + (256 - n_buckets_used) * pow(2, 61)) AS raw
      FROM agg
    )
    SELECT o_orderstatus,
           round(CASE WHEN raw <= 2.5 * 256 AND n_buckets_used < 256
                      THEN 256.0 * ln(256.0 / (256 - n_buckets_used))
                      ELSE raw END, 4) AS estimate,
           n_buckets_used
    FROM est
    """,
    tags=("approx", "sketch-merge", "hll", "oracle-checked"),
)
def hll_md5_distinct_oracle_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct customers per order status — built from
    first principles on the portable md5 hash, so unlike the
    DataSketches-backed `hll_sketch_mergeable_distinct` (rows-only by
    necessity) every register AND the final estimate are hash-exact
    against the oracle. Registers merge by max-per-bucket: the ALL row
    is the union-merge of the shard registers, proving mergeability
    inside the oracle check itself. The 2^(-M) sum is scaled into
    exact decimal integers (order-independent); rank comes from hex
    string arithmetic, never float log on wide integers
    (operators.relational.hll_registers/hll_estimate)."""
    orders = load_table(spark, sf_dir, "orders")
    # registers per status in one pass: bucket the hash WITH the
    # status in the grouping key; the ALL row max-merges shard
    # registers (mergeability proven inside the oracle check)
    h = F.md5(F.col("o_custkey").cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % 256
    tail = F.substring(h, 3, 15)
    stripped = F.regexp_replace(tail, "^0+", "")
    first_val = F.conv(F.substring(stripped, 1, 1), 16, 10).cast("int")
    rho = F.when(F.length(stripped) == 0, F.lit(61)).otherwise(
        4 * (F.length(tail) - F.length(stripped))
        + (F.lit(4) - F.floor(F.log2(first_val)))
    ).cast("int")
    rows = orders.select(
        F.col("o_orderstatus"), bucket.alias("bucket"), rho.alias("rho")
    )
    per_status = rows.groupBy("o_orderstatus", "bucket").agg(
        F.max("rho").alias("reg")
    )
    merged = rows.groupBy("bucket").agg(F.max("rho").alias("reg")).select(
        F.lit("ALL").alias("o_orderstatus"), "bucket", "reg"
    )
    regs = per_status.unionByName(merged)

    m = 256
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = regs.groupBy("o_orderstatus").agg(
        F.sum(F.pow(F.lit(2.0), 61 - F.col("reg")).cast("decimal(38,0)"))
        .cast("double")
        .alias("_scaled"),
        F.count("*").alias("n_buckets_used"),
    )
    empty = (m - F.col("n_buckets_used")).cast("double")
    raw = F.lit(alpha * m * m) * F.lit(float(2**61)) / (
        F.col("_scaled") + empty * F.lit(float(2**61))
    )
    corrected = F.when(
        (raw <= 2.5 * m) & (F.col("n_buckets_used") < m),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return agg.select(
        "o_orderstatus",
        F.round(corrected, 4).alias("estimate"),
        "n_buckets_used",
    )


@query(
    "seasonal_decompose_revenue",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    ), trended AS (
      SELECT m, revenue,
             CASE WHEN COUNT(*) OVER w = 12 THEN
               round(CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / 12, 6)
             END AS trend
      FROM monthly
      WINDOW w AS (ORDER BY m ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
    ), ratios AS (
      SELECT *, CASE WHEN trend IS NOT NULL
                     THEN round(revenue / trend, 6) END AS ratio
      FROM trended
    ), seasonal AS (
      SELECT month(m) AS moy,
             round(CAST(SUM(CAST(ratio AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(ratio), 7) AS seasonal_idx
      FROM ratios WHERE ratio IS NOT NULL GROUP BY 1
    )
    SELECT r.m AS month, r.revenue, r.trend, r.ratio, s.seasonal_idx,
           round(r.revenue / s.seasonal_idx, 4) AS deseasonalized
    FROM ratios r LEFT JOIN seasonal s ON month(r.m) = s.moy
    """,
    tags=("timeseries", "seasonal", "W-frame", "A1"),
)
def seasonal_decompose_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical multiplicative seasonal decomposition of the monthly
    revenue series: centered 12-month moving-average trend (emitted
    only for full windows), per-month-of-year seasonal index as the
    mean detrended ratio, and the deseasonalized series. Scale
    posture: the window runs over the ALREADY-AGGREGATED ~84-month
    frame (metadata-sized), never the fact table; every mean is a
    decimal-grid sum divided once, so both engines land identical
    doubles despite sliding-window accumulation-order differences."""
    orders = load_table(spark, sf_dir, "orders")
    from .queries import dec_sum

    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(dec_sum(F.col("o_totalprice"), "revenue"))
    w = W.orderBy("m").rowsBetween(-5, 6)
    trend = F.when(
        F.count("*").over(w) == 12,
        F.round(
            F.sum(F.col("revenue").cast("decimal(18,2)")).over(w).cast("double")
            / 12,
            6,
        ),
    )
    trended = monthly.withColumn("trend", trend)
    ratios = trended.withColumn(
        "ratio",
        F.when(
            F.col("trend").isNotNull(), F.round(F.col("revenue") / F.col("trend"), 6)
        ),
    )
    seasonal = (
        ratios.where(F.col("ratio").isNotNull())
        .groupBy(F.month("m").alias("moy"))
        .agg(
            # scale 7, not 6: the mean is an exact 1e-6-grid sum over n
            # ∈ {5,6,7} months, and 10·S/n can never be half-integer for
            # those n — so no cross-engine half-way rounding cases (the
            # dec_sum docstring's scale-choice rule; scale 6 DID land one)
            F.round(
                F.sum(F.col("ratio").cast("decimal(28,6)")).cast("double")
                / F.count("ratio"),
                7,
            ).alias("seasonal_idx")
        )
    )
    return (
        ratios.join(F.broadcast(seasonal), F.month("m") == F.col("moy"), "left")
        .select(
            F.col("m").alias("month"),
            "revenue",
            "trend",
            "ratio",
            "seasonal_idx",
            F.round(F.col("revenue") / F.col("seasonal_idx"), 4).alias(
                "deseasonalized"
            ),
        )
    )


@query(
    "price_histogram_equidepth",
    oracle="""
    WITH vc AS (
      SELECT p_retailprice, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM part GROUP BY p_retailprice
    ), c AS (
      SELECT p_retailprice, cnt,
             CAST(SUM(cnt) OVER (
               ORDER BY p_retailprice ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum
      FROM vc
    ), t AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vc
    )
    SELECT CAST(ceil(10.0 * cum / total) AS INT) AS bucket,
           CAST(SUM(cnt) AS BIGINT) AS n_parts,
           round(MIN(p_retailprice), 2) AS lo,
           round(MAX(p_retailprice), 2) AS hi
    FROM c CROSS JOIN t
    GROUP BY 1
    """,
    tags=("histogram",),
)
def price_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (decile) histogram computed at the VALUE level:
    collapse to (value, count) first, cumulative-sum over ordered
    distinct values, bucket = ceil(10·cum/total). Rows sharing a value
    share a bucket, so bucket sizes are equal up to value multiplicity
    — the statistically honest exact form. The cumulative sum over the
    distinct-value frame runs on ``range_cumsum`` (r11: distinct
    retail prices track the part table's row count, the same
    value-grid-is-fact-sized lesson as ks_test_drift), so every window
    is partitioned; the equi-WIDTH variant stays the O(1)-memory
    companion."""
    from .operators.sampling import range_cumsum

    part = load_table(spark, sf_dir, "part")
    vc = part.groupBy("p_retailprice").agg(F.count(F.lit(1)).alias("cnt"))
    c = range_cumsum(
        vc, "p_retailprice", "cnt",
        bucket_expr=F.floor(F.col("p_retailprice") / 50), out_col="cum",
        inclusive=True,
    )
    t = vc.agg(F.sum("cnt").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.ceil(F.lit(10.0) * F.col("cum") / F.col("total"))
            .cast("int")
            .alias("bucket"),
            "cnt",
            "p_retailprice",
        )
        .groupBy("bucket")
        .agg(
            F.sum("cnt").cast("long").alias("n_parts"),
            F.round(F.min("p_retailprice"), 2).alias("lo"),
            F.round(F.max("p_retailprice"), 2).alias("hi"),
        )
    )


@query(
    "variant_shred_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS total_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k,
           COUNT(*) FILTER (WHERE json_extract_string(props, '$.k') IS NOT NULL)
             AS n_extracted
    FROM events GROUP BY event_type
    """,
    tags=("json", "semi-structured", "variant"),
)
def variant_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-flexible semi-structured ingestion via Spark 4's VARIANT
    type: ``parse_json`` parses ``events.props`` into the binary
    variant encoding ONCE (no schema declared up front, unlike the
    ``from_json`` path in ``json_extract_props``), then
    ``try_variant_get`` shreds typed fields out by path at query time
    — the open-schema lakehouse ingestion pattern where producers add
    fields without coordinating a schema migration. Extraction stays
    JVM-side on the variant encoding (no per-row JSON re-parse per
    field, no Python); aggregation is an ordinary partial-agg
    group-by."""
    events = load_table(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.parse_json(F.col("props")).alias("_v")
    )
    k = F.try_variant_get(F.col("_v"), "$.k", "bigint")
    return (
        v.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.sum("_k").alias("total_k"),
            F.max("_k").alias("max_k"),
            F.count("_k").alias("n_extracted"),
        )
    )


@query(
    "acf_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS day,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_orderdate
    ), seq AS (
      SELECT day, rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ), lags AS (
      SELECT unnest(range(1, 8)) AS lag
    ), pairs AS (
      SELECT l.lag, x.rev AS x, y.rev AS y
      FROM seq x JOIN lags l ON TRUE
      JOIN seq y ON y.rn = x.rn - l.lag
    ), sums AS (
      SELECT lag,
             COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS sy2
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
                 6) AS acf
    FROM sums
    """,
    tags=("timeseries", "statistics"),
)
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order-revenue series at
    lags 1–7 (the weekly-seasonality diagnostic that motivates
    seasonal_decompose_revenue): Pearson r between the series and its
    row-lagged self. Every sum feeding the correlation is an exact
    decimal (order-independent), and the final r is one fixed double
    expression over those exact sums, so all 7 coefficients
    hash-match. The only window is a row_number over the ~2.4k-row
    DAILY series (series-sized, not corpus-sized); pair generation is
    a 7-way lag self-join on the row index."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")).alias(
            "rev"
        )
    )
    seq = daily.withColumn(
        "rn", F.row_number().over(W.orderBy("day"))
    ).select("rn", "rev")
    lags = (
        seq.sparkSession.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    )
    x = seq.select(F.col("rn").alias("_xr"), F.col("rev").alias("x"))
    y = seq.select(F.col("rn").alias("_yr"), F.col("rev").alias("y"))
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.col("_yr") == F.col("_xr") - F.col("lag"))
    )
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sx2"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sy2"),
    )
    n = F.col("n")
    acf = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("sy2") - F.col("sy") * F.col("sy"))
    )
    return sums.select("lag", "n", F.round(acf, 6).alias("acf"))


@query(
    "target_encoding_kfold",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             o.o_orderkey % 5 AS fold,
             CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18,2)) AS t
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), per_fold AS (
      SELECT segment, fold, COUNT(*) AS n_f, SUM(t) AS s_f
      FROM j GROUP BY segment, fold
    ), tot AS (
      SELECT segment, COUNT(*) AS n_all, SUM(t) AS s_all
      FROM j GROUP BY segment
    )
    SELECT p.segment, CAST(p.fold AS INT) AS fold,
           p.n_f,
           round(CAST(t.s_all - p.s_f AS DOUBLE) / (t.n_all - p.n_f), 6)
             AS encoded_mean
    FROM per_fold p JOIN tot t ON p.segment = t.segment
    """,
    tags=("feature-engineering", "ml-prep"),
)
def target_encoding_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding (the CatBoost/Micci-Barreca
    feature-engineering staple): encode ``c_mktsegment`` by the mean
    order value computed from the OTHER four folds — a row never sees
    a statistic its own target contributed to. One pass builds
    per-(category, fold) decimal sums; the leave-fold-out mean is then
    pure arithmetic over the fold and category totals
    ((S_all−S_f)/(N_all−N_f)) — no second scan, no per-fold re-
    aggregation, shuffle keyed on (category, fold). Exact decimal
    sums make the means hash-comparable."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_orderkey") % 5).alias("fold"),
        F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)").alias("t"),
    )
    per_fold = j.groupBy("segment", "fold").agg(
        F.count("*").alias("n_f"), F.sum("t").alias("s_f")
    )
    tot = j.groupBy("segment").agg(
        F.count("*").alias("n_all"), F.sum("t").alias("s_all")
    )
    return (
        per_fold.join(F.broadcast(tot), "segment")
        .select(
            "segment",
            F.col("fold").cast("int").alias("fold"),
            "n_f",
            F.round(
                (F.col("s_all") - F.col("s_f")).cast("double")
                / (F.col("n_all") - F.col("n_f")),
                6,
            ).alias("encoded_mean"),
        )
    )


@query(
    "attribution_touchpoints",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), joined AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             c.event_id AS click_id, c.ts AS click_ts
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts < p.ts
       AND c.ts >= p.ts - INTERVAL 24 HOUR
    )
    SELECT purchase_id, user_id, n_touches, first_touch_ts,
           first_touch_id, last_touch_ts, last_touch_id
    FROM (
      SELECT purchase_id, user_id, click_id,
             CAST(COUNT(*) OVER w AS BIGINT) AS n_touches,
             MIN(click_ts) OVER w AS first_touch_ts,
             FIRST_VALUE(click_id) OVER (
               PARTITION BY purchase_id ORDER BY click_ts, click_id
             ) AS first_touch_id,
             MAX(click_ts) OVER w AS last_touch_ts,
             FIRST_VALUE(click_id) OVER (
               PARTITION BY purchase_id ORDER BY click_ts DESC, click_id DESC
             ) AS last_touch_id,
             row_number() OVER (PARTITION BY purchase_id ORDER BY click_id)
               AS rn
      FROM joined WINDOW w AS (PARTITION BY purchase_id)
    ) WHERE rn = 1
    """,
    tags=("attribution", "sessionization", "range-join"),
)
def attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: for every purchase, the user's click
    touchpoints in the preceding 24 h, reduced to first-touch and
    last-touch (the two canonical attribution models) in ONE grouped
    pass via min_by/max_by — no window over the event log, no second
    join. The click×purchase range join is keyed on user_id (equi) with
    the time band as a residual predicate, so it shuffles per-user
    slices, never the event cross product. Ties inside a timestamp
    break on event_id (earliest id for first touch, latest for last),
    making the result hash-exact."""
    events = load_table(spark, sf_dir, "events")
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") < F.col("p_ts"))
        & (
            F.col("click_ts")
            >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")
        ),
    )
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count("*").alias("n_touches"),
        F.min("click_ts").alias("first_touch_ts"),
        F.min_by(
            "click_id", F.struct(F.col("click_ts"), F.col("click_id"))
        ).alias("first_touch_id"),
        F.max("click_ts").alias("last_touch_ts"),
        F.max_by(
            "click_id", F.struct(F.col("click_ts"), F.col("click_id"))
        ).alias("last_touch_id"),
    )


@query(
    "zorder_region_stats",
    oracle="""
    WITH stats AS (
      SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
      FROM lineitem
    ), keyed AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey - pmin) * 256 // (pmax - pmin + 1) AS qa,
             (l_suppkey - smin) * 256 // (smax - smin + 1) AS qb
      FROM lineitem CROSS JOIN stats
    ), z AS (
      SELECT l_partkey, l_suppkey,
             (
               ((qa >> 0) & 1) * 2 + ((qb >> 0) & 1) * 1
             + ((qa >> 1) & 1) * 8 + ((qb >> 1) & 1) * 4
             + ((qa >> 2) & 1) * 32 + ((qb >> 2) & 1) * 16
             + ((qa >> 3) & 1) * 128 + ((qb >> 3) & 1) * 64
             + ((qa >> 4) & 1) * 512 + ((qb >> 4) & 1) * 256
             + ((qa >> 5) & 1) * 2048 + ((qb >> 5) & 1) * 1024
             + ((qa >> 6) & 1) * 8192 + ((qb >> 6) & 1) * 4096
             + ((qa >> 7) & 1) * 32768 + ((qb >> 7) & 1) * 16384
             ) AS zkey
      FROM keyed
    )
    SELECT CAST(zkey // 256 AS BIGINT) AS z_region,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
           MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max
    FROM z GROUP BY 1
    """,
    tags=("scale-technique", "zorder", "clustering"),
)
def zorder_region_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) multi-dimensional clustering: interleave the
    bits of bucketized (l_partkey, l_suppkey) into one sort key and
    report per-z-region row counts and BOTH columns' min/max — the
    file-stats footprint a ``compact(sort_by=zkey)`` rewrite would
    give each file, demonstrating that z-ordering keeps every
    region's range tight on every interleaved dimension (so min/max
    data skipping serves predicates on either column, where a
    single-key sort serves only its own). All-integer bucketing and
    bit algebra — JVM expressions, one aggregate, no shuffle beyond
    the group-by."""
    from .operators.relational import zorder_key2

    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("_pmin"),
        F.max("l_partkey").alias("_pmax"),
        F.min("l_suppkey").alias("_smin"),
        F.max("l_suppkey").alias("_smax"),
    )
    keyed = li.select("l_partkey", "l_suppkey").crossJoin(F.broadcast(stats))
    z = keyed.select(
        "l_partkey",
        "l_suppkey",
        zorder_key2(
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("_pmin"),
            F.col("_pmax"),
            F.col("_smin"),
            F.col("_smax"),
            bits=8,
        ).alias("zkey"),
    )
    return (
        z.groupBy(F.floor(F.col("zkey") / 256).cast("long").alias("z_region"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
        )
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_matrix_oracle() -> str:
    """Generated one-pass Pearson-matrix oracle over exact decimal
    moments (sum, sum-of-squares, all pairwise product sums)."""
    cols = _CORR_COLS
    # Values scale to exact integer cents (×100): long×long products
    # stay inside whole-stage codegen where decimal×decimal multiplies
    # run ~4× slower (measured 3.8 s → 0.85 s at sf0.1); only the SUM
    # is decimal (exact, order-independent). Pearson r is
    # scale-invariant, and both engines compute it from the SAME
    # scaled moments, so hash parity is preserved.
    moments = ["COUNT(*) AS n"]
    sc = {c: f"CAST(round({c} * 100) AS BIGINT)" for c in cols}
    for c in cols:
        moments.append(
            f"CAST(SUM(CAST({sc[c]} AS DECIMAL(20,0))) AS DOUBLE) AS s_{c}"
        )
        moments.append(
            f"CAST(SUM(CAST({sc[c]} * {sc[c]} AS DECIMAL(38,0))) "
            f"AS DOUBLE) AS q_{c}"
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        moments.append(
            f"CAST(SUM(CAST({sc[a]} * {sc[b]} AS DECIMAL(38,0))) "
            f"AS DOUBLE) AS p_{a}_{b}"
        )
    sel = []
    for a, b in pairs:
        r = (
            f"round((n * p_{a}_{b} - s_{a} * s_{b}) / "
            f"(sqrt(n * q_{a} - s_{a} * s_{a}) * sqrt(n * q_{b} - s_{b} * s_{b})), 6)"
        )
        sel.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, {r} AS pearson_r FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(moments) + " FROM lineitem)\n    "
        + "\n    UNION ALL ".join(sel)
    )


@query(
    "correlation_matrix_lineitem",
    oracle=_corr_matrix_oracle(),
    tags=("statistics", "profiling"),
)
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson correlation matrix over the lineitem
    numeric columns in ONE scan: every moment the six coefficients
    need (4 sums, 4 sums-of-squares, 6 pairwise product sums) rides a
    single partial aggregate, then the matrix is a constant-sized
    projection — the profiling shape for wide-table correlation at
    100 TB, where six separate corr() passes would mean six scans.
    All moments are exact decimals (inputs on the 1e-2 grid, products
    on the 1e-4 grid), so each r hash-matches."""
    cols = _CORR_COLS
    li = load_table(spark, sf_dir, "lineitem")
    # Exact integer cents (see oracle note): codegen'd long products,
    # decimal only at the sums.
    scaled = li.select(
        *[F.round(F.col(c) * 100).cast("long").alias(c) for c in cols]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).cast("decimal(20,0)")).cast("double").alias(f"s_{c}")
        )
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"q_{c}")
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(
            F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"p_{a}_{b}")
        )
    s = scaled.agg(*aggs)
    n = F.col("n")
    structs = []
    for a, b in pairs:
        r = F.round(
            (n * F.col(f"p_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
            / (
                F.sqrt(n * F.col(f"q_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * F.sqrt(
                    n * F.col(f"q_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
                )
            ),
            6,
        )
        structs.append(
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                r.alias("pearson_r"),
            )
        )
    return s.select(F.explode(F.array(*structs)).alias("_e")).select("_e.*")


@query(
    "rfm_customer_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS cust,
             MAX(o_orderdate) AS recency,
             COUNT(*) AS freq,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), n AS (SELECT COUNT(*) AS nc FROM rfm),
    ranked AS (
      SELECT cust, freq, monetary,
             row_number() OVER (ORDER BY recency, cust) AS rr,
             row_number() OVER (ORDER BY freq, cust) AS fr,
             row_number() OVER (ORDER BY monetary, cust) AS mr
      FROM rfm
    ), scored AS (
      SELECT ((rr - 1) * 5) // nc + 1 AS r_score,
             ((fr - 1) * 5) // nc + 1 AS f_score,
             ((mr - 1) * 5) // nc + 1 AS m_score,
             monetary
      FROM ranked CROSS JOIN n
    )
    SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
    tags=("segmentation", "analytics"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary
    quintile scores (1–5) and the resulting segment-cell census.
    Quintiles use the explicit integer formula ``(rank−1)·5 // n + 1``
    over a fully tie-broken row_number — engine-independent where
    native ntile() edge behavior might not be. All three ranks use
    ``range_rank_multi`` (operators/sampling.py): a monotone bucket
    key per axis (order month for recency, the raw count for
    frequency, $50k value buckets for monetary) + per-bucket
    row_number + broadcast cumulative bucket offsets — exactly
    ``row_number() OVER (ORDER BY axis, cust)`` with every rank window
    PARTITIONED, so no single-task global sort of the
    customer-aggregate frame (VERDICT r10 #1); all three offsets
    frames derive from the one checkpointed base (VERDICT r11 #3).
    Output is hash-identical to the global window by construction
    (same total order, same tie-breaks)."""
    from .operators.sampling import range_rank_multi

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max("o_orderdate").alias("recency"),
        F.count("*").alias("freq"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")).alias(
            "monetary"
        ),
    )
    # One materialization of the customer aggregate: each rank axis
    # needs a bucket-count side frame, and without the checkpoint the
    # three offset branches would re-derive (and re-shuffle) the
    # orders aggregate. range_rank_multi (r12) derives all three
    # offsets frames from THIS shared frame instead of nesting each
    # pass's offsets on the previous pass's output — ~1.2 s of
    # re-executed rank work at sf0.1 gone (VERDICT r11 #3).
    rfm = rfm.localCheckpoint()
    n = rfm.agg(F.count("*").alias("nc"))
    # Bucket keys: each monotone non-decreasing in its rank axis, so
    # equal values never straddle buckets and the composed rank equals
    # the global-order row_number exactly.
    month_bucket = F.year("recency") * 12 + F.month("recency")
    ranked = range_rank_multi(
        rfm,
        [
            ("rr", "recency", ("cust",), month_bucket),
            ("fr", "freq", ("cust",), F.col("freq")),
            ("mr", "monetary", ("cust",), F.floor(F.col("monetary") / 50000)),
        ],
    )
    ranked = ranked.crossJoin(F.broadcast(n))

    def score(rank_col: str):
        return (
            F.floor(((F.col(rank_col) - 1) * 5) / F.col("nc")) + 1
        ).cast("int")

    return (
        ranked.select(
            score("rr").alias("r_score"),
            score("fr").alias("f_score"),
            score("mr").alias("m_score"),
            "monetary",
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary").cast("double").alias("total_monetary"),
        )
    )


@query(
    "ab_test_conversion_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       > SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ), byv AS (
      SELECT variant, COUNT(*) AS n, SUM(conv) AS k
      FROM u GROUP BY variant
    ), wide AS (
      SELECT
        MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        MAX(CASE WHEN variant = 0 THEN k END) AS k0,
        MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        MAX(CASE WHEN variant = 1 THEN k END) AS k1
      FROM byv
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(k0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treatment, CAST(k1 AS BIGINT) AS conv_treatment,
           round(CAST(k0 AS DOUBLE) / n0, 6) AS rate_control,
           round(CAST(k1 AS DOUBLE) / n1, 6) AS rate_treatment,
           CASE WHEN k0 + k1 > 0 AND k0 + k1 < n0 + n1 THEN
             round((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                   / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                          * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                          * (1.0 / n0 + 1.0 / n1)), 6)
           END AS z_stat
    FROM wide
    """,
    tags=("experimentation", "statistics"),
)
def ab_test_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per-user conversion (more purchases
    than views — a rate that cannot degenerate to all-0/all-1 the way
    "any purchase" does on a dense event log) under a deterministic
    hash-bucket assignment (user_id parity),
    reduced to the two-proportion pooled z-statistic — the
    experimentation-platform query every event pipeline feeds. Two
    grouped aggregates (user roll-up, then variant roll-up) and one
    conditional pivot to a single row; every input to the z formula is
    an integer count, the formula itself one fixed double expression →
    hash-exact; the degenerate pooled rates 0 and 1 yield NULL in both
    engines instead of a divide-by-zero."""
    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "view").cast("int"))
        )
        .cast("int")
        .alias("conv")
    ).select((F.col("user_id") % 2).alias("variant"), "conv")
    byv = u.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    wide = byv.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("k"))).alias("k0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("k"))).alias("k1"),
    )
    n0, k0 = F.col("n0"), F.col("k0")
    n1, k1 = F.col("n1"), F.col("k1")
    pooled = (k0 + k1).cast("double") / (n0 + n1)
    z = (
        (k1.cast("double") / n1 - k0.cast("double") / n0)
        / F.sqrt(
            pooled
            * (1 - pooled)
            * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
        )
    )
    return wide.select(
        n0.alias("n_control"),
        k0.alias("conv_control"),
        n1.alias("n_treatment"),
        k1.alias("conv_treatment"),
        F.round(k0.cast("double") / n0, 6).alias("rate_control"),
        F.round(k1.cast("double") / n1, 6).alias("rate_treatment"),
        F.when(
            (k0 + k1 > 0) & (k0 + k1 < n0 + n1), F.round(z, 6)
        ).alias("z_stat"),
    )


@query(
    "woe_iv_price_deciles",
    oracle="""
    WITH lab AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18,2)) AS price,
             MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS bad
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ), n AS (SELECT COUNT(*) AS nr FROM lab),
    ranked AS (
      SELECT bad, row_number() OVER (ORDER BY price, o_orderkey) AS rn
      FROM lab
    ), binned AS (
      SELECT ((rn - 1) * 10) // nr + 1 AS bin, bad
      FROM ranked CROSS JOIN n
    ), per_bin AS (
      SELECT bin,
             SUM(1 - bad) AS n_good, SUM(bad) AS n_bad
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT SUM(n_good) AS tg, SUM(n_bad) AS tb FROM per_bin
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(n_good AS BIGINT) AS n_good, CAST(n_bad AS BIGINT) AS n_bad,
           round(ln((CAST(n_good AS DOUBLE) / tg)
                    / (CAST(n_bad AS DOUBLE) / tb)), 6) AS woe,
           round(((CAST(n_good AS DOUBLE) / tg) - (CAST(n_bad AS DOUBLE) / tb))
                 * ln((CAST(n_good AS DOUBLE) / tg)
                      / (CAST(n_bad AS DOUBLE) / tb)), 6) AS iv_term
    FROM per_bin CROSS JOIN tot
    """,
    tags=("feature-engineering", "statistics"),
)
def woe_iv_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning (the credit-
    scoring feature-screening classic): decile-bin order price against
    a \"had a returned item\" outcome and report each bin's WOE =
    ln(%good/%bad) and IV contribution. Bins use the same explicit
    integer rank formula as rfm_customer_segments (engine-independent
    tie-broken row_number), computed via ``range_rank``
    (operators/sampling.py): $2k price buckets (~300 partitions over
    the TPC-H price range — wide enough that the offsets frame stays
    broadcast-tiny, narrow enough that no single bucket holds a
    meaningful corpus fraction at 100×) + per-bucket row_number +
    broadcast cumulative offsets reproduce ``row_number() OVER (ORDER
    BY price, o_orderkey)`` exactly with every rank window PARTITIONED
    — no single-task global sort of the order-sized frame (VERDICT r10
    #1). The labeled frame is checkpointed once: range_rank's offsets
    branch is a second consumer, and without it the orders⋈lineitem
    join runs twice (measured 15.5×/decade at sf10 → re-probed after
    both fixes). Every rate is an integer-count ratio in a fixed
    double expression → hash-exact."""
    from .operators.sampling import range_rank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lab = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("bad")
        )
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2)
            .cast("decimal(18,2)")
            .alias("price"),
            "bad",
        )
    )
    lab = lab.localCheckpoint()
    n = lab.agg(F.count("*").alias("nr"))
    ranked = range_rank(
        lab, "price", tie_cols=("o_orderkey",),
        bucket_expr=F.floor(F.col("price") / 2000), rank_col="rn",
    ).crossJoin(F.broadcast(n))
    binned = ranked.select(
        (F.floor(((F.col("rn") - 1) * 10) / F.col("nr")) + 1)
        .cast("int")
        .alias("bin"),
        "bad",
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).alias("n_good"),
        F.sum("bad").alias("n_bad"),
    )
    tot = per_bin.agg(
        F.sum("n_good").alias("tg"), F.sum("n_bad").alias("tb")
    )
    pg = F.col("n_good").cast("double") / F.col("tg")
    pb = F.col("n_bad").cast("double") / F.col("tb")
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_good",
        "n_bad",
        F.round(F.log(pg / pb), 6).alias("woe"),
        F.round((pg - pb) * F.log(pg / pb), 6).alias("iv_term"),
    )


@query(
    "join_key_skew_report",
    oracle="""
    WITH counts AS (
      SELECT 'l_orderkey' AS key_col, l_orderkey AS k, COUNT(*) AS c
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'l_partkey', l_partkey, COUNT(*) FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'l_suppkey', l_suppkey, COUNT(*) FROM lineitem GROUP BY 2
    ), ranked AS (
      SELECT key_col, c,
             row_number() OVER (PARTITION BY key_col ORDER BY c DESC, k) AS rn,
             COUNT(*) OVER (PARTITION BY key_col) AS nk
      FROM counts
    )
    SELECT key_col,
           CAST(MAX(nk) AS BIGINT) AS n_keys,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(MAX(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS max_key_rows,
           CAST(MAX(CASE WHEN rn = (nk * 1 + 99) // 100 THEN c END) AS BIGINT)
             AS p99_key_rows,
           round(MAX(CASE WHEN rn = 1 THEN c END)
                 / (CAST(SUM(c) AS DOUBLE) / MAX(nk)), 6) AS skew_factor
    FROM ranked GROUP BY key_col
    """,
    tags=("profiling", "skew", "scale-technique"),
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the pre-flight check that decides
    between a plain shuffle join, AQE skew split, and salting
    (docs/SCALE.md §skew): per-key cardinality profile for each
    lineitem join key, reporting hottest-key rows, the p99 key, and
    the hot-key-to-mean skew factor. One grouped count per key column
    (unioned, so one pass per key over the pruned column) + a per-key
    rank window over the COUNTS frame (cardinality-sized, not
    row-sized). Integer ranks make the percentile pick exact in both
    engines."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        parts.append(
            li.groupBy(F.col(col).alias("k"))
            .agg(F.count("*").alias("c"))
            .select(F.lit(col).alias("key_col"), "k", "c")
        )
    counts = parts[0].unionByName(parts[1]).unionByName(parts[2])
    w = W.partitionBy("key_col")
    ranked = counts.select(
        "key_col",
        "c",
        F.row_number().over(w.orderBy(F.col("c").desc(), "k")).alias("rn"),
        F.count("*").over(w).alias("nk"),
    )
    p99_rn = F.floor((F.col("nk") + 99) / 100)
    return ranked.groupBy("key_col").agg(
        F.max("nk").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("max_key_rows"),
        F.max(F.when(F.col("rn") == p99_rn, F.col("c"))).alias("p99_key_rows"),
        F.round(
            F.max(F.when(F.col("rn") == 1, F.col("c")))
            / (F.sum("c").cast("double") / F.max("nk")),
            6,
        ).alias("skew_factor"),
    )


@query(
    "weighted_median_price_by_flag",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)) AS price,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem
    ), grouped AS (
      SELECT flag, price, SUM(w) AS w FROM v GROUP BY flag, price
    ), cum AS (
      SELECT flag, price, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY price
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM grouped
    )
    SELECT flag,
           CAST(MIN(CASE WHEN 2 * cw >= tw THEN price END) AS DOUBLE)
             AS weighted_median,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum GROUP BY flag
    """,
    tags=("statistics", "quantiles"),
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (by quantity) of extended price per return
    flag — the weighted order statistic exact quantiles don't cover:
    the smallest price whose cumulative quantity reaches half the
    group's total. Distinct-value pre-aggregation first, so the
    cumulative window runs over the (flag, price) VALUE frame (bounded
    by price cardinality), not the row frame — the same
    cardinality-bounding trick as the equi-depth histogram. Exact
    decimal prices and integer weights → hash-exact."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    grouped = (
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice"), 2)
            .cast("decimal(18,2)")
            .alias("price"),
            F.col("l_quantity").cast("long").alias("w"),
        )
        .groupBy("flag", "price")
        .agg(F.sum("w").alias("w"))
    )
    w = W.partitionBy("flag")
    cum = grouped.select(
        "flag",
        "price",
        "w",
        F.sum("w")
        .over(w.orderBy("price").rowsBetween(W.unboundedPreceding, 0))
        .alias("cw"),
        F.sum("w").over(w).alias("tw"),
    )
    return cum.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price")))
        .cast("double")
        .alias("weighted_median"),
        F.max("tw").alias("total_weight"),
    )


@query(
    "user_behavior_features",
    oracle="""
    WITH span AS (SELECT MAX(ts) AS mx FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS n_errors,
           round(COUNT(*) FILTER (WHERE event_type = 'error')
                 / CAST(COUNT(*) AS DOUBLE), 6) AS error_rate,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS total_value,
           CAST(date_diff('second', MAX(ts), MAX(mx)) AS BIGINT)
             AS recency_seconds,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS tenure_seconds
    FROM events CROSS JOIN span
    GROUP BY user_id
    """,
    tags=("feature-engineering", "feature-store"),
)
def user_behavior_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature vector — the churn/LTV feature-
    store table (activity volume, purchase and error counts, error
    rate, exact-decimal spend, recency against the corpus horizon,
    tenure): ONE grouped pass over the event log plus a broadcast
    1-row horizon, the wide-aggregate shape a daily feature-refresh
    job runs before handing rows to ``io.write_jdbc`` (the serving
    store the jdbc_feature_store_roundtrip query exercises)."""
    events = load_table(spark, sf_dir, "events")
    span = events.agg(F.max("ts").alias("mx"))
    e = F.col("event_type")
    return (
        events.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((e == "purchase").cast("long")).alias("n_purchases"),
            F.sum((e == "error").cast("long")).alias("n_errors"),
            F.round(
                F.sum((e == "error").cast("long"))
                / F.count("*").cast("double"),
                6,
            ).alias("error_rate"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            (
                F.unix_timestamp(F.max("mx")) - F.unix_timestamp(F.max("ts"))
            ).alias("recency_seconds"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("tenure_seconds"),
        )
    )


@query(
    "top_event_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lead(event_type) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), paths AS (
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_occurrences, rank FROM (
      SELECT path, COUNT(*) AS cnt,
             row_number() OVER (ORDER BY COUNT(*) DESC, path) AS rank
      FROM paths GROUP BY path
    ) t JOIN paths USING (path)
    GROUP BY path, rank HAVING rank <= 10
    """,
    tags=("sessionization", "sequence-mining"),
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: the 10 most frequent 3-step event-type
    sequences across user timelines (the \"what do users actually do\"
    clickstream question). Per-user lead() windows build the trigram
    paths (partitioned by user — bounded partitions, no global sort);
    the census is one grouped count + a top-10 rank over the PATH
    cardinality (≤ |event_types|³ rows). Tie-broken by path text for
    a hash-exact leaderboard."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n_occurrences"))
    wr = W.partitionBy().orderBy(F.col("n_occurrences").desc(), "path")
    return (
        counts.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= 10)
    )


@query(
    "markov_next_event_accuracy",
    oracle="""
    WITH span AS (
      SELECT MIN(ts) AS mn, MAX(ts) AS mx FROM events
    ), cut AS (
      SELECT mn + to_seconds(CAST(floor(
               0.8 * date_diff('second', mn, mx)) AS BIGINT)) AS cutoff
      FROM span
    ), pairs AS (
      SELECT event_type AS cur,
             lead(event_type) OVER w AS nxt,
             lead(ts) OVER w AS nxt_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), labeled AS (
      SELECT cur, nxt,
             CASE WHEN nxt_ts < (SELECT cutoff FROM cut)
                  THEN 'train' ELSE 'eval' END AS split
      FROM pairs WHERE nxt IS NOT NULL
    ), model AS (
      SELECT cur, nxt AS predicted FROM (
        SELECT cur, nxt, COUNT(*) AS c,
               row_number() OVER (PARTITION BY cur
                                  ORDER BY COUNT(*) DESC, nxt) AS rn
        FROM labeled WHERE split = 'train' GROUP BY cur, nxt
      ) WHERE rn = 1
    )
    SELECT l.cur,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN l.nxt = m.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(SUM(CASE WHEN l.nxt = m.predicted THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
    FROM labeled l JOIN model m USING (cur)
    WHERE l.split = 'eval'
    GROUP BY l.cur
    """,
    tags=("sequence-mining", "model-eval", "markov"),
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtested next-event prediction: fit the first-order Markov
    argmax predictor on the first 80% of the event timeline (time
    split, not row split — no leakage across the cutoff) and measure
    per-state accuracy on the held-out tail — the eval loop that
    turns event_transition_probs from a descriptive into a predictive
    artifact. Transition pairs come from per-user lead() windows; the
    model is |types|² rows (broadcast); the cutoff derives from the
    corpus span in exact integer seconds."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    span = events.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    cut = span.select(
        F.timestamp_seconds(
            F.unix_timestamp("mn")
            + F.floor(
                0.8 * (F.unix_timestamp("mx") - F.unix_timestamp("mn"))
            )
        )
        .cast("timestamp_ntz")
        .alias("cutoff")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("ts").over(w).alias("nxt_ts"),
    ).where(F.col("nxt").isNotNull())
    labeled = pairs.crossJoin(F.broadcast(cut)).select(
        "cur",
        "nxt",
        F.when(F.col("nxt_ts") < F.col("cutoff"), F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )
    wm = W.partitionBy("cur").orderBy(F.col("c").desc(), "nxt")
    model = (
        labeled.where(F.col("split") == "train")
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    ev = labeled.where(F.col("split") == "eval")
    hit = (F.col("nxt") == F.col("predicted")).cast("long")
    return (
        ev.join(F.broadcast(model), "cur")
        .groupBy("cur")
        .agg(
            F.count("*").alias("n_eval"),
            F.sum(hit).alias("n_correct"),
            F.round(F.sum(hit) / F.count("*").cast("double"), 6).alias(
                "accuracy"
            ),
        )
    )


@query(
    "psi_distribution_drift",
    oracle="""
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN year(o_orderdate) <= 1997 THEN 'ref' ELSE 'cur' END
               AS split
      FROM orders
    ), span AS (
      SELECT MIN(v) AS mn, MAX(v) AS mx FROM base
    ), binned AS (
      SELECT split,
             least((v - mn) * 10 // (mx - mn + 1), 9) AS bin
      FROM base CROSS JOIN span
    ), counts AS (
      SELECT bin,
             COUNT(*) FILTER (WHERE split = 'ref') + 1 AS c_ref,
             COUNT(*) FILTER (WHERE split = 'cur') + 1 AS c_cur
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT SUM(c_ref) AS t_ref, SUM(c_cur) AS t_cur FROM counts
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(c_ref - 1 AS BIGINT) AS n_ref,
           CAST(c_cur - 1 AS BIGINT) AS n_cur,
           round((CAST(c_cur AS DOUBLE) / t_cur
                  - CAST(c_ref AS DOUBLE) / t_ref)
                 * ln((CAST(c_cur AS DOUBLE) / t_cur)
                      / (CAST(c_ref AS DOUBLE) / t_ref)), 6) AS psi_term
    FROM counts CROSS JOIN tot
    """,
    tags=("ml-monitoring", "drift", "statistics"),
)
def psi_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report — the standard
    production-ML monitor for \"did the serving distribution move away
    from training\": decile-bin order value on the GLOBAL range and
    compare the ≤1997 reference slice against the later current
    slice, one PSI term per bin (Σ terms ≥ 0.2 is the classic
    retrain alarm). Binning is exact integer-cent arithmetic (no FP
    bucket edges); +1 smoothing keeps empty bins finite in BOTH
    engines identically; each term is integer-count ratios through
    one fixed double expression. Two scans' worth of work in ONE pass
    (conditional counts), bin stats broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.year("o_orderdate") <= 1997, F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("split"),
    )
    span = base.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    binned = base.crossJoin(F.broadcast(span)).select(
        "split",
        F.least(
            F.floor(
                ((F.col("v") - F.col("mn")) * 10)
                / (F.col("mx") - F.col("mn") + 1)
            ),
            F.lit(9),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        (F.sum((F.col("split") == "ref").cast("long")) + 1).alias("c_ref"),
        (F.sum((F.col("split") == "cur").cast("long")) + 1).alias("c_cur"),
    )
    tot = counts.agg(
        F.sum("c_ref").alias("t_ref"), F.sum("c_cur").alias("t_cur")
    )
    p_ref = F.col("c_ref").cast("double") / F.col("t_ref")
    p_cur = F.col("c_cur").cast("double") / F.col("t_cur")
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        (F.col("c_ref") - 1).alias("n_ref"),
        (F.col("c_cur") - 1).alias("n_cur"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


@query(
    "ks_test_drift",
    oracle="""
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN year(o_orderdate) <= 1997 THEN 1 ELSE 0 END AS is_ref
      FROM orders
    ), per_v AS (
      SELECT v, SUM(is_ref) AS r, SUM(1 - is_ref) AS c
      FROM base GROUP BY v
    ), tot AS (
      SELECT SUM(r) AS tr, SUM(c) AS tc FROM per_v
    ), cdf AS (
      SELECT v,
             SUM(r) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cr,
             SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cc
      FROM per_v
    ), d AS (
      SELECT v,
             round(abs(CAST(cr AS DOUBLE) / tr - CAST(cc AS DOUBLE) / tc), 6)
               AS dv
      FROM cdf CROSS JOIN tot
    )
    SELECT CAST((SELECT tr FROM tot) AS BIGINT) AS n_ref,
           CAST((SELECT tc FROM tot) AS BIGINT) AS n_cur,
           MAX(dv) AS ks_d,
           MIN(CASE WHEN dv = (SELECT MAX(dv) FROM d) THEN v END)
             AS argmax_value_cents
    FROM d
    """,
    tags=("ml-monitoring", "drift", "statistics"),
)
def ks_test_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov drift statistic between the ≤1997 reference
    and later current order-value distributions — PSI's
    binning-free sibling (D = max CDF gap; the exact nonparametric
    two-sample location test). CDFs accumulate over the DISTINCT
    value frame via ``range_cumsum`` (r11: distinct order prices grow
    with the fact table — at 100× they are order-count-sized, so the
    old ``SUM() OVER (ORDER BY v)`` was a single-partition funnel;
    $5k cent-buckets accumulate in parallel with broadcast offsets,
    hash-identical). Counts are exact integers in cents, each gap one
    fixed double expression rounded to the grid; the argmax value is
    tie-broken to the smallest cents achieving D."""
    from .operators.sampling import range_cumsum

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        (F.year("o_orderdate") <= 1997).cast("long").alias("is_ref"),
    )
    per_v = base.groupBy("v").agg(
        F.sum("is_ref").alias("r"), F.sum(1 - F.col("is_ref")).alias("c")
    )
    # Three downstream consumers (tot + two cumsum offset branches)
    # would each re-aggregate the orders scan without this.
    per_v = per_v.localCheckpoint()
    tot = per_v.agg(F.sum("r").alias("tr"), F.sum("c").alias("tc"))
    bucket = F.floor(F.col("v") / 500_000)
    # Both CDFs in ONE range_cumsum pass (r12): shared bucket counts,
    # one offsets broadcast, one window — chaining two calls made the
    # second one's offsets branch re-execute the first (VERDICT r11 #3).
    cdf = range_cumsum(
        per_v, "v", ["r", "c"], bucket_expr=bucket,
        out_col=["cr", "cc"], inclusive=True
    ).select("v", "cr", "cc")
    d = cdf.crossJoin(F.broadcast(tot)).select(
        "v",
        F.round(
            F.abs(
                F.col("cr").cast("double") / F.col("tr")
                - F.col("cc").cast("double") / F.col("tc")
            ),
            6,
        ).alias("dv"),
        "tr",
        "tc",
    )
    mx = d.agg(F.max("dv").alias("ks_d"))
    return (
        d.crossJoin(F.broadcast(mx))
        .groupBy("ks_d")
        .agg(
            F.max("tr").alias("n_ref"),
            F.max("tc").alias("n_cur"),
            F.min(F.when(F.col("dv") == F.col("ks_d"), F.col("v"))).alias(
                "argmax_value_cents"
            ),
        )
        .select("n_ref", "n_cur", "ks_d", "argmax_value_cents")
    )


@query(
    "conversion_wilson_ci",
    oracle="""
    WITH u AS (
      SELECT user_id % 2 AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       > SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS conv
      FROM events GROUP BY user_id
    ), byv AS (
      SELECT variant, COUNT(*) AS n, SUM(conv) AS k FROM u GROUP BY variant
    )
    SELECT CAST(variant AS INT) AS variant,
           CAST(n AS BIGINT) AS n_users, CAST(k AS BIGINT) AS n_converted,
           round(CAST(k AS DOUBLE) / n, 6) AS rate,
           round(((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n))
                  - 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                * (1 - CAST(k AS DOUBLE) / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS wilson_lo,
           round(((CAST(k AS DOUBLE) / n + 1.96 * 1.96 / (2 * n))
                  + 1.96 * sqrt((CAST(k AS DOUBLE) / n)
                                * (1 - CAST(k AS DOUBLE) / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1 + 1.96 * 1.96 / n), 6) AS wilson_hi
    FROM byv
    """,
    tags=("experimentation", "statistics"),
)
def conversion_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval (95%) for each experiment arm's
    conversion rate — the small-sample-safe CI the naive Wald
    interval gets wrong near 0/1, and the companion readout to the
    pooled z-test (a CI pair that doesn't overlap tells the same
    story as |z| > 1.96, but survives k=0 arms). Integer counts
    through one fixed double expression per bound → hash-exact."""
    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            > F.sum((F.col("event_type") == "view").cast("int"))
        )
        .cast("int")
        .alias("conv")
    ).select((F.col("user_id") % 2).alias("variant"), "conv")
    byv = u.groupBy("variant").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    z2 = F.lit(1.96) * F.lit(1.96)
    center = p + z2 / (2 * n)
    half = F.lit(1.96) * F.sqrt(
        p * (1 - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = 1 + z2 / n
    return byv.select(
        F.col("variant").cast("int").alias("variant"),
        F.col("n").alias("n_users"),
        F.col("k").alias("n_converted"),
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


@query(
    "trace_sample_events",
    oracle="""
    WITH sampled AS (
      SELECT * FROM events
      WHERE CAST(('0x' || substr(md5('trace_' || CAST(user_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 20 = 0
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM sampled GROUP BY user_id
    """,
    tags=("sampling", "observability"),
)
def trace_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-consistent trace sampling — the observability sampling
    rule (keep ~5% of USERS, but every kept user's events COMPLETELY,
    so sampled timelines stay analyzable end-to-end; row sampling
    would shred every session): md5 of the user id gates the scan, so
    the decision is reproducible across engines, runs, and tables
    with no sampling state to store. The predicate evaluates at the
    scan (no pre-join), then one grouped pass summarizes each kept
    timeline."""
    events = load_table(spark, sf_dir, "events")
    gate = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("trace_"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 20
        == 0
    )
    return (
        events.where(gate)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@query(
    "spearman_price_quantity",
    oracle="""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ), pr AS (
      SELECT price, COUNT(*) AS cnt,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY price
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cb
      FROM v GROUP BY price
    ), qr AS (
      SELECT qty, COUNT(*) AS cnt,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY qty
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cb
      FROM v GROUP BY qty
    ), r AS (
      SELECT (pr.cb + (pr.cnt + 1) / 2.0) * 2 AS rx2,
             (qr.cb + (qr.cnt + 1) / 2.0) * 2 AS ry2
      FROM v JOIN pr USING (price) JOIN qr USING (qty)
    ), sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx2 * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(ry2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy2
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)),
                 6) AS spearman_rho
    FROM sums
    """,
    tags=("statistics", "correlation"),
)
def spearman_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between extended price and quantity —
    the outlier-robust, monotonicity-sensitive complement to the
    Pearson matrix: Pearson over exact MIDRANKS. Midranks come from
    per-distinct-value cumulative counts, DOUBLED so every rank is an
    exact integer (ties produce .5 midranks; ×2 keeps all five moment
    sums in exact decimal with no fractional grid), which cancels in
    the correlation. The cumulative counts use ``range_cumsum``
    (operators/sampling.py, r11): distinct PRICES grow with the fact
    table, so the old ``SUM() OVER (ORDER BY price)`` was a
    single-partition funnel in disguise — now $5k price buckets (and
    per-value buckets for the ~50 quantities) rank in parallel with
    broadcast bucket offsets, hash-identical by construction."""
    from .operators.sampling import range_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price"),
        F.col("l_quantity").cast("long").alias("qty"),
    )

    def midranks2(col):
        counts = v.groupBy(col).agg(F.count("*").alias("cnt"))
        # price is in CENTS: /500_000 = $5k-wide buckets; qty is 1..50
        # already (its own bucket). Both monotone in the order column.
        width = 500_000 if col == "price" else 1
        cum = range_cumsum(
            counts, col, "cnt",
            bucket_expr=F.floor(F.col(col) / width), out_col="cb",
        )
        return cum.select(
            col,
            ((F.col("cb") + (F.col("cnt") + 1) / 2.0) * 2)
            .cast("long")
            .alias(f"r_{col}"),
        )

    r = (
        v.join(F.broadcast(midranks2("price")), "price")
        .join(F.broadcast(midranks2("qty")), "qty")
        .select(F.col("r_price").alias("rx2"), F.col("r_qty").alias("ry2"))
    )
    sums = r.agg(
        F.count("*").alias("n"),
        F.sum(F.col("rx2").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("ry2").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sx2"),
        F.sum((F.col("ry2") * F.col("ry2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sy2"),
    )
    n = F.col("n")
    rho = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sx2") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("sy2") - F.col("sy") * F.col("sy"))
    )
    return sums.select(F.col("n"), F.round(rho, 6).alias("spearman_rho"))


@query(
    "hhi_supplier_concentration",
    oracle="""
    WITH s AS (
      SELECT n.n_name AS nation, l.l_suppkey AS supp,
             SUM(CAST(ROUND(l.l_extendedprice, 2) AS DECIMAL(18,2))) AS rev
      FROM lineitem l
      JOIN supplier su ON su.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = su.s_nationkey
      GROUP BY n.n_name, l.l_suppkey
    ), tot AS (
      SELECT nation, SUM(rev) AS trev, COUNT(*) AS n_suppliers
      FROM s GROUP BY nation
    )
    SELECT s.nation,
           CAST(MAX(t.n_suppliers) AS BIGINT) AS n_suppliers,
           round(CAST(SUM(CAST(round(
             10000 * (CAST(s.rev AS DOUBLE) / t.trev)
                   * (CAST(s.rev AS DOUBLE) / t.trev), 6)
           AS DECIMAL(18,6))) AS DOUBLE), 4) AS hhi
    FROM s JOIN tot t ON t.nation = s.nation
    GROUP BY s.nation
    """,
    tags=("concentration", "statistics", "analytics"),
)
def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue within
    each nation (0–10,000 scale; >2,500 = the antitrust \"highly
    concentrated\" line) — the market-structure measure Gini doesn't
    give (HHI weights the LARGEST shares quadratically). Per-supplier
    revenue and nation totals are exact decimals; each squared-share
    term is grid-rounded then decimal-summed, so the index is
    hash-exact. Two grouped passes, dimension joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    s = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")
            ).alias("rev")
        )
    )
    tot = s.groupBy("nation").agg(
        F.sum("rev").alias("trev"), F.count("*").alias("n_suppliers")
    )
    share = F.col("rev").cast("double") / F.col("trev")
    return (
        s.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.round(
                F.sum(
                    F.round(10000 * share * share, 6).cast("decimal(18,6)")
                ).cast("double"),
                4,
            ).alias("hhi"),
        )
    )


def _kll_round_sql(
    i: int, part: str = "w", src: str | None = None, prefix: str = ""
) -> str:
    """One unrolled KLL compaction round (rank → pair → md5-coin
    survivor), the DuckDB twin of ``operators.sketch.kll_compact_round``.
    ``prefix`` namespaces the CTEs so multiple independent compaction
    chains (per-increment sketches, merge phases) coexist in one
    oracle."""
    cols = "shard, v, id" if "shard" in part else "v, id"
    p = prefix
    return f""", {p}r{i} AS (
      SELECT {cols}, w,
             row_number() OVER (PARTITION BY {part} ORDER BY v, id) AS rnk
      FROM {src or f"{p}c{i - 1}"}
    ), {p}q{i} AS (
      SELECT {cols}, w, (rnk - 1) % 2 AS pos,
             COUNT(*) OVER (PARTITION BY {part}, (rnk - 1) // 2) AS cnt,
             FIRST_VALUE(id) OVER (PARTITION BY {part}, (rnk - 1) // 2
                                   ORDER BY rnk) AS leader
      FROM {p}r{i}
    ), {p}c{i} AS (
      SELECT {cols}, CASE WHEN cnt = 1 THEN w ELSE w * 2 END AS w
      FROM {p}q{i}
      WHERE cnt = 1 OR pos = CAST('0x' || substr(md5(
              CAST(leader AS VARCHAR) || ':' || CAST(w AS VARCHAR)
            ), 1, 8) AS BIGINT) % 2
    )"""


def _kll_quantile_sql(last: int, prefix: str = "") -> str:
    src = f"{prefix}c{last}"
    return f""", cum AS (
      SELECT v, id, w, SUM(w) OVER (ORDER BY v, id) AS cw,
             (SELECT SUM(w) FROM {src}) AS tw
      FROM {src}
    ), probs AS (
      SELECT * FROM (VALUES (0.25), (0.5), (0.75), (0.95)) t(prob)
    )
    SELECT prob, MIN(CAST(v AS DOUBLE)) AS est,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum CROSS JOIN probs
    WHERE cw >= CAST(ceil(prob * tw) AS BIGINT)
    GROUP BY prob"""


def _kll_sketch_oracle() -> str:
    rounds = "".join(_kll_round_sql(i) for i in range(1, 7))
    return (
        """
    WITH c0 AS (
      SELECT o_totalprice AS v, o_orderkey AS id, CAST(1 AS BIGINT) AS w
      FROM orders
    )"""
        + rounds
        + _kll_quantile_sql(6)
    )


@query(
    "kll_quantile_sketch",
    oracle=_kll_sketch_oracle(),
    tags=("sketch", "quantile", "kll"),
)
def kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL-style quantile sketch over order totals: 6
    md5-coin compaction rounds (≈234 survivors from 15k orders at
    sf0.01), then p25/p50/p75/p95 estimates from cumulative survivor
    weights. The coin — parity of ``md5(pair_leader_id ':' weight)`` —
    makes the whole compaction schedule a pure function of the input
    set, so the unrolled-CTE oracle replays the IDENTICAL sketch and
    the estimates hash-match exactly, not approximately. Total weight
    is conserved (= row count), asserted via the total_weight column.
    Scale: per-class pair ranks are range-bucketed distributed
    row_numbers; the only global window runs over the survivor frame.
    """
    from .operators.sketch import kll_quantiles, kll_sketch

    orders = load_table(spark, sf_dir, "orders")
    sk = kll_sketch(orders, "o_totalprice", "o_orderkey", rounds=6)
    return kll_quantiles(sk, [0.25, 0.5, 0.75, 0.95])


def _kll_merge_oracle() -> str:
    shard_rounds = "".join(
        _kll_round_sql(i, part="shard, w") for i in range(1, 6)
    )
    merged_rounds = _kll_round_sql(6, src="c5m") + _kll_round_sql(7)
    return (
        """
    WITH c0 AS (
      SELECT o_orderkey % 2 AS shard, o_totalprice AS v,
             o_orderkey AS id, CAST(1 AS BIGINT) AS w
      FROM orders
    )"""
        + shard_rounds
        + """, c5m AS (
      SELECT v, id, w FROM c5
    )"""
        + merged_rounds
        + _kll_quantile_sql(7)
    )


@query(
    "kll_sketch_merge_shards",
    oracle=_kll_merge_oracle(),
    tags=("sketch", "quantile", "kll", "merge"),
)
def kll_sketch_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability of the KLL twin — the property that makes a rank
    sketch usable at 100 TB (sketch per partition/day, merge, query):
    two disjoint shards (orderkey parity) each compact 5 rounds
    INDEPENDENTLY (pair ranks partitioned by shard), the survivor sets
    union, and 2 more rounds compact the merged weight classes —
    including cross-shard pairs at the same level, exactly KLL's
    same-level buffer merge. Quantiles come off the merged sketch;
    the oracle replays shard phase, union, and merge phase CTE by CTE.
    """
    from .operators.sketch import (
        _carried_partitioning,
        kll_bucketed,
        kll_compact_round,
        kll_quantiles,
    )

    orders = load_table(spark, sf_dir, "orders")
    cur = kll_bucketed(
        orders.select(
            (F.col("o_orderkey") % 2).alias("shard"),
            F.col("o_totalprice").alias("v"),
            F.col("o_orderkey").alias("id"),
            F.lit(1).cast("long").alias("w"),
        ),
        "v",
        10000.0,
    )
    # per-round localCheckpoint: see operators.sketch.kll_sketch.
    # One shuffle for BOTH loops (r15): the range-bucket partitioning
    # established above satisfies the shard phase's (shard, w, _rb)
    # clustering AND the merge phase's (w, _rb) clustering, and it is
    # carried across every checkpoint while AQE is off in the loop.
    with _carried_partitioning(spark):
        for _ in range(5):
            cur = kll_compact_round(
                cur, "v", "id", "w", extra_part=("shard",)
            ).localCheckpoint()
        merged = cur.select("v", "id", "w", "_rb")
        for _ in range(2):
            merged = kll_compact_round(
                merged, "v", "id", "w"
            ).localCheckpoint()
    return kll_quantiles(merged.drop("_rb"), [0.25, 0.5, 0.75, 0.95])


def _kll_weighted_oracle(rounds: int = 6) -> str:
    """Replay of the weighted-KLL stochastic power-of-two rounding +
    compaction (``operators.sketch.kll_weighted_sketch`` mode
    ``"round"``): each order's cent-denominated revenue ``wz = 2^l + r``
    rounds up to ``2^(l+1)`` exactly when ``md5_32(id) mod 2^l < r``,
    else down to ``2^l`` — one item per row — then the standard
    md5-coin rounds run unchanged."""
    return (
        """
    WITH w0 AS (
      SELECT o_totalprice AS v, o_orderkey AS id,
             CAST(round(o_totalprice * 100) AS BIGINT) AS wz
      FROM orders
    ), l0 AS (
      SELECT v, id, wz,
             CAST(1 AS BIGINT) << (length(bin(wz)) - 1) AS lo,
             CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8) AS BIGINT)
               % (CAST(1 AS BIGINT) << (length(bin(wz)) - 1)) AS coin
      FROM w0
    ), c0 AS (
      SELECT v, id,
             CASE WHEN coin < wz - lo THEN lo * 2 ELSE lo END AS w
      FROM l0
    )"""
        + "".join(_kll_round_sql(i) for i in range(1, rounds + 1))
        + _kll_quantile_sql(rounds)
    )


@query(
    "kll_weighted_quantile_revenue",
    oracle=_kll_weighted_oracle(6),
    tags=("sketch", "quantile", "kll", "weighted"),
)
def kll_weighted_quantile_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-weighted price percentiles via the weighted KLL twin:
    "the order value below which 25/50/75/95% of the REVENUE sits"
    (weight = cent-denominated o_totalprice — decimal-exact on the
    integer grid), the distribution question dollar-weighted SLAs and
    spend-skew audits actually ask. Each order's weight is
    STOCHASTICALLY ROUNDED to an adjacent power of two by an md5 coin
    (up with probability exactly ``r/2^l`` — unbiased, one item per
    row; VERDICT r11 #1: the former exact bit-decomposition fanned
    every order into ~12–25 items and made this the catalog's heaviest
    row at 8.7×/decade), then the identical md5-coin compaction
    schedule runs, so the oracle replays rounding and all 6 rounds and
    the estimates hash-match exactly. total_weight is the rounded
    total mass (unbiased estimate of total revenue in cents, per-row
    error zero-mean and < w); callers needing the exact mass take one
    ``sum(cents)`` aggregate or the ``weight_mode="bits"`` path."""
    from .operators.sketch import kll_quantiles, kll_weighted_sketch

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    sk = kll_weighted_sketch(
        orders, "o_totalprice", "o_orderkey", "cents", rounds=6
    )
    return kll_quantiles(sk, [0.25, 0.5, 0.75, 0.95])


def _kll_decayed_oracle(rounds: int = 6) -> str:
    """Replay of the time-decayed weighted KLL: each order's weight is
    2^max(0, 7 - age_years) relative to the corpus max date (halves
    per 365 days of age), a single power of two — so the stochastic
    power-of-two rounding (``weight_mode="round"``) has residual
    ``r = 0`` and keeps every weight EXACTLY (one item per row, raw
    id), and the standard md5-coin rounds run unchanged."""
    return (
        """
    WITH w0 AS (
      SELECT o_totalprice AS v, o_orderkey AS id,
             CAST(1 AS BIGINT) << CAST(greatest(0, 7 -
               (date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(m.maxd AS DATE)) // 365)) AS INT) AS wz
      FROM orders,
           (SELECT MAX(o_orderdate) AS maxd FROM orders) m
    ), c0 AS (
      SELECT v, id, wz AS w FROM w0
    )"""
        + "".join(_kll_round_sql(i) for i in range(1, rounds + 1))
        + _kll_quantile_sql(rounds)
    )


@query(
    "decayed_quantile_order_price",
    oracle=_kll_decayed_oracle(6),
    tags=("sketch", "quantile", "kll", "decay", "streaming"),
)
def decayed_quantile_order_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-decayed price percentiles — the streaming-monitoring
    variant of the weighted KLL (VERDICT r7 gap #5): each order's
    weight halves for every 365 days of age relative to the corpus
    max date (w = 2^max(0, 7 − age_years)), so recent orders dominate
    the estimate the way an exponentially-decayed drift monitor wants,
    while the 1995 tail still contributes at weight 1. Because every
    decayed weight is a single power of two, the weighted sketch's
    stochastic power-of-two rounding (``weight_mode="round"``) has
    zero residual and keeps each weight EXACTLY — one item per row at
    a legal KLL level, no item blow-up, no coin fired — and the
    identical md5-coin compaction schedule runs, so the unrolled-CTE
    oracle replays it exactly. Composes with ``kll_sketch_merge_shards``' merge phase
    for sketch-per-day rollups: re-aging a day-sketch by one
    half-life is just doubling every survivor's level, which the
    power-of-two weight classes support natively. Scale: anchor date
    is a 1-row broadcast; day arithmetic is integer-exact on the
    midnight-aligned timestamps."""
    from .operators.sketch import kll_quantiles, kll_weighted_sketch

    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    weighted = (
        orders.crossJoin(F.broadcast(anchor))
        .withColumn(
            "age_steps",
            (
                F.datediff(F.col("maxd").cast("date"),
                           F.col("o_orderdate").cast("date"))
                .cast("long")
                / F.lit(365)
            ).cast("long"),
        )
        .withColumn(
            "decay_w",
            F.expr("shiftleft(1L, CAST(greatest(0, 7 - age_steps) AS INT))"),
        )
        .select("o_orderkey", "o_totalprice", "decay_w")
    )
    sk = kll_weighted_sketch(
        weighted, "o_totalprice", "o_orderkey", "decay_w", rounds=6
    )
    return kll_quantiles(sk, [0.25, 0.5, 0.75, 0.95])


#: Deterministic synthetic partsupp (TPC-H's fourth fact table, absent
#: from the driver schema — ROADMAP #4): 4 suppliers per part via a
#: modular stride over the supplier count, avail-qty/supply-cost from
#: md5 slices of the (part, replica) key. Same no-RNG generation
#: pattern as `synthetic_customers_generate`, so both engines derive
#: the identical relation and Q16/Q20 shapes become oracle-checkable.
PARTSUPP_CTE = """partsupp AS (
      SELECT p.p_partkey AS ps_partkey,
             CAST((p.p_partkey + i.i * 13) % s.cnt + 1 AS BIGINT) AS ps_suppkey,
             CAST(CAST('0x' || substr(md5('ps_' || CAST(p.p_partkey AS VARCHAR)
                  || '_' || CAST(i.i AS VARCHAR)), 1, 8) AS BIGINT) % 9999 + 1
                  AS INT) AS ps_availqty,
             round(CAST('0x' || substr(md5('ps_' || CAST(p.p_partkey AS VARCHAR)
                  || '_' || CAST(i.i AS VARCHAR)), 9, 8) AS BIGINT) % 100000
                  / 100.0, 2) AS ps_supplycost
      FROM part p
      CROSS JOIN (VALUES (0), (1), (2), (3)) i(i)
      CROSS JOIN (SELECT COUNT(*) AS cnt FROM supplier) s
    )"""


def synthetic_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :data:`PARTSUPP_CTE`: part × 4-row replica index ×
    1-row supplier count — both broadcast, so the expansion is a
    narrow map over the part scan (no shuffle). The modular stride 13
    is coprime with small supplier counts, so a part's 4 suppliers are
    always distinct."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    scnt = load_table(spark, sf_dir, "supplier").agg(F.count("*").alias("cnt"))
    idx = spark.range(4).select(F.col("id").alias("i"))
    h = F.md5(
        F.concat(
            F.lit("ps_"),
            F.col("p_partkey").cast("string"),
            F.lit("_"),
            F.col("i").cast("string"),
        )
    )
    return (
        part.crossJoin(F.broadcast(idx))
        .crossJoin(F.broadcast(scnt))
        .withColumn("h", h)
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * 13) % F.col("cnt") + 1)
            .cast("long")
            .alias("ps_suppkey"),
            (F.conv(F.substring("h", 1, 8), 16, 10).cast("long") % 9999 + 1)
            .cast("int")
            .alias("ps_availqty"),
            F.round(
                (F.conv(F.substring("h", 9, 8), 16, 10).cast("long") % 100000)
                / 100.0,
                2,
            ).alias("ps_supplycost"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "J2", "subquery", "correlated-exists"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking) — the last of the 22 TPC-H
    shapes: count one quarter's orders that have at least one LATE
    line, grouped by priority. The driver schema carries no
    commitdate/receiptdate, so "late" adapts to
    ``l_shipdate > o_orderdate + 90 days`` (same adaptation pattern
    as the synthetic-partsupp Q16/Q20) — which keeps Q4's defining
    feature intact: a correlated EXISTS whose inner predicate
    references the OUTER row (the ship-vs-order date comparison), not
    just the join key. Spark plans it as a left-semi join with the
    compound condition; Catalyst pushes the quarter filter below the
    semi-join probe. Scale: the semi-join shuffles only
    (orderkey, dates) pairs from the one-quarter slice."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)}
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "q15", "view-equivalence"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the view-equivalence shape — a
    revenue view computed once, its MAX computed over the SAME view,
    and the equality join between the two (ROADMAP #4). The decimal
    staging makes total_revenue a bit-identical double in both legs,
    so the double-equality predicate is exact, not flaky. Scale: the
    view aggregates supplier-keyed partials map-side; the 1-row MAX
    broadcasts back; supplier side broadcasts into the final join."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue0 = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
                4,
            )
        )
    )
    mx = revenue0.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue0.join(
            F.broadcast(mx), F.col("total_revenue") == F.col("mx")
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_supplier_counts",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "q16", "not-in"),
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier
    counts per (brand, type, size) with brand/type/size exclusions and
    a NOT IN supplier subquery (negative-balance suppliers standing in
    for the spec's complaint filter — the schema carries no s_comment).
    The NOT IN is a left-anti broadcast join: the excluded-supplier
    set is tiny, the anti join runs map-side, and the distinct count
    shuffles once on the group key."""
    ps = synthetic_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    excl = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(part),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .where(
            (F.col("p_brand") != "Brand#3")
            & ~F.col("p_type").like("MEDIUM%")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
        )
        .join(
            F.broadcast(excl),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "tpch_q20_excess_inventory",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        )
        AND ps_availqty > (
          SELECT 0.5 * SUM(l_quantity) FROM lineitem
          WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01'
        )
      )
    ORDER BY s_suppkey
    """,
    tags=("tpch", "q20", "correlated-subquery"),
)
def tpch_q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers in one nation
    holding more than half a year's shipped quantity of red parts —
    the doubly-nested IN + correlated-aggregate shape (ROADMAP #4).
    The correlated scalar subquery decorrelates into a (partkey,
    suppkey) quantity aggregate inner-joined to partsupp (the spec's
    NULL-on-no-rows comparison excludes the pair either way), so the
    plan is joins + one aggregate, no per-row subquery execution."""
    ps = synthetic_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red_parts = part.where(F.col("p_name").like("red%")).select("p_partkey")
    qty = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("half_qty_base"))
    )
    qualified = (
        ps.join(
            F.broadcast(red_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("half_qty_base"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            qualified, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "theta_sketch_set_ops",
    oracle="""
    WITH tok AS (
      SELECT doc_id % 2 AS shard, t
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents)
      WHERE t <> ''
    ), hs AS (
      SELECT DISTINCT shard,
             CAST('0x' || substr(md5(t), 1, 13) AS BIGINT) AS h
      FROM tok
    ), sa AS (SELECT h FROM hs WHERE shard = 0 ORDER BY h LIMIT 64),
       sb AS (SELECT h FROM hs WHERE shard = 1 ORDER BY h LIMIT 64),
       su AS (SELECT DISTINCT h
              FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
              ORDER BY h LIMIT 64),
       st AS (
         SELECT (SELECT count(*) FROM sa) AS na, (SELECT max(h) FROM sa) AS ma,
                (SELECT count(*) FROM sb) AS nb, (SELECT max(h) FROM sb) AS mb,
                (SELECT count(*) FROM su) AS nu, (SELECT max(h) FROM su) AS mu
       ), est AS (
         SELECT
           CASE WHEN na < 64 THEN CAST(na AS DOUBLE)
                ELSE round(63.0 * (4503599627370496.0 / ma), 4) END AS est_a,
           CASE WHEN nb < 64 THEN CAST(nb AS DOUBLE)
                ELSE round(63.0 * (4503599627370496.0 / mb), 4) END AS est_b,
           CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
                ELSE round(63.0 * (4503599627370496.0 / mu), 4) END AS est_union,
           CASE WHEN na < 64 THEN 4503599627370496 ELSE ma END AS ta,
           CASE WHEN nb < 64 THEN 4503599627370496 ELSE mb END AS tb
         FROM st
       ), inter AS (
         SELECT count(*) AS matched
         FROM sa JOIN sb USING (h), est
         WHERE h < least(est.ta, est.tb)
       )
    SELECT est_a, est_b, est_union,
           round(CAST(matched AS DOUBLE)
                 * (4503599627370496.0 / least(ta, tb)), 4) AS est_intersect,
           (SELECT count(DISTINCT t) FROM tok WHERE shard = 0) AS exact_a,
           (SELECT count(DISTINCT t) FROM tok WHERE shard = 1) AS exact_b,
           (SELECT count(DISTINCT t) FROM tok) AS exact_union,
           (SELECT count(*)
              FROM (SELECT DISTINCT t FROM tok WHERE shard = 0) x
              JOIN (SELECT DISTINCT t FROM tok WHERE shard = 1) y USING (t))
             AS exact_intersect
    FROM est, inter
    """,
    tags=("sketch", "theta", "distinct", "set-ops"),
)
def theta_sketch_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (KMV) sketch set algebra over the document token sets of
    two corpus shards (even/odd doc_id): per-shard distinct-count
    estimates, a merged-union estimate, and the intersection estimate
    HLL registers cannot provide — next to the exact counts, so the
    output shows the sketch accuracy directly. Hashing is the
    engine-portable 52-bit md5 prefix, retention is "k=64 smallest
    distinct hashes", and every estimator divides exact ≤2^52
    integers — the whole construction replays identically in SQL, so
    the oracle hash-matches exactly (the same contract as
    hll_registers / the KLL compaction schedule).

    Scale: sketch build = one distinct-shuffle of (hash) longs + a
    TakeOrderedAndProject top-k (per-partition k-heaps, no global
    sort); merges/intersections touch ≤k rows per side. The exact
    columns exist for accuracy display at test SFs — at 100 TB one
    ships only the k-row sketch states."""
    from .operators.sketch import (
        theta_intersection_estimate,
        theta_sketch,
        theta_stats,
        theta_union,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        (F.col("doc_id") % 2).alias("shard"),
        F.explode(F.split(F.col("text"), " ")).alias("t"),
    ).where(F.col("t") != "")
    ta, tb = tok.where(F.col("shard") == 0), tok.where(F.col("shard") == 1)
    sa, sb = theta_sketch(ta, "t"), theta_sketch(tb, "t")
    su = theta_union(sa, sb)
    est_a = theta_stats(sa).select(F.col("estimate").alias("est_a"))
    est_b = theta_stats(sb).select(F.col("estimate").alias("est_b"))
    est_u = theta_stats(su).select(F.col("estimate").alias("est_union"))
    est_i = theta_intersection_estimate(sa, sb).select(
        F.col("estimate").alias("est_intersect")
    )
    exact = (
        tok.agg(
            F.count_distinct(
                F.when(F.col("shard") == 0, F.col("t"))
            ).alias("exact_a"),
            F.count_distinct(
                F.when(F.col("shard") == 1, F.col("t"))
            ).alias("exact_b"),
            F.count_distinct("t").alias("exact_union"),
        )
    )
    exact_i = (
        ta.select("t").distinct()
        .join(tb.select("t").distinct(), "t")
        .agg(F.count("*").alias("exact_intersect"))
    )
    return (
        est_a.crossJoin(est_b).crossJoin(est_u).crossJoin(est_i)
        .crossJoin(exact).crossJoin(exact_i)
    )


def _hilbert_step_sql(i: int, s: int) -> str:
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    return f""", h{i} AS (
      SELECT l_partkey, l_suppkey,
             d + {s * s} * (CASE WHEN {rx} = 1
                                 THEN 3 - {ry} ELSE {ry} END) AS d,
             CASE WHEN {ry} = 0
                  THEN (CASE WHEN {rx} = 1 THEN 255 - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN {ry} = 0
                  THEN (CASE WHEN {rx} = 1 THEN 255 - x ELSE x END)
                  ELSE y END AS y
      FROM h{i - 1})"""


def _hilbert_oracle() -> str:
    steps = "".join(
        _hilbert_step_sql(i, 1 << (8 - i)) for i in range(1, 9)
    )
    return (
        """
    WITH stats AS (
      SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
      FROM lineitem
    ), h0 AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey - pmin) * 256 // (pmax - pmin + 1) AS x,
             (l_suppkey - smin) * 256 // (smax - smin + 1) AS y,
             CAST(0 AS BIGINT) AS d
      FROM lineitem CROSS JOIN stats
    )"""
        + steps
        + """
    SELECT CAST(d // 100 AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
           MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max
    FROM h8 GROUP BY 1
    """
    )


@query(
    "hilbert_layout_stats",
    oracle=_hilbert_oracle(),
    tags=("scale-technique", "hilbert", "clustering"),
)
def hilbert_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve multi-dimensional clustering — the
    locality-preserving upgrade of ``zorder_region_stats``: bucketize
    (l_partkey, l_suppkey) onto a 256×256 grid, walk the standard
    xy→d rotate-and-flip recurrence (8 unrolled integer CASE steps,
    one chained projection each), and report per-FILE row counts and
    both columns' min/max for 100-key files — a realistic
    non-power-of-two compaction target, where Hilbert's
    adjacent-keys-are-adjacent-cells property keeps every file's
    bounding box compact while Z-order's bit-interleave takes long
    diagonal jumps (measured on this grid: avg bbox area ~2.1× 
    tighter, max ~16× — the pytest twin asserts the comparison).
    All-integer algebra end to end, so the 8-step SQL CTE replays the
    identical walk and the oracle hash-matches exactly."""
    from .operators.relational import with_hilbert_key

    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_partkey").alias("_pmin"),
        F.max("l_partkey").alias("_pmax"),
        F.min("l_suppkey").alias("_smin"),
        F.max("l_suppkey").alias("_smax"),
    )
    keyed = li.select("l_partkey", "l_suppkey").crossJoin(F.broadcast(stats))
    h = with_hilbert_key(
        keyed,
        "l_partkey",
        "l_suppkey",
        F.col("_pmin"),
        F.col("_pmax"),
        F.col("_smin"),
        F.col("_smax"),
        bits=8,
        out_col="hkey",
    )
    return (
        h.groupBy(
            F.floor(F.col("hkey") / 100).cast("long").alias("file_id")
        ).agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
        )
    )


@query(
    "bitmap_distinct_customers",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS order_month,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY 1
    """,
    tags=("scale-technique", "bitmap", "distinct"),
)
def bitmap_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via Spark's built-in bitmap
    aggregates (3.5+: bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the
    JVM-native answer where sketches are approximate: per order
    month, customer ids bucket into 2^15-bit bitmaps, each shard
    builds its own bitmap state (bitmap_construct_agg), shards merge
    by OR (bitmap_or_agg — associative/commutative, the mergeable-
    state contract), and the count is the sum of per-bucket popcounts.
    The two-level plan here (per-shard construct → cross-shard OR)
    deliberately exercises the merge leg; the result must equal plain
    COUNT(DISTINCT), which is the oracle. Scale: the shuffle carries
    fixed-width 4 KB bitmap segments instead of raw keys — for dense
    integer key spaces this is both exact AND smaller than the
    exploded distinct shuffle; whole-stage-codegen'd end to end."""
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        (F.col("o_orderkey") % 2).alias("_shard"),
        F.expr("bitmap_bucket_number(o_custkey)").alias("_b"),
        F.expr("bitmap_bit_position(o_custkey)").alias("_p"),
    )
    shard_state = keyed.groupBy("order_month", "_shard", "_b").agg(
        F.expr("bitmap_construct_agg(_p)").alias("_bm")
    )
    merged = shard_state.groupBy("order_month", "_b").agg(
        F.expr("bitmap_or_agg(_bm)").alias("_bm")
    )
    return merged.groupBy("order_month").agg(
        F.sum(F.expr("bitmap_count(_bm)")).alias("n_customers")
    )


@query(
    "data_quality_audit_orders",
    oracle="""
    WITH checks AS (
      SELECT 'not_null_o_custkey' AS "check",
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations,
             COUNT(*) AS n_rows
      FROM orders
      UNION ALL
      SELECT 'in_set_o_orderstatus',
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                           OR o_orderstatus IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'range_o_totalprice',
             CAST(SUM(CASE WHEN o_totalprice NOT BETWEEN 0 AND 1000000
                           OR o_totalprice IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'matches_o_orderpriority',
             CAST(SUM(CASE WHEN NOT regexp_matches(o_orderpriority,
                                                   '^[1-5]-[A-Z ]+$')
                           OR o_orderpriority IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'unique_o_orderkey',
             CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey)
                   FROM orders) AS BIGINT),
             COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'references_o_custkey',
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey IS NOT NULL
                     AND NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
                  AS BIGINT),
             COUNT(*)
      FROM orders
    )
    SELECT "check", n_violations, n_rows,
           n_violations = 0 AS passed
    FROM checks
    """,
    tags=("data-quality", "expectations", "audit"),
)
def data_quality_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation battery over orders — the
    lakehouse constraint-audit operator class (Delta CHECK / DLT
    expectations / dbt tests): four row-level checks fold into ONE
    conditional-aggregation scan (null, accepted set, value range,
    regex format), plus primary-key uniqueness (one hash aggregate)
    and a referential check into customer (left-anti orphan count,
    broadcast when the dim is small). One row per check with
    violation counts — the report shape a pipeline gate consumes.
    Every count is an exact integer, hash-matched by the oracle.
    Scale: the row battery is one pass regardless of check count;
    uniqueness/FK add one aggregate/join each."""
    from .operators.quality import (
        expectations_report,
        in_range,
        in_set,
        matches,
        not_null,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return expectations_report(
        orders,
        expectations=[
            not_null("o_custkey"),
            in_set("o_orderstatus", ("O", "F", "P")),
            in_range("o_totalprice", 0, 1_000_000),
            matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
        ],
        unique_keys=["o_orderkey"],
        references=[("o_custkey", customer, "c_custkey")],
    )


@query(
    "recursive_cte_key_rollup",
    oracle="""
    WITH RECURSIVE walk(root, cur) AS (
      SELECT c_custkey, c_custkey FROM customer
      UNION ALL
      SELECT root, cur // 10 FROM walk WHERE cur >= 10
    ), anc AS (
      SELECT root AS c_custkey, cur AS root_digit FROM walk WHERE cur < 10
    )
    SELECT CAST(root_digit AS BIGINT) AS root_digit,
           COUNT(DISTINCT a.c_custkey) AS n_customers,
           CAST(SUM(CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM anc a JOIN orders o ON o.o_custkey = a.c_custkey
    GROUP BY root_digit
    """,
    tags=("S15-sql", "recursive-cte", "hierarchy"),
)
def recursive_cte_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE through the engine's SQL entry (Spark 4.1
    WITH RECURSIVE / UnionLoop — until now every iterative operator
    here drove the loop from Python with localCheckpoint): each
    customer key walks its digit-hierarchy parent chain (cur → cur
    DIV 10, a functional edge — exactly one parent per node, so the
    UNION ALL recursion Spark supports cannot duplicate paths) up to
    its single-digit root ancestor, then order revenue rolls up per
    root. The oracle runs the structurally identical recursion in
    DuckDB, so the whole recursive execution is hash-checked.
    Scale: frontier size stays N rows per level (no fan-out), depth =
    key digits (log₁₀ N levels); revenue sums in decimal — the
    addition-order-free money contract. The recursion guardrail
    ``spark.sql.cteRecursionRowLimit`` (default 1M accumulated rows)
    is raised runtime-side: N customers × log₁₀(maxkey) levels
    legitimately exceeds 1M once N passes ~125k — a linear walk, not
    runaway recursion (the level limit stays at its default 100)."""
    from .tables import register_views

    register_views(spark, sf_dir, ("customer", "orders"))
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(100_000_000))
    return spark.sql("""
        WITH RECURSIVE walk(root, cur) AS (
          SELECT c_custkey, c_custkey FROM customer
          UNION ALL
          SELECT root, cur DIV 10 FROM walk WHERE cur >= 10
        ), anc AS (
          SELECT root AS c_custkey, cur AS root_digit FROM walk
          WHERE cur < 10
        )
        SELECT CAST(root_digit AS BIGINT) AS root_digit,
               COUNT(DISTINCT a.c_custkey) AS n_customers,
               CAST(SUM(CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(18,2)))
                    AS DOUBLE) AS revenue
        FROM anc a JOIN orders o ON o.o_custkey = a.c_custkey
        GROUP BY root_digit
    """)


@query(
    "lateral_topn_customers_per_nation",
    oracle="""
    SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
    ORDER BY nation, c_acctbal DESC, c_custkey
    """,
    tags=("sql-surface", "lateral", "topn", "correlated"),
)
def lateral_topn_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery through the engine's SQL entry —
    the second modern-SQL surface probe next to the native recursive
    CTE (``recursive_cte_key_rollup``): top-3 customers by balance PER
    nation, expressed as a per-row dependent subquery with ORDER BY +
    LIMIT rather than a window rank. Spark's optimizer decorrelates
    the lateral into a ranked join (DomainJoin rewrite), so the
    physical plan is the same shuffle-once window/top-k shape the
    DataFrame twin ``window_top_orders_per_segment`` locks — the point
    is that the ENGINE does the decorrelation, not the query author.
    The identical SQL text runs on DuckDB, hash-checking Spark's
    rewrite end to end. Ties break by key; no arithmetic, so values
    hash exactly.
    """
    from .tables import register_views

    register_views(spark, sf_dir, ("nation", "customer"))
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_custkey, t.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
        ORDER BY nation, c_acctbal DESC, c_custkey
        """
    )


@query(
    "cusum_changepoint_orders",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total
      FROM daily
    ),
    running AS (
      SELECT d, x,
             CAST(sum(x) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
             CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
      FROM daily
    ),
    dev AS (
      SELECT r.d, r.x, r.s, r.t, tot.n, tot.total,
             r.s * tot.n - r.t * tot.total AS cusum_num
      FROM running r, tot
    )
    SELECT d AS changepoint_date, t AS day_index, n AS n_days,
           cusum_num,
           round(CAST(s AS DOUBLE) / t, 6) AS pre_mean,
           CASE WHEN n = t THEN NULL
                ELSE round(CAST(total - s AS DOUBLE) / (n - t), 6) END AS post_mean
    FROM dev
    ORDER BY abs(cusum_num) DESC, d
    LIMIT 1
    """,
    tags=("analytics", "changepoint", "cusum", "time-series"),
)
def cusum_changepoint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint estimation over the daily order-count
    series - the drift family's missing third leg (PSI and KS compare
    two snapshots; CUSUM locates WHEN the level shifted): the
    changepoint estimate is argmax_t |sum_{i<=t}(x_i - mean)|. The
    deviation sum is kept as the EXACT INTEGER numerator
    S_t*n - t*total (multiplying through by n avoids the division), so
    the entire statistic is integer arithmetic - hash-exact with zero
    float hazards; only the reported pre/post means divide at the end.
    Scale: daily aggregation is map-side combinable; the running sum
    is one window over the DAY series (thousands of rows, not the
    order table), and the argmax is TakeOrderedAndProject.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.count("*").alias("x"))
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("x").cast("long").alias("total")
    )
    w_run = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    running = daily.select(
        "d",
        "x",
        F.sum("x").over(w_run).cast("long").alias("s"),
        F.row_number().over(W.orderBy("d")).cast("long").alias("t"),
    )
    dev = running.crossJoin(F.broadcast(tot)).withColumn(
        "cusum_num", F.col("s") * F.col("n") - F.col("t") * F.col("total")
    )
    return (
        dev.select(
            F.col("d").alias("changepoint_date"),
            F.col("t").alias("day_index"),
            F.col("n").alias("n_days"),
            "cusum_num",
            F.round(F.col("s").cast("double") / F.col("t"), 6).alias("pre_mean"),
            F.when(
                F.col("n") == F.col("t"), F.lit(None).cast("double")
            )
            .otherwise(
                F.round(
                    (F.col("total") - F.col("s")).cast("double")
                    / (F.col("n") - F.col("t")),
                    6,
                )
            )
            .alias("post_mean"),
        )
        .orderBy(F.abs(F.col("cusum_num")).desc(), "changepoint_date")
        .limit(1)
    )


@query(
    "burst_detect_hourly_events",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    winstats AS (
      SELECT h, x,
             CAST(count(*) OVER w AS BIGINT) AS n_w,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx
      FROM hourly
      WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT h, x, n_w, sx, sxx,
             (n_w * x - sx) * (n_w * x - sx) AS z2_num,
             n_w * sxx - sx * sx AS z2_den
      FROM winstats WHERE n_w >= 12
    )
    SELECT h AS hour_ts, x AS n_events, n_w, sx AS window_sum,
           z2_num, z2_den,
           round(sqrt(CAST(z2_num AS DOUBLE) / z2_den), 6) AS zscore
    FROM scored
    WHERE z2_den > 0 AND n_w * x > sx AND z2_num > 4 * z2_den
    ORDER BY hour_ts
    LIMIT 500
    """,
    tags=("analytics", "anomaly", "burst", "time-series"),
)
def burst_detect_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score burst detection over hourly event volume - the
    alerting companion to ``cusum_changepoint_orders`` (CUSUM locates
    a persistent level shift; this flags transient spikes): an hour is
    a burst when its count sits more than 2 sigma ABOVE the mean of
    the trailing 24 closed hours. The z^2 test is cross-multiplied
    into pure INTEGER arithmetic - (n*x - sum)^2 > 4*(n*sumsq - sum^2)
    - so detection is hash-exact with no float in the decision path;
    the reported z-score divides/sqrts only for display. Scale: hourly
    pre-aggregation is map-side combinable and shrinks the window
    input to one row per hour; the trailing frame is bounded ROWS (a
    linear running scan, not the quadratic re-scan shape).
    """
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").alias("x"))
    )
    w = W.orderBy("h").rowsBetween(-24, -1)
    stats = hourly.select(
        "h",
        "x",
        F.count("*").over(w).cast("long").alias("n_w"),
        F.sum("x").over(w).cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("long").alias("sxx"),
    ).where(F.col("n_w") >= 12)
    scored = stats.withColumns(
        {
            "z2_num": (F.col("n_w") * F.col("x") - F.col("sx"))
            * (F.col("n_w") * F.col("x") - F.col("sx")),
            "z2_den": F.col("n_w") * F.col("sxx") - F.col("sx") * F.col("sx"),
        }
    )
    return (
        scored.where(
            (F.col("z2_den") > 0)
            & (F.col("n_w") * F.col("x") > F.col("sx"))
            & (F.col("z2_num") > 4 * F.col("z2_den"))
        )
        .select(
            F.col("h").alias("hour_ts"),
            F.col("x").alias("n_events"),
            "n_w",
            F.col("sx").alias("window_sum"),
            "z2_num",
            "z2_den",
            F.round(
                F.sqrt(F.col("z2_num").cast("double") / F.col("z2_den")), 6
            ).alias("zscore"),
        )
        .orderBy("hour_ts")
        .limit(500)
    )


@query(
    "event_pattern_regex_cep",
    oracle="""
    WITH ranked AS (
      SELECT user_id, substr(event_type, 1, 1) AS ch,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), journeys AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             string_agg(ch, '' ORDER BY rn) AS j
      FROM ranked WHERE rn <= 500
      GROUP BY user_id
    ), matched AS (
      SELECT user_id, n_events, j,
             CAST(len(regexp_extract_all(j, 'v+c+p')) AS BIGINT)
               AS n_funnel_matches,
             regexp_extract(j, 'v+c+p') AS first_match
      FROM journeys
    )
    SELECT user_id, n_events, n_funnel_matches,
           CAST(CASE WHEN first_match = '' THEN 0
                     ELSE strpos(j, first_match) END AS BIGINT)
             AS first_match_pos,
           CAST(regexp_matches(j, 'e[^p]*p') AS BOOLEAN)
             AS error_shadowed_purchase
    FROM matched
    ORDER BY user_id
    """,
    tags=("cep", "pattern-matching", "events", "funnel"),
)
def event_pattern_regex_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing by regex — MATCH_RECOGNIZE semantics
    without the clause: each user's event stream becomes a journey
    string (one char per event, ts-ordered, capped at 500 events so
    per-user state is bounded), and sequence patterns compile to
    regular expressions evaluated ONCE per user by the JVM regex
    engine: the strict funnel ``v+c+p`` (views, then clicks, then
    purchase, nothing in between) with non-overlapping match count
    and first-match position (after-match-skip-past semantics — the
    standard CEP contract), plus an ``e[^p]*p`` detector (purchase
    shadowed by an earlier unresolved error). The pattern alphabet
    works because event types have distinct initials; a general
    deployment maps types to chars first. Both engines run
    leftmost-greedy matching and the patterns contain no alternation,
    so Java regex and RE2 agree exactly (first-match position is
    recovered as strpos of the extracted match — any earlier
    occurrence of that substring would itself be an earlier match).
    Scale: one shuffle to (user) for the ordered aggregation; regex
    state is per-row (journey), never cross-row — embarrassingly
    parallel over users, the same shape sessionization already runs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    journeys = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "ch"))
            ).alias("s")
        )
        .select(
            "user_id",
            F.least(F.size("s"), F.lit(500)).cast("long").alias("n_events"),
            F.concat_ws(
                "",
                F.transform(F.slice("s", 1, 500), lambda x: x["ch"]),
            ).alias("j"),
        )
    )
    first_match = F.regexp_extract(F.col("j"), "v+c+p", 0)
    return (
        journeys.select(
            "user_id",
            "n_events",
            F.size(F.regexp_extract_all(F.col("j"), F.lit("v+c+p"), F.lit(0)))
            .cast("long")
            .alias("n_funnel_matches"),
            F.when(first_match == "", F.lit(0))
            .otherwise(F.instr(F.col("j"), first_match))
            .cast("long")
            .alias("first_match_pos"),
            F.col("j").rlike("e[^p]*p").alias("error_shadowed_purchase"),
        )
        .orderBy("user_id")
    )


@query(
    "kaplan_meier_retention",
    oracle="""
    WITH lifetimes AS (
      SELECT o_custkey,
             CAST(floor(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                        / 30.0) AS BIGINT) AS dur_m,
             CAST(MAX(o_orderdate) >= TIMESTAMP '2001-02-01' AS INT)
               AS censored
      FROM orders GROUP BY o_custkey
    ), by_t AS (
      SELECT dur_m,
             CAST(SUM(1 - censored) AS BIGINT) AS d_churn,
             CAST(SUM(censored) AS BIGINT) AS c_censored
      FROM lifetimes GROUP BY dur_m
    ), risk AS (
      SELECT dur_m, d_churn, c_censored,
             CAST(SUM(d_churn + c_censored) OVER (
                    ORDER BY dur_m DESC) AS BIGINT) AS n_risk
      FROM by_t
    ), terms AS (
      SELECT dur_m, d_churn, c_censored, n_risk,
             round(ln(greatest(1.0 - CAST(d_churn AS DOUBLE) / n_risk,
                               1e-12)), 9) AS logterm
      FROM risk
    )
    SELECT dur_m, n_risk, d_churn, c_censored,
           round(exp(CAST(SUM(CAST(logterm AS DECIMAL(28,9)))
                          OVER (ORDER BY dur_m) AS DOUBLE)), 6) AS survival
    FROM terms
    ORDER BY dur_m
    """,
    tags=("survival-analysis", "kaplan-meier", "retention", "cohort"),
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival of customer lifetimes —
    the censoring-aware answer to 'how long do customers stay' that a
    naive churn-rate average gets wrong: customers still active at
    the dataset edge (last order inside the final six months) are
    CENSORED, contributing to the at-risk denominator for as long as
    observed but never counted as churn. Lifetime = months between
    first and last order; at each month the hazard is d/n over the
    shrinking risk set (a descending cumulative window — no per-time
    subquery), and the survival curve multiplies (1 - d/n) in time
    order. Cross-engine exactness of a running PRODUCT: each factor's
    ln is rounded to the 1e-9 grid (coarse enough that both engines'
    libm agree, fine enough to be exact to 6 output decimals), the
    logs sum as exact decimals in an ordered window (order-free), and
    one exp at the end — the multiplicative twin of the engine's
    round->decimal->sum->double idiom.
    Scale: two hash aggregates (customer, then month) and two windows
    over a month-cardinality frame; nothing driver-side."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    lifetimes = orders.groupBy("o_custkey").agg(
        F.floor(
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) / 30.0
        )
        .cast("long")
        .alias("dur_m"),
        (F.max("o_orderdate") >= F.lit("2001-02-01").cast("timestamp"))
        .cast("int")
        .alias("censored"),
    )
    by_t = lifetimes.groupBy("dur_m").agg(
        F.sum(1 - F.col("censored")).alias("d_churn"),
        F.sum("censored").alias("c_censored"),
    )
    risk = by_t.withColumn(
        "n_risk",
        F.sum(F.col("d_churn") + F.col("c_censored"))
        .over(
            Window.orderBy(F.desc("dur_m")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    logterm = F.round(
        F.log(
            F.greatest(
                F.lit(1.0) - F.col("d_churn").cast("double") / F.col("n_risk"),
                F.lit(1e-12),
            )
        ),
        9,
    )
    return (
        risk.withColumn("logterm", logterm)
        .withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(F.col("logterm").cast("decimal(28,9)"))
                    .over(
                        Window.orderBy("dur_m").rowsBetween(
                            Window.unboundedPreceding, 0
                        )
                    )
                    .cast("double")
                ),
                6,
            ),
        )
        .select("dur_m", "n_risk", "d_churn", "c_censored", "survival")
        .orderBy("dur_m")
    )


def _markov_attr_oracle(iters: int = 12) -> str:
    """Unrolled integer value-iteration CTE program for the Markov
    removal-effect oracle (the `_logreg_oracle` idiom: the oracle runs
    the SAME fixed-horizon protocol, generated iteration by
    iteration)."""
    head = """
    WITH ranked AS (
      SELECT user_id, substr(event_type, 1, 1) AS ch,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), firstp AS (
      SELECT user_id, MIN(CASE WHEN ch = 'p' THEN rn END) AS prn,
             MAX(rn) AS maxrn
      FROM ranked GROUP BY user_id
    ), kept AS (
      SELECT r.user_id, r.rn, r.ch, f.prn
      FROM ranked r JOIN firstp f ON r.user_id = f.user_id
      WHERE r.rn <= COALESCE(f.prn, f.maxrn)
    ), steps AS (
      SELECT user_id, rn,
             COALESCE(LAG(ch) OVER (PARTITION BY user_id ORDER BY rn), 'S')
               AS src,
             CASE WHEN ch = 'p' THEN 'P' ELSE ch END AS dst
      FROM kept
    ), terminal AS (
      SELECT k.user_id, MAX(k.ch) FILTER (WHERE k.rn = m.mx) AS src, 'N' AS dst
      FROM kept k JOIN (SELECT user_id, MAX(rn) AS mx FROM kept GROUP BY user_id) m
        ON k.user_id = m.user_id
      WHERE m.user_id IN (SELECT user_id FROM firstp WHERE prn IS NULL)
      GROUP BY k.user_id
    ), edges AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT src, dst FROM steps
        UNION ALL
        SELECT src, dst FROM terminal
      ) GROUP BY src, dst
    ), chains0 AS (
      SELECT v.rm, e.src,
             CASE WHEN e.dst = v.rm THEN 'N' ELSE e.dst END AS dst,
             e.cnt
      FROM edges e
      CROSS JOIN (SELECT unnest(ARRAY['-','v','c','s','e']) AS rm) v
      WHERE e.src <> v.rm
    ), chains AS (
      SELECT rm, src, dst, CAST(SUM(cnt) AS BIGINT) AS cnt,
             CAST(SUM(SUM(cnt)) OVER (PARTITION BY rm, src) AS BIGINT) AS outc
      FROM chains0 GROUP BY rm, src, dst
    ), w0 AS (
      SELECT DISTINCT rm, src AS state, CAST(0 AS BIGINT) AS w FROM chains
    )"""
    its = []
    for i in range(1, iters + 1):
        its.append(f""", w{i} AS (
      SELECT c.rm, c.src AS state,
             CAST(SUM(c.cnt * CASE WHEN c.dst = 'P' THEN 1000000
                                   WHEN c.dst = 'N' THEN 0
                                   ELSE COALESCE(p.w, 0) END)
                  // MAX(c.outc) AS BIGINT) AS w
      FROM chains c LEFT JOIN w{i - 1} p
        ON p.rm = c.rm AND p.state = c.dst
      GROUP BY c.rm, c.src
    )""")
    tail = f"""
    SELECT t.rm AS channel,
           b.w AS base_conv_micro,
           t.w AS removed_conv_micro,
           round((b.w - t.w) / CAST(b.w AS DOUBLE), 6) AS removal_effect
    FROM w{iters} t
    JOIN (SELECT w FROM w{iters} WHERE rm = '-' AND state = 'S') b ON TRUE
    WHERE t.rm <> '-' AND t.state = 'S'
    ORDER BY channel
    """
    return head + "".join(its) + tail


@query(
    "markov_attribution_removal",
    oracle=_markov_attr_oracle(12),
    tags=("attribution", "markov-chain", "events", "marketing"),
)
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution — the data-driven
    alternative to last-touch: model each user's pre-purchase journey
    as a first-order chain over channels (view/click/signup/error,
    with Start, and absorbing Purchase/Null states), then credit each
    channel by how much the chain's conversion probability DROPS when
    that channel is removed (its transitions redirected to Null) —
    Shapley-flavored credit from pure transition counts. Absorption
    probabilities come from a fixed 12-step value iteration run
    ENTIRELY IN INTEGER MICRO-UNITS: w'(x) = (Σ cnt_xj·w(j)) DIV
    out(x) with Purchase pinned at 1e6 — integer sums are
    addition-order-free and integer division is exact, so all five
    chains (base + four removals, evaluated together as one keyed
    frame) are bit-identical across engines with no float anywhere
    until the final removal-effect ratio. The 12-step horizon is part
    of the protocol (both engines truncate identically; longer paths
    contribute geometrically little).
    Scale: transition counting is the only data-sized stage (one
    user-keyed window + one count shuffle — the sessionization
    shape); the value iteration runs on a ~150-row chains frame, 12
    tiny self-joins that never touch the fact table again."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).select("user_id", "rn", "ch")
    firstp = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("ch") == "p", F.col("rn"))).alias("prn"),
        F.max("rn").alias("maxrn"),
    )
    kept = ranked.join(firstp, "user_id").where(
        F.col("rn") <= F.coalesce("prn", "maxrn")
    )
    steps = kept.select(
        F.coalesce(
            F.lag("ch").over(Window.partitionBy("user_id").orderBy("rn")),
            F.lit("S"),
        ).alias("src"),
        F.when(F.col("ch") == "p", F.lit("P")).otherwise(F.col("ch")).alias("dst"),
    )
    last_no_p = (
        kept.where(F.col("prn").isNull())
        .groupBy("user_id")
        .agg(F.max_by("ch", "rn").alias("src"))
        .select("src", F.lit("N").alias("dst"))
    )
    edges = (
        steps.unionByName(last_no_p)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    chans = spark.createDataFrame(
        [("-",), ("v",), ("c",), ("s",), ("e",)], "rm string"
    )
    chains = (
        edges.crossJoin(F.broadcast(chans))
        .where(F.col("src") != F.col("rm"))
        .select(
            "rm",
            "src",
            F.when(F.col("dst") == F.col("rm"), F.lit("N"))
            .otherwise(F.col("dst"))
            .alias("dst"),
            "cnt",
        )
        .groupBy("rm", "src", "dst")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn(
            "outc",
            F.sum("cnt").over(Window.partitionBy("rm", "src")),
        )
    )
    # r15 (the Gopher-fold pattern, guide §1.2/§2.4): the value
    # iteration used to run as 12 chain⋈w shuffle joins + aggregates —
    # ~24 tiny stages of pure scheduling latency over a ~150-row frame.
    # The chain alphabet is BOUNDED (≤7 states regardless of corpus
    # size), so each rm's edge list collapses into one array row and
    # the 12 steps run as row-local integer folds: per state,
    # w'(src) = Σ cnt·val(dst) DIV outc with val(dst) = 1e6 for P, 0
    # for N, else coalesce(w[dst], 0) — term-for-term the old join's
    # arithmetic (integer sums are order-free, DIV exact), so the
    # trajectory is bit-identical (verified: collected rows equal, and
    # the oracle hash is unchanged). The per-iteration lazy checkpoints
    # keep the map column materialized once per step instead of letting
    # CollapseProject inline step k-1's fold into step k's lambda.
    # Only the transition COUNT ever touches the fact table — that
    # stage is unchanged.
    per = chains.groupBy("rm").agg(
        F.collect_list(F.struct("src", "dst", "cnt")).alias("E"),
        F.collect_set(F.struct("src", "outc")).alias("S"),
    )
    cur = per.withColumn("w", F.expr("map()").cast("map<string,bigint>"))
    step = """
      map_from_entries(transform(S, s -> struct(s.src,
        CAST(aggregate(filter(E, e -> e.src = s.src), 0L,
          (acc, e) -> acc + e.cnt * CASE WHEN e.dst = 'P' THEN 1000000L
                                         WHEN e.dst = 'N' THEN 0L
                                         ELSE coalesce(w[e.dst], 0L) END)
          DIV s.outc AS BIGINT))))
    """
    for _ in range(12):
        cur = cur.withColumn("w", F.expr(step)).localCheckpoint(eager=False)
    w = cur.select("rm", F.expr("coalesce(w['S'], 0L)").alias("w"))
    base = w.where(F.col("rm") == "-").select(F.col("w").alias("base_w"))
    return (
        w.where(F.col("rm") != "-")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("rm").alias("channel"),
            F.col("base_w").alias("base_conv_micro"),
            F.col("w").alias("removed_conv_micro"),
            F.round(
                (F.col("base_w") - F.col("w")) / F.col("base_w").cast("double"),
                6,
            ).alias("removal_effect"),
        )
        .orderBy("channel")
    )


#: cumulative Poisson(1) thresholds: a uniform u maps to weight =
#: number of thresholds below u (0..9).
_POIS1_CUM = (
    0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988747974019,
    0.9999998885745217,
)

#: the same thresholds on the 32-bit INTEGER grid (shared literals in
#: both engines): the md5 word h ~ U{0..2^32-1} replaces the uniform
#: directly — ``h > round(t * 2^32)`` is one long compare per
#: threshold, no division and no double comparison in the 200×-row
#: hot loop (r12: the double path was ~35% of the replica-expansion
#: stage's CPU).
_POIS1_THRESH = tuple(int(round(t * 4294967296)) for t in _POIS1_CUM)

#: the identical thresholds as 8-char lowercase hex: for equal-width
#: lowercase hex, byte-lexicographic string order IS numeric order, so
#: the Spark side compares the md5 hex window directly against these
#: and skips 200 string→long ``conv`` parses per row (~12% of the
#: replica stage at sf1); the SQL oracle keeps the numeric compare —
#: provably the same predicate, and a nice cross-engine spelling check.
_POIS1_THRESH_HEX = tuple(format(t, "08x") for t in _POIS1_THRESH)


@query(
    "poisson_bootstrap_ci",
    oracle=f"""
    WITH oc AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), reps AS (
      SELECT o.o_orderkey, o.cents, b.b,
             CAST('0x' || substr(md5('boot:' || CAST((b.b - 1) // 4 AS VARCHAR)
                                      || ':' || CAST(o.o_orderkey AS VARCHAR)),
                                 1 + 8 * CAST((b.b - 1) % 4 AS INT), 8)
                  AS BIGINT) AS h
      FROM oc o
      CROSS JOIN (SELECT unnest(range(1, 201)) AS b) b
    ), weighted AS (
      SELECT b, cents,
             {" + ".join(f"CAST(h > {t} AS INT)" for t in _POIS1_THRESH)} AS w
      FROM reps
    ), means AS (
      SELECT b, CAST(SUM(w * cents) AS DOUBLE) / (100.0 * SUM(w)) AS m
      FROM weighted GROUP BY b
    ), ranked AS (
      SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rk FROM means
    ), pt AS (
      SELECT CAST(SUM(cents) AS DOUBLE) / (100.0 * COUNT(*)) AS point_mean
      FROM oc
    )
    SELECT round(pt.point_mean, 6) AS point_mean,
           round(lo.m, 6) AS ci_lo, round(hi.m, 6) AS ci_hi,
           CAST(200 AS BIGINT) AS n_replicas
    FROM pt
    CROSS JOIN (SELECT m FROM ranked WHERE rk = 5) lo
    CROSS JOIN (SELECT m FROM ranked WHERE rk = 196) hi
    """,
    tags=("statistics", "bootstrap", "confidence-interval", "sampling"),
)
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap — THE way to bootstrap on a cluster: instead
    of 200 resampling passes, each row draws an independent
    Poisson(1) replication weight per replica (the n→∞ limit of
    multinomial resampling), so ALL 200 bootstrap replicas of the
    mean order value compute in ONE pass over the data as a weighted
    aggregate, and the 2.5/97.5 percentile of replica means gives the
    CI. Every draw is an md5-coin uniform mapped through the
    Poisson(1) inverse CDF as 10 literal threshold comparisons
    (integer weights — the replica sums stay on the decimal grid and
    are addition-order-free), replica means are one division each,
    and the CI bounds are order statistics with a replica-id
    tiebreak: bit-identical across engines.
    Scale: the x200 row expansion never materializes — it feeds a
    map-side-combinable aggregate straight to 200 groups; data is
    read once no matter how many replicas (B is a CPU knob, not an
    I/O knob). The CPU knob itself is amortized 4× (r12): one md5
    yields 128 bits = FOUR 32-bit uniforms, so replica ``b`` draws
    from hex window ``(b-1) mod 4`` of ``md5('boot:' || (b-1)//4 ||
    ':' || key)`` — 50 md5 calls per row instead of 200, the same
    multi-draw-per-hash trick as the MinHash signature fold — and the
    threshold compares run on the hex WINDOW directly (equal-width
    lowercase hex: lexicographic order == numeric order), skipping
    200 string→long parses per row. The sf10 probe read 216 s before
    the r12 rewrites (3.0e9 md5s + decimal/double per-draw math, pure
    linear CPU at fixed cores); 46.7 s after."""
    from data_seedling_spark.operators.dedup import scale_out

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # The ×200 replica fan-out multiplies per-row CPU (md5 + inverse
    # CDF), so parallelism must not stay chained to the input split
    # count — a one-file sf0.1 scan would run the whole 30M-row
    # expansion on a single core (measured 52 s → ~2 s at 32-way).
    # Two-level explode so the md5 computes ONCE per hash group k and
    # its four 32-bit windows feed replicas 4k+1..4k+4; all hot-loop
    # arithmetic is INTEGER (cent-grid sums, long threshold compares)
    # — the r12 probe measured the decimal(18,2) multiply + double
    # uniform of the old spelling at ~2/3 of the whole query's sf10
    # wall (216 s → 62 s after this rewrite).
    reps = (
        scale_out(orders)
        .withColumn("_k", F.explode(F.sequence(F.lit(0), F.lit(49))))
        .withColumn(
            "_h",
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("_k").cast("string"),
                    F.lit(":"),
                    F.col("o_orderkey").cast("string"),
                )
            ),
        )
        .withColumn("_s", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .withColumn("b", F.col("_k") * 4 + F.col("_s") + 1)
        .withColumn("hx", F.expr("substring(_h, 1 + 8 * _s, 8)"))
    )
    w = sum(
        (F.col("hx") > F.lit(t)).cast("int") for t in _POIS1_THRESH_HEX
    )
    means = (
        reps.withColumn("w", w)
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("cents")).cast("double")
                / (F.lit(100.0) * F.sum("w"))
            ).alias("m")
        )
    )
    from pyspark.sql.window import Window

    ranked = means.withColumn(
        "rk", F.row_number().over(Window.orderBy("m", "b"))
    )
    pt = orders.agg(
        (
            F.sum("cents").cast("double") / (F.lit(100.0) * F.count("*"))
        ).alias("point_mean")
    )
    lo = ranked.where(F.col("rk") == 5).select(F.col("m").alias("ci_lo"))
    hi = ranked.where(F.col("rk") == 196).select(F.col("m").alias("ci_hi"))
    return (
        pt.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.round("point_mean", 6).alias("point_mean"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
            F.lit(200).cast("long").alias("n_replicas"),
        )
    )


@query(
    "conformal_prediction_interval",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_quantity AS x,
             CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)) AS y,
             CAST('0x' || substr(md5('conf:' || CAST(l_orderkey AS VARCHAR)
                                      || ':' || CAST(l_linenumber AS VARCHAR)),
                                 1, 8) AS BIGINT) % 100 AS h
      FROM lineitem
    ), marked AS (
      SELECT *, CASE WHEN h < 60 THEN 'train'
                     WHEN h < 80 THEN 'cal' ELSE 'test' END AS split
      FROM base
    ), fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM marked WHERE split = 'train'
    ), coef AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
      FROM fit
    ), cal AS (
      SELECT abs(CAST(m.y AS DOUBLE) - (c.a + c.b * m.x)) AS r,
             m.l_orderkey, m.l_linenumber
      FROM marked m CROSS JOIN coef c WHERE m.split = 'cal'
    ), calq AS (
      SELECT r AS q FROM (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r, l_orderkey, l_linenumber)
                 AS rk,
               COUNT(*) OVER () AS n
        FROM cal
      ) WHERE rk = CAST(ceil(0.9 * (n + 1)) AS BIGINT)
    ), test AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN abs(CAST(m.y AS DOUBLE) - (c.a + c.b * m.x))
                                <= q.q THEN 1 ELSE 0 END) AS BIGINT)
               AS n_covered
      FROM marked m CROSS JOIN coef c CROSS JOIN calq q
      WHERE m.split = 'test'
    )
    SELECT round(c.a, 6) AS intercept, round(c.b, 6) AS slope,
           round(q.q, 6) AS q_hat, t.n_test, t.n_covered,
           round(CAST(t.n_covered AS DOUBLE) / t.n_test, 6) AS coverage
    FROM coef c CROSS JOIN calq q CROSS JOIN test t
    """,
    tags=("statistics", "conformal", "model-eval", "uncertainty"),
)
def conformal_prediction_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction — distribution-free uncertainty for
    ANY point model, the modern companion to the engine's calibration
    queries: a leak-proof md5 split (60/20/20) fits OLS price~quantity
    on train (exact decimal normal-equation sums — x integer, y on
    the 2-decimal grid), takes q̂ = the ⌈0.9(n+1)⌉-th order statistic
    of calibration |residuals| (the finite-sample-valid conformal
    quantile, computed as a ranked window with a deterministic key
    tiebreak, not an interpolated percentile), and audits empirical
    test coverage of ŷ ± q̂ — which conformal theory guarantees
    ≥ 90% in expectation REGARDLESS of the model being right.
    Residuals are IEEE functions of identical exact inputs, so both
    engines rank and count them bit-identically.
    Scale: two aggregate scans (fit, coverage) and one
    sort-of-calibration-split for the order statistic — the split
    keeps the sorted set to 20% of rows, and the coefficients/quantile
    travel as a broadcast scalar, never a shuffle key."""
    from data_seedling_spark.operators.dedup import scale_out

    # Four branches (fit / calibration / bucket counts / test) each
    # rescan and re-hash the fact table; widen the scan so per-branch
    # md5 work is not bound to the file split count.
    li = scale_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
    )
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("conf:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    marked = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("x"),
        F.round("l_extendedprice", 2).cast("decimal(18,2)").alias("y"),
        F.when(h < 60, "train").when(h < 80, "cal").otherwise("test").alias(
            "split"
        ),
    )
    fit = marked.where(F.col("split") == "train").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,2)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    b_expr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    # persist the 1-row coefficient frame (r15): each of its three
    # broadcast builds (cal, test, final select) otherwise re-runs the
    # whole fit aggregate INCLUDING the scan+md5 split hash (~1.1 s
    # per build at sf0.1). This is not r14's rejected experiment —
    # that persisted the fact-sized `marked` frame and lost to cache
    # IO; a 1-row cache has no such cost.
    coef = fit.select(
        b_expr.alias("b"),
        ((F.col("sy") - b_expr * F.col("sx")) / F.col("n")).alias("a"),
    ).persist()
    from pyspark.sql.window import Window

    cal = (
        marked.where(F.col("split") == "cal")
        .crossJoin(F.broadcast(coef))
        .select(
            F.abs(
                F.col("y").cast("double") - (F.col("a") + F.col("b") * F.col("x"))
            ).alias("r"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    # k-th-smallest residual WITHOUT a global sort: range-bucket the
    # residuals (dollar floor — cardinality bounded by the price range,
    # not by N), find the bucket holding rank k from the tiny cumulative
    # bucket frame, then row_number only inside that one bucket. Ties of
    # r land in the same bucket, so the (r, okey, lnum) tiebreak inside
    # it reproduces the global order statistic exactly.
    # persist the calibration split once (r15): kf, the bucket counts
    # and the in-bucket rank each re-ran cal's scan+md5+residual
    # otherwise. 20% of rows, 4 narrow columns — not the fact-sized
    # frame r14's A/B rejected. kf counts bucketed (rows 1:1 with cal,
    # bkt is a pure projection) so it shares the same cache.
    bucketed = cal.withColumn("bkt", F.floor("r").cast("long")).persist()
    kf = bucketed.agg(
        F.ceil(0.9 * (F.count("*") + 1)).cast("long").alias("k")
    )
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    cumf = (
        bucketed.groupBy("bkt")
        .agg(F.count("*").alias("cnt"))
        .select(
            "bkt",
            F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("below"),
            "cnt",
        )
    )
    tgt = (
        cumf.crossJoin(F.broadcast(kf))
        .where(
            (F.col("below") < F.col("k"))
            & (F.col("k") <= F.col("below") + F.col("cnt"))
        )
        .select("bkt", "below", "k")
    )
    wq = Window.partitionBy("bkt").orderBy("r", "l_orderkey", "l_linenumber")
    calq = (
        bucketed.join(F.broadcast(tgt), "bkt")
        .withColumn("rk", F.row_number().over(wq))
        .where(F.col("rk") == F.col("k") - F.col("below"))
        .select(F.col("r").alias("q"))
    )
    test = (
        marked.where(F.col("split") == "test")
        .crossJoin(F.broadcast(coef))
        .crossJoin(F.broadcast(calq))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                (
                    F.abs(
                        F.col("y").cast("double")
                        - (F.col("a") + F.col("b") * F.col("x"))
                    )
                    <= F.col("q")
                ).cast("long")
            ).alias("n_covered"),
        )
    )
    return (
        coef.crossJoin(F.broadcast(calq))
        .crossJoin(F.broadcast(test))
        .select(
            F.round("a", 6).alias("intercept"),
            F.round("b", 6).alias("slope"),
            F.round("q", 6).alias("q_hat"),
            "n_test",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )


@query(
    "cuped_variance_reduction",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST('0x' || substr(md5('arm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8) AS BIGINT) % 2 AS arm,
             CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                           THEN CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
                           ELSE CAST(0.00 AS DECIMAL(18,2)) END)
                  AS DOUBLE) AS pre,
             CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                           THEN CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
                           ELSE CAST(0.00 AS DECIMAL(18,2)) END)
                  AS DOUBLE) AS post
      FROM orders GROUP BY o_custkey
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(pre, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(ROUND(post, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(ROUND(pre * pre, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS spp,
             CAST(SUM(CAST(ROUND(post * post, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS sqq,
             CAST(SUM(CAST(ROUND(pre * post, 4) AS DECIMAL(38,4))) AS DOUBLE)
               AS spq
      FROM per
    ), arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
             CAST(SUM(CAST(ROUND(pre, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(ROUND(post, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sq
      FROM per GROUP BY arm
    ), theta AS (
      SELECT (n * spq - sp * sq) / (n * spp - sp * sp) AS th,
             sp / n AS mu_pre,
             ((n * spq - sp * sq) * (n * spq - sp * sq))
               / ((n * spp - sp * sp) * (n * sqq - sq * sq)) AS rho2
      FROM sums
    ), adj AS (
      SELECT a.arm, a.n_arm,
             a.sq / a.n_arm AS mean_post,
             (a.sq / a.n_arm) - t.th * ((a.sp / a.n_arm) - t.mu_pre)
               AS mean_cuped
      FROM arms a CROSS JOIN theta t
    )
    SELECT b.n_arm AS n_treat, a.n_arm AS n_control,
           round(b.mean_post - a.mean_post, 6) AS diff_raw,
           round(b.mean_cuped - a.mean_cuped, 6) AS diff_cuped,
           round(t.th, 6) AS theta,
           round(t.rho2, 6) AS var_reduction
    FROM adj a JOIN adj b ON a.arm = 0 AND b.arm = 1
    CROSS JOIN theta t
    """,
    tags=("statistics", "ab-test", "cuped", "variance-reduction"),
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled pre-experiment data) — the industry-standard
    A/B variance-reduction: adjust each customer's experiment-period
    revenue by θ × their pre-period revenue (θ = cov/var from pooled
    data), shrinking metric variance by ρ² with zero bias. Everything
    reduces to SEVEN exact sums (per-customer pre/post land on the
    2-decimal grid, their squares/products on the 4-decimal grid —
    no float-sum order anywhere), so arm means, θ, the adjusted
    difference and the ρ² variance-reduction factor are closed-form
    IEEE expressions of identical operands in both engines. The
    md5-coin arm split is the same leak-proof hash idiom as the
    engine's train/test splits.
    Scale: one customer-keyed aggregate then three scalar aggregates
    over the per-customer frame — the per-unit covariate adjustment
    never materializes because arm means of adjusted values are
    algebraically means-of-sums."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    dec = F.round("o_totalprice", 2).cast("decimal(18,2)")
    zero = F.lit(0.00).cast("decimal(18,2)")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < cut, dec).otherwise(zero))
        .cast("double")
        .alias("pre"),
        F.sum(F.when(F.col("o_orderdate") >= cut, dec).otherwise(zero))
        .cast("double")
        .alias("post"),
    ).select(
        "pre",
        "post",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("arm:"), F.col("o_custkey").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("arm"),
    )

    def dsum(col, scale, alias):
        return (
            F.sum(F.round(col, scale).cast(f"decimal(38,{scale})"))
            .cast("double")
            .alias(alias)
        )

    sums = per.agg(
        F.count("*").alias("n"),
        dsum(F.col("pre"), 2, "sp"),
        dsum(F.col("post"), 2, "sq"),
        dsum(F.col("pre") * F.col("pre"), 4, "spp"),
        dsum(F.col("post") * F.col("post"), 4, "sqq"),
        dsum(F.col("pre") * F.col("post"), 4, "spq"),
    )
    arms = per.groupBy("arm").agg(
        F.count("*").alias("n_arm"),
        dsum(F.col("pre"), 2, "sp_a"),
        dsum(F.col("post"), 2, "sq_a"),
    )
    covn = F.col("n") * F.col("spq") - F.col("sp") * F.col("sq")
    varn = F.col("n") * F.col("spp") - F.col("sp") * F.col("sp")
    varq = F.col("n") * F.col("sqq") - F.col("sq") * F.col("sq")
    theta = sums.select(
        (covn / varn).alias("th"),
        (F.col("sp") / F.col("n")).alias("mu_pre"),
        ((covn * covn) / (varn * varq)).alias("rho2"),
    )
    adj = arms.crossJoin(F.broadcast(theta)).select(
        "arm",
        "n_arm",
        (F.col("sq_a") / F.col("n_arm")).alias("mean_post"),
        (
            F.col("sq_a") / F.col("n_arm")
            - F.col("th")
            * (F.col("sp_a") / F.col("n_arm") - F.col("mu_pre"))
        ).alias("mean_cuped"),
    )
    a = adj.where(F.col("arm") == 0).alias("a")
    b = adj.where(F.col("arm") == 1).alias("b")
    return (
        b.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(theta))
        .select(
            F.col("b.n_arm").alias("n_treat"),
            F.col("a.n_arm").alias("n_control"),
            F.round(F.col("b.mean_post") - F.col("a.mean_post"), 6).alias(
                "diff_raw"
            ),
            F.round(F.col("b.mean_cuped") - F.col("a.mean_cuped"), 6).alias(
                "diff_cuped"
            ),
            F.round("th", 6).alias("theta"),
            F.round("rho2", 6).alias("var_reduction"),
        )
    )


@query(
    "decision_stump_returns",
    oracle="""
    WITH lab AS (
      SELECT CAST(FLOOR(o.o_totalprice / 10000) AS INT) AS bucket,
             MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS bad
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ), per AS (
      SELECT bucket, COUNT(*) AS n, SUM(bad) AS nb FROM lab GROUP BY bucket
    ), cum AS (
      SELECT bucket,
             SUM(n)  OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ln,
             SUM(nb) OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lb,
             SUM(n)  OVER () AS tn,
             SUM(nb) OVER () AS tb
      FROM per
    ), cand AS (
      SELECT bucket, ln, lb, tn - ln AS rn, tb - lb AS rb, tn
      FROM cum WHERE ln < tn
    ), scored AS (
      SELECT bucket, ln, lb, rn, rb,
             (CAST(ln AS DOUBLE)
                * (1 - (CAST(lb AS DOUBLE) / ln) * (CAST(lb AS DOUBLE) / ln)
                     - (CAST(ln - lb AS DOUBLE) / ln)
                       * (CAST(ln - lb AS DOUBLE) / ln))
              + CAST(rn AS DOUBLE)
                * (1 - (CAST(rb AS DOUBLE) / rn) * (CAST(rb AS DOUBLE) / rn)
                     - (CAST(rn - rb AS DOUBLE) / rn)
                       * (CAST(rn - rb AS DOUBLE) / rn)))
             / tn AS g
      FROM cand
    )
    SELECT CAST(bucket AS INT) AS split_bucket,
           CAST(ln AS BIGINT) AS n_left, CAST(lb AS BIGINT) AS bad_left,
           CAST(rn AS BIGINT) AS n_right, CAST(rb AS BIGINT) AS bad_right,
           round(g, 6) AS weighted_gini
    FROM scored ORDER BY g, bucket LIMIT 1
    """,
    tags=("ml", "statistics", "classification"),
)
def decision_stump_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-level CART: the best threshold split of order price against
    a "has a returned item" label, chosen by weighted Gini impurity —
    the base learner of every tree ensemble, reduced to its
    distributed-aggregate essence. The only data-sized stages are the
    label join and the per-bucket count (both map-side combinable);
    candidate evaluation runs on the ~55-row bucket frame, where the
    cumulative window gives every candidate's left/right class counts
    in one pass. All split statistics are integer counts; the Gini
    formula is one fixed double expression over them, so both engines
    produce bit-identical scores and the argmin (tie-broken by bucket)
    is deterministic. At 100 TB the bucket frame is still tiny: the
    single-partition window only ever sees one row per price bucket.
    Reference analogue: none (engine-agnostic ML-adjacent analytics);
    grading base learner for SURVEY §2's classifier-curation family."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lab = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("bad"))
        .select(
            F.floor(F.col("o_totalprice") / 10000).cast("int").alias("bucket"),
            "bad",
        )
    )
    per = lab.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("bad").alias("nb")
    )
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = per.select(
        "bucket",
        F.sum("n").over(w_cum).alias("ln"),
        F.sum("nb").over(w_cum).alias("lb"),
        F.sum("n").over(w_all).alias("tn"),
        F.sum("nb").over(w_all).alias("tb"),
    )
    cand = cum.where(F.col("ln") < F.col("tn")).select(
        "bucket",
        "ln",
        "lb",
        (F.col("tn") - F.col("ln")).alias("rn"),
        (F.col("tb") - F.col("lb")).alias("rb"),
        "tn",
    )
    ln, lb = F.col("ln"), F.col("lb")
    rn, rb = F.col("rn"), F.col("rb")
    gl = (
        F.lit(1)
        - (lb.cast("double") / ln) * (lb.cast("double") / ln)
        - ((ln - lb).cast("double") / ln) * ((ln - lb).cast("double") / ln)
    )
    gr = (
        F.lit(1)
        - (rb.cast("double") / rn) * (rb.cast("double") / rn)
        - ((rn - rb).cast("double") / rn) * ((rn - rb).cast("double") / rn)
    )
    scored = cand.select(
        "bucket",
        "ln",
        "lb",
        "rn",
        "rb",
        ((ln.cast("double") * gl + rn.cast("double") * gr) / F.col("tn")).alias(
            "g"
        ),
    )
    return (
        scored.orderBy("g", "bucket")
        .limit(1)
        .select(
            F.col("bucket").cast("int").alias("split_bucket"),
            ln.cast("long").alias("n_left"),
            lb.cast("long").alias("bad_left"),
            rn.cast("long").alias("n_right"),
            rb.cast("long").alias("bad_right"),
            F.round("g", 6).alias("weighted_gini"),
        )
    )


@query(
    "srm_chisq_assignment",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id FROM events
    ), per AS (
      SELECT user_id % 3 AS bucket, COUNT(*) AS n FROM u GROUP BY user_id % 3
    ), wide AS (
      SELECT MAX(CASE WHEN bucket = 0 THEN n END) AS n0,
             MAX(CASE WHEN bucket = 1 THEN n END) AS n1,
             MAX(CASE WHEN bucket = 2 THEN n END) AS n2
      FROM per
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           round((CAST(n0 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   / (CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                 + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   / (CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                 + (CAST(n2 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   * (CAST(n2 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   / (CAST(n0 + n1 + n2 AS DOUBLE) / 3), 6) AS chisq,
           CAST((CAST(n0 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   / (CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                 + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   / (CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                 + (CAST(n2 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   * (CAST(n2 AS DOUBLE) - CAST(n0 + n1 + n2 AS DOUBLE) / 3)
                   / (CAST(n0 + n1 + n2 AS DOUBLE) / 3) > 5.991464547107979
                AS INT) AS srm_flag
    FROM wide
    """,
    tags=("statistics", "experimentation"),
)
def srm_chisq_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: the chi-square goodness-of-fit
    test every experimentation platform runs before trusting an A/B
    readout. Users are assigned to three buckets by ``user_id % 3``
    (expected 1:1:1); the observed bucket counts feed the chi-square
    statistic against the df=2 critical value at p=0.05. Distinct-user
    dedup and the bucket count are the only data-sized stages (both
    shuffle on user_id / bucket with map-side combine); the statistic
    itself is one fixed double expression over three integer counts →
    bit-identical across engines, so even the boolean flag hashes
    exactly. Companion to ab_test_conversion_ztest (SURVEY §2
    experimentation family)."""
    events = load_table(spark, sf_dir, "events")
    per = (
        events.select("user_id")
        .distinct()
        .groupBy((F.col("user_id") % 3).alias("bucket"))
        .agg(F.count("*").alias("n"))
    )
    wide = per.agg(
        F.max(F.when(F.col("bucket") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("bucket") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("bucket") == 2, F.col("n"))).alias("n2"),
    )
    n0, n1, n2 = F.col("n0"), F.col("n1"), F.col("n2")
    exp = (n0 + n1 + n2).cast("double") / 3
    chisq = (
        (n0.cast("double") - exp) * (n0.cast("double") - exp) / exp
        + (n1.cast("double") - exp) * (n1.cast("double") - exp) / exp
        + (n2.cast("double") - exp) * (n2.cast("double") - exp) / exp
    )
    return wide.select(
        n0.cast("long").alias("n0"),
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(chisq, 6).alias("chisq"),
        (chisq > F.lit(5.991464547107979)).cast("int").alias("srm_flag"),
    )


@query(
    "quantile_regression_pinball",
    oracle="""
    WITH pts AS (
      SELECT CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS x,
             CAST(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS yc
      FROM orders
    ), grid AS (
      SELECT a.a AS intercept, b.b AS slope
      FROM (VALUES (50000), (100000), (150000), (200000), (250000)) a(a)
      CROSS JOIN (VALUES (-200), (-100), (0), (100), (200)) b(b)
    ), scored AS (
      SELECT intercept, slope,
             SUM(CASE WHEN yc - (intercept + slope * x) * 100 >= 0
                      THEN 9 * (yc - (intercept + slope * x) * 100)
                      ELSE -(yc - (intercept + slope * x) * 100) END)
               AS loss10,
             COUNT(*) AS n
      FROM pts CROSS JOIN grid
      GROUP BY intercept, slope
    )
    SELECT CAST(intercept AS BIGINT) AS intercept,
           CAST(slope AS BIGINT) AS slope,
           CAST(n AS BIGINT) AS n,
           round(CAST(loss10 AS DOUBLE) / 1000 / n, 6)
             AS mean_pinball_dollars
    FROM scored ORDER BY loss10, slope, intercept LIMIT 1
    """,
    tags=("ml", "statistics", "regression"),
)
def quantile_regression_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (q=0.9) regression of order price on order month by
    grid search over (intercept, slope), minimising pinball loss — the
    distributed form of the P90-forecasting fit. The trick that makes
    the argmin EXACT: with q=9/10 and prices on the cent grid, ten
    times the pinball loss of each residual is an integer number of
    tenth-cents (9·d for d≥0, −d otherwise), so each candidate's total
    loss is an exact integer sum (map-side combinable groupBy over a
    15-wide literal grid cross join — a 25× fact-scan fan-out whose
    aggregate state is 25 rows) and the winner (tie-broken by
    slope/intercept) is engine-independent with no float comparisons
    anywhere. The reported mean loss is one terminal double division.
    At 100 TB the same plan holds: fan-out × partial-agg, no shuffle of
    raw rows beyond the 25-key combine."""
    from data_seedling_spark.operators.dedup import scale_out

    # 25× fan-out of per-row work: decouple parallelism from the input
    # split count (one sf0.1 file would serialize the grid scan).
    orders = scale_out(load_table(spark, sf_dir, "orders"))
    pts = orders.select(
        (
            (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
        )
        .cast("long")
        .alias("x"),
        (F.round("o_totalprice", 2).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("yc"),
    )
    grid = spark.createDataFrame(
        [
            (a, b)
            for a in (50000, 100000, 150000, 200000, 250000)
            for b in (-200, -100, 0, 100, 200)
        ],
        "intercept long, slope long",
    )
    d = F.col("yc") - (F.col("intercept") + F.col("slope") * F.col("x")) * 100
    scored = (
        pts.crossJoin(F.broadcast(grid))
        .groupBy("intercept", "slope")
        .agg(
            F.sum(F.when(d >= 0, 9 * d).otherwise(-d)).alias("loss10"),
            F.count("*").alias("n"),
        )
    )
    return (
        scored.orderBy("loss10", "slope", "intercept")
        .limit(1)
        .select(
            F.col("intercept").cast("long"),
            F.col("slope").cast("long"),
            F.col("n").cast("long"),
            F.round(
                F.col("loss10").cast("double") / 1000 / F.col("n"), 6
            ).alias("mean_pinball_dollars"),
        )
    )


@query(
    "shapley_attribution_channels",
    oracle="""
    WITH ranked AS (
      SELECT user_id,
             substr(event_type, 1, 1) AS ch,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), firstp AS (
      SELECT user_id, MIN(CASE WHEN ch = 'p' THEN rn END) AS prn,
             MAX(rn) AS maxrn
      FROM ranked GROUP BY user_id
    ), kept AS (
      SELECT r.user_id, r.ch
      FROM ranked r JOIN firstp f ON r.user_id = f.user_id
      WHERE r.rn <= COALESCE(f.prn, f.maxrn)
    ), per_user AS (
      SELECT user_id,
             MAX(CASE WHEN ch = 'v' THEN 1 ELSE 0 END)
           + 2 * MAX(CASE WHEN ch = 'c' THEN 1 ELSE 0 END)
           + 4 * MAX(CASE WHEN ch = 's' THEN 1 ELSE 0 END)
           + 8 * MAX(CASE WHEN ch = 'e' THEN 1 ELSE 0 END) AS mask,
             MAX(CASE WHEN ch = 'p' THEN 1 ELSE 0 END) AS conv
      FROM kept GROUP BY user_id
    ), mc AS (
      SELECT mask, SUM(conv) AS conv FROM per_user GROUP BY mask
    ), subsets AS (
      SELECT unnest(range(16)) AS s
    ), v AS (
      SELECT s.s, COALESCE(SUM(mc.conv), 0) AS v
      FROM subsets s LEFT JOIN mc ON (mc.mask & s.s) = mc.mask
      GROUP BY s.s
    ), chan AS (
      SELECT * FROM (VALUES ('view', 1), ('click', 2),
                            ('signup', 4), ('error', 8)) t(channel, bit)
    ), contrib AS (
      SELECT c.channel,
             SUM(CASE ((v0.s >> 0) & 1) + ((v0.s >> 1) & 1)
                    + ((v0.s >> 2) & 1) + ((v0.s >> 3) & 1)
                 WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
                 * (v1.v - v0.v)) AS phi24
      FROM chan c
      JOIN v v0 ON (v0.s & c.bit) = 0
      JOIN v v1 ON v1.s = v0.s + c.bit
      GROUP BY c.channel
    ), tot AS (
      SELECT SUM(phi24) AS t FROM contrib
    )
    SELECT channel,
           CAST(phi24 AS BIGINT) AS shapley_x24,
           round(CAST(phi24 AS DOUBLE) / t, 6) AS credit_share
    FROM contrib CROSS JOIN tot
    ORDER BY channel
    """,
    tags=("attribution", "shapley", "events", "marketing"),
)
def shapley_attribution_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value multi-touch attribution (the game-theoretic
    companion to markov_attribution_removal): each converting user's
    pre-purchase journey is reduced to the SET of channels touched
    (view/click/signup/error → a 4-bit mask), the coalition value
    v(S) counts conversions among users whose touch set ⊆ S, and each
    channel's credit is its exact Shapley value Σ_S |S|!(3−|S|)!/4! ·
    (v(S∪{i}) − v(S)). With n=4 the weights ×24 are the integers
    {6,2,2,6} and every v(S) is an integer count, so the reported
    shapley_x24 is integer-exact and addition-order-free; the only
    double is the final credit-share division. Efficiency axiom
    (Σφ = v(full) − v(∅)) is pytest-asserted.
    Scale: the per-user window + 16-group mask count are the only
    data-sized stages (map-side combinable); the subset lattice,
    coalition values and Shapley sums all live on 16-row broadcast
    frames no matter how many users."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    ).select("user_id", "rn", "ch")
    firstp = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("ch") == "p", F.col("rn"))).alias("prn"),
        F.max("rn").alias("maxrn"),
    )
    kept = ranked.join(firstp, "user_id").where(
        F.col("rn") <= F.coalesce("prn", "maxrn")
    )
    per_user = kept.groupBy("user_id").agg(
        (
            F.max((F.col("ch") == "v").cast("int"))
            + 2 * F.max((F.col("ch") == "c").cast("int"))
            + 4 * F.max((F.col("ch") == "s").cast("int"))
            + 8 * F.max((F.col("ch") == "e").cast("int"))
        ).alias("mask"),
        F.max((F.col("ch") == "p").cast("int")).alias("conv"),
    )
    mc = per_user.groupBy("mask").agg(F.sum("conv").alias("conv"))
    subsets = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            F.broadcast(mc),
            F.expr("(mask & s) = mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).alias("v"))
    )
    chan = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
        "channel string, bit int",
    )
    popw = F.expr(
        "CASE ((s >> 0) & 1) + ((s >> 1) & 1) + ((s >> 2) & 1)"
        " + ((s >> 3) & 1)"
        " WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"
    )
    v0 = v.select("s", "v")
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    contrib = (
        chan.join(F.broadcast(v0), F.expr("(s & bit) = 0"))
        .join(F.broadcast(v1), F.expr("s1 = s + bit"))
        .groupBy("channel")
        .agg(F.sum(popw * (F.col("v1") - F.col("v"))).alias("phi24"))
    )
    tot = contrib.agg(F.sum("phi24").alias("t"))
    return (
        contrib.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("phi24").cast("long").alias("shapley_x24"),
            F.round(F.col("phi24").cast("double") / F.col("t"), 6).alias(
                "credit_share"
            ),
        )
        .orderBy("channel")
    )


@query(
    "bloom_filter_semi_join",
    oracle="""
    WITH build AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'
    ), bits AS (
      SELECT DISTINCT bit FROM (
        SELECT CAST('0x' || substr(md5('bf1:' || CAST(p_partkey AS VARCHAR)),
                                   1, 8) AS BIGINT) % 8192 AS bit FROM build
        UNION ALL
        SELECT CAST('0x' || substr(md5('bf2:' || CAST(p_partkey AS VARCHAR)),
                                   1, 8) AS BIGINT) % 8192 FROM build
        UNION ALL
        SELECT CAST('0x' || substr(md5('bf3:' || CAST(p_partkey AS VARCHAR)),
                                   1, 8) AS BIGINT) % 8192 FROM build
      )
    ), probe AS (
      SELECT l_partkey,
        CAST('0x' || substr(md5('bf1:' || CAST(l_partkey AS VARCHAR)),
                            1, 8) AS BIGINT) % 8192 AS h1,
        CAST('0x' || substr(md5('bf2:' || CAST(l_partkey AS VARCHAR)),
                            1, 8) AS BIGINT) % 8192 AS h2,
        CAST('0x' || substr(md5('bf3:' || CAST(l_partkey AS VARCHAR)),
                            1, 8) AS BIGINT) % 8192 AS h3
      FROM lineitem
    ), flagged AS (
      SELECT p.l_partkey,
             CAST(b1.bit IS NOT NULL AND b2.bit IS NOT NULL
                  AND b3.bit IS NOT NULL AS INT) AS pass_bloom,
             CAST(m.p_partkey IS NOT NULL AS INT) AS member
      FROM probe p
      LEFT JOIN bits b1 ON b1.bit = p.h1
      LEFT JOIN bits b2 ON b2.bit = p.h2
      LEFT JOIN bits b3 ON b3.bit = p.h3
      LEFT JOIN build m ON m.p_partkey = p.l_partkey
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM build) AS n_build,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_probe,
           CAST(SUM(pass_bloom) AS BIGINT) AS n_pass_bloom,
           CAST(SUM(member) AS BIGINT) AS n_true_match,
           CAST(SUM(pass_bloom) - SUM(member) AS BIGINT) AS n_false_pos,
           round(CAST(SUM(pass_bloom) - SUM(member) AS DOUBLE)
                 / (COUNT(*) - SUM(member)), 6) AS fp_rate,
           round(1 - CAST(SUM(pass_bloom) AS DOUBLE) / COUNT(*), 6)
             AS pruned_frac
    FROM flagged
    """,
    tags=("join", "bloom-filter", "runtime-filter", "optimization"),
)
def bloom_filter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pruning — the distributed-join workhorse
    Spark itself applies under `spark.sql.optimizer.runtime.bloomFilter`
    (here built explicitly so the filter is engine-portable and its
    false-positive accounting is oracle-checkable): hash each build-side
    key (parts of one brand) into an m=8192-bit / k=3 Bloom filter of
    md5-coin bit positions, broadcast the SET of set bits, and gate the
    fact scan on all-3-bits-present before any exact join work. Members
    always pass (no false negatives — pytest-asserted); the residual
    false-positive rate among non-members is reported exactly. The
    filter is a ≤8192-row broadcast no matter how large the build side;
    probe-side checks are three broadcast hash-join lookups fused into
    the scan's codegen stage — zero shuffle of the fact table. At 100 TB
    this is the shape that turns a shuffle-everything semi-join into a
    scan-local prune, with the exact join only over surviving rows."""
    M = 8192

    def hbit(prefix: str, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % M
        )

    part = load_table(spark, sf_dir, "part")
    build = part.where(F.col("p_brand") == "Brand#23").select("p_partkey")
    bits = None
    for i in (1, 2, 3):
        b = build.select(hbit(f"bf{i}:", F.col("p_partkey")).alias("bit"))
        bits = b if bits is None else bits.unionByName(b)
    bits = bits.distinct()
    probe = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        hbit("bf1:", F.col("l_partkey")).alias("h1"),
        hbit("bf2:", F.col("l_partkey")).alias("h2"),
        hbit("bf3:", F.col("l_partkey")).alias("h3"),
    )
    b1 = bits.select(F.col("bit").alias("bit1"))
    b2 = bits.select(F.col("bit").alias("bit2"))
    b3 = bits.select(F.col("bit").alias("bit3"))
    mem = build.select(F.col("p_partkey").alias("mkey"))
    flagged = (
        probe.join(F.broadcast(b1), F.col("h1") == F.col("bit1"), "left")
        .join(F.broadcast(b2), F.col("h2") == F.col("bit2"), "left")
        .join(F.broadcast(b3), F.col("h3") == F.col("bit3"), "left")
        .join(F.broadcast(mem), F.col("l_partkey") == F.col("mkey"), "left")
        .select(
            (
                F.col("bit1").isNotNull()
                & F.col("bit2").isNotNull()
                & F.col("bit3").isNotNull()
            )
            .cast("int")
            .alias("pass_bloom"),
            F.col("mkey").isNotNull().cast("int").alias("member"),
        )
    )
    counts = flagged.agg(
        F.count("*").alias("n_probe"),
        F.sum("pass_bloom").alias("n_pass"),
        F.sum("member").alias("n_true"),
    )
    nb = build.agg(F.count("*").alias("n_build"))
    nbits = bits.agg(F.count("*").alias("bits_set"))
    return (
        nb.crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(counts))
        .select(
            F.col("n_build").cast("long"),
            F.col("bits_set").cast("long"),
            F.col("n_probe").cast("long"),
            F.col("n_pass").cast("long").alias("n_pass_bloom"),
            F.col("n_true").cast("long").alias("n_true_match"),
            (F.col("n_pass") - F.col("n_true"))
            .cast("long")
            .alias("n_false_pos"),
            F.round(
                (F.col("n_pass") - F.col("n_true")).cast("double")
                / (F.col("n_probe") - F.col("n_true")),
                6,
            ).alias("fp_rate"),
            F.round(
                F.lit(1) - F.col("n_pass").cast("double") / F.col("n_probe"),
                6,
            ).alias("pruned_frac"),
        )
    )


@query(
    "decision_tree_depth2_returns",
    oracle="""
    WITH lab AS (
      SELECT CAST(FLOOR(o.o_totalprice / 10000) AS INT) AS bucket,
             CAST(EXTRACT(month FROM o.o_orderdate) AS INT) AS mth,
             MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS bad
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
    ), per AS (
      SELECT bucket, COUNT(*) AS n, SUM(bad) AS nb FROM lab GROUP BY bucket
    ), cum AS (
      SELECT bucket,
             SUM(n)  OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ln,
             SUM(nb) OVER (ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lb,
             SUM(n)  OVER () AS tn, SUM(nb) OVER () AS tb
      FROM per
    ), scored AS (
      SELECT bucket, ln, lb, tn - ln AS rn, tb - lb AS rb, tn,
             (CAST(ln AS DOUBLE)
                * (1 - (CAST(lb AS DOUBLE) / ln) * (CAST(lb AS DOUBLE) / ln)
                     - (CAST(ln - lb AS DOUBLE) / ln)
                       * (CAST(ln - lb AS DOUBLE) / ln))
              + CAST(tn - ln AS DOUBLE)
                * (1 - (CAST(tb - lb AS DOUBLE) / (tn - ln))
                       * (CAST(tb - lb AS DOUBLE) / (tn - ln))
                     - (CAST(tn - ln - tb + lb AS DOUBLE) / (tn - ln))
                       * (CAST(tn - ln - tb + lb AS DOUBLE) / (tn - ln))))
             / tn AS g
      FROM cum WHERE ln < tn
    ), root AS (
      SELECT bucket AS split_bucket, g AS root_g, tn
      FROM scored ORDER BY g, bucket LIMIT 1
    ), sided AS (
      SELECT CASE WHEN l.bucket <= r.split_bucket THEN 0 ELSE 1 END AS side,
             l.mth, l.bad
      FROM lab l CROSS JOIN root r
    ), perm AS (
      SELECT side, mth, COUNT(*) AS n, SUM(bad) AS nb
      FROM sided GROUP BY side, mth
    ), cumm AS (
      SELECT side, mth,
             SUM(n)  OVER (PARTITION BY side ORDER BY mth
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ln,
             SUM(nb) OVER (PARTITION BY side ORDER BY mth
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lb,
             SUM(n)  OVER (PARTITION BY side) AS tn,
             SUM(nb) OVER (PARTITION BY side) AS tb
      FROM perm
    ), scoredm AS (
      SELECT side, mth, ln, tn,
             (CAST(ln AS DOUBLE)
                * (1 - (CAST(lb AS DOUBLE) / ln) * (CAST(lb AS DOUBLE) / ln)
                     - (CAST(ln - lb AS DOUBLE) / ln)
                       * (CAST(ln - lb AS DOUBLE) / ln))
              + CAST(tn - ln AS DOUBLE)
                * (1 - (CAST(tb - lb AS DOUBLE) / (tn - ln))
                       * (CAST(tb - lb AS DOUBLE) / (tn - ln))
                     - (CAST(tn - ln - tb + lb AS DOUBLE) / (tn - ln))
                       * (CAST(tn - ln - tb + lb AS DOUBLE) / (tn - ln))))
             / tn AS g
      FROM cumm WHERE ln < tn
    ), best AS (
      SELECT side, mth, ln, tn, g,
             ROW_NUMBER() OVER (PARTITION BY side ORDER BY g, mth) AS rk
      FROM scoredm
    )
    SELECT r.split_bucket,
           CAST(MAX(CASE WHEN b.side = 0 THEN b.mth END) AS INT)
             AS left_month_split,
           CAST(MAX(CASE WHEN b.side = 1 THEN b.mth END) AS INT)
             AS right_month_split,
           CAST(MAX(CASE WHEN b.side = 0 THEN b.tn END) AS BIGINT) AS n_left,
           CAST(MAX(CASE WHEN b.side = 1 THEN b.tn END) AS BIGINT) AS n_right,
           round(MAX(r.root_g), 6) AS root_gini,
           round(SUM(b.g * b.tn) / MAX(r.tn), 6) AS tree_gini
    FROM best b CROSS JOIN root r
    WHERE b.rk = 1
    GROUP BY r.split_bucket
    """,
    tags=("ml", "statistics", "classification", "decision-tree"),
)
def decision_tree_depth2_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy depth-2 CART: the decision_stump_returns root split on
    order-price bucket, then — inside each side — the best order-month
    split, all chosen by weighted Gini over integer class counts. This
    is real recursive tree induction reduced to its distributed shape:
    level k is one (side, feature-value) grouped count (map-side
    combinable over the fact join) plus a cumulative window on the tiny
    per-side candidate frame; the chosen root broadcasts into the
    side assignment, so the fact table is scanned once per level and
    never shuffled beyond the grouped counts. Gini scores are fixed
    double expressions over integer counts with (g, value) tiebreaks —
    the whole tree is bit-identical across engines. tree_gini ≤
    root_gini (splits never hurt training impurity) is pytest-asserted.
    At 100 TB each extra level is one more grouped-count pass, never a
    data-sized sort or per-node shuffle."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lab = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice", "o_orderdate")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("bad"))
        .select(
            F.floor(F.col("o_totalprice") / 10000).cast("int").alias("bucket"),
            F.month("o_orderdate").cast("int").alias("mth"),
            "bad",
        )
    )

    def gini_scored(per, key, part_cols):
        pw = (
            W.partitionBy(*part_cols) if part_cols else W.partitionBy(F.lit(1))
        )
        w_cum = pw.orderBy(key).rowsBetween(W.unboundedPreceding, W.currentRow)
        w_all = pw.orderBy(key).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
        cum = per.select(
            *part_cols,
            key,
            F.sum("n").over(w_cum).alias("ln"),
            F.sum("nb").over(w_cum).alias("lb"),
            F.sum("n").over(w_all).alias("tn"),
            F.sum("nb").over(w_all).alias("tb"),
        ).where(F.col("ln") < F.col("tn"))
        ln, lb = F.col("ln"), F.col("lb")
        tn, tb = F.col("tn"), F.col("tb")
        rn, rb = tn - ln, tb - lb
        gl = (
            F.lit(1)
            - (lb.cast("double") / ln) * (lb.cast("double") / ln)
            - ((ln - lb).cast("double") / ln) * ((ln - lb).cast("double") / ln)
        )
        gr = (
            F.lit(1)
            - (rb.cast("double") / rn) * (rb.cast("double") / rn)
            - ((rn - rb).cast("double") / rn) * ((rn - rb).cast("double") / rn)
        )
        return cum.select(
            *part_cols,
            key,
            "ln",
            "tn",
            ((ln.cast("double") * gl + rn.cast("double") * gr) / tn).alias("g"),
        )

    per_root = lab.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("bad").alias("nb")
    )
    root = (
        gini_scored(per_root, "bucket", [])
        .orderBy("g", "bucket")
        .limit(1)
        .select(
            F.col("bucket").alias("split_bucket"),
            F.col("g").alias("root_g"),
            F.col("tn").alias("tn_total"),
        )
    )
    sided = lab.crossJoin(F.broadcast(root)).select(
        F.when(F.col("bucket") <= F.col("split_bucket"), 0)
        .otherwise(1)
        .alias("side"),
        "mth",
        "bad",
    )
    perm = sided.groupBy("side", "mth").agg(
        F.count("*").alias("n"), F.sum("bad").alias("nb")
    )
    scoredm = gini_scored(perm, "mth", ["side"])
    best = scoredm.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("side").orderBy("g", "mth")),
    ).where(F.col("rk") == 1)
    return (
        best.crossJoin(F.broadcast(root))
        .groupBy("split_bucket")
        .agg(
            F.max(F.when(F.col("side") == 0, F.col("mth")))
            .cast("int")
            .alias("left_month_split"),
            F.max(F.when(F.col("side") == 1, F.col("mth")))
            .cast("int")
            .alias("right_month_split"),
            F.max(F.when(F.col("side") == 0, F.col("tn")))
            .cast("long")
            .alias("n_left"),
            F.max(F.when(F.col("side") == 1, F.col("tn")))
            .cast("long")
            .alias("n_right"),
            F.round(F.max("root_g"), 6).alias("root_gini"),
            F.round(
                F.sum(F.col("g") * F.col("tn")) / F.max("tn_total"), 6
            ).alias("tree_gini"),
        )
    )


@query(
    "bandit_replay_offpolicy",
    oracle="""
    WITH logged AS (
      SELECT event_type AS arm,
             CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS reward,
             CAST('0x' || substr(md5('bandit:' || CAST(event_id AS VARCHAR)),
                                 1, 8) AS BIGINT) % 2 AS epoch
      FROM events
    ), learn AS (
      SELECT arm, COUNT(*) AS cnt, SUM(reward) AS s
      FROM logged WHERE epoch = 0 GROUP BY arm
    ), greedy AS (
      SELECT arm, CAST(s AS DOUBLE) / cnt AS mean_learn
      FROM learn
      ORDER BY CAST(s AS DOUBLE) / cnt DESC, arm LIMIT 1
    ), eval AS (
      SELECT COUNT(*) AS n_eval,
             SUM(reward) AS s_all,
             SUM(CASE WHEN l.arm = g.arm THEN 1 ELSE 0 END) AS n_matched,
             SUM(CASE WHEN l.arm = g.arm THEN reward
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS s_matched
      FROM logged l CROSS JOIN greedy g WHERE l.epoch = 1
    )
    SELECT g.arm AS greedy_arm,
           round(g.mean_learn, 6) AS mean_learn,
           (SELECT CAST(SUM(cnt) AS BIGINT) FROM learn) AS n_learn,
           CAST(e.n_eval AS BIGINT) AS n_eval,
           CAST(e.n_matched AS BIGINT) AS n_matched,
           round(CAST(e.s_matched AS DOUBLE) / e.n_matched, 6)
             AS policy_value,
           round(CAST(e.s_all AS DOUBLE) / e.n_eval, 6) AS logged_value,
           round(CAST(e.s_matched AS DOUBLE) / e.n_matched
                 - CAST(e.s_all AS DOUBLE) / e.n_eval, 6) AS uplift
    FROM greedy g CROSS JOIN eval e
    """,
    tags=("ml", "bandit", "off-policy", "evaluation", "events"),
)
def bandit_replay_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy replay evaluation (Li et al. 2011, the unbiased
    offline estimator for bandit policies when the logging policy is
    uniform): split the event log into a learning epoch and an
    evaluation epoch by an md5 coin, fit the greedy policy (arm with
    the highest mean logged reward) on the learning half, then score it
    on the held-out half by the replay method — keep exactly the events
    where the logged arm equals the policy's choice and average their
    rewards. Rewards are decimal-grid sums (addition-order-free); the
    greedy argmax orders by a double computed from one decimal sum and
    one count, identical in both engines; all reported values are
    terminal divisions. Uplift = policy value − logged average.
    Scale: two grouped passes over the fact table (5-arm learn agg,
    then the eval agg with the 1-row greedy choice broadcast in) — no
    shuffle wider than the 5-arm combine, no per-event state."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("arm"),
        F.round("value", 2).cast("decimal(18,2)").alias("reward"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("bandit:"), F.col("event_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("epoch"),
    )
    learn = (
        ev.where(F.col("epoch") == 0)
        .groupBy("arm")
        .agg(F.count("*").alias("cnt"), F.sum("reward").alias("s"))
    )
    mean_learn = F.col("s").cast("double") / F.col("cnt")
    greedy = (
        learn.orderBy(mean_learn.desc(), "arm")
        .limit(1)
        .select(F.col("arm").alias("g_arm"), mean_learn.alias("mean_learn"))
    )
    n_learn = learn.agg(F.sum("cnt").alias("n_learn"))
    ev1 = ev.where(F.col("epoch") == 1).crossJoin(F.broadcast(greedy))
    zero = F.lit("0.00").cast("decimal(18,2)")
    ev_agg = ev1.agg(
        F.count("*").alias("n_eval"),
        F.sum("reward").alias("s_all"),
        F.sum((F.col("arm") == F.col("g_arm")).cast("long")).alias(
            "n_matched"
        ),
        F.sum(
            F.when(F.col("arm") == F.col("g_arm"), F.col("reward")).otherwise(
                zero
            )
        ).alias("s_matched"),
        F.max("g_arm").alias("greedy_arm"),
        F.max("mean_learn").alias("mean_learn"),
    )
    pol = F.col("s_matched").cast("double") / F.col("n_matched")
    log_v = F.col("s_all").cast("double") / F.col("n_eval")
    return (
        ev_agg.crossJoin(F.broadcast(n_learn))
        .select(
            "greedy_arm",
            F.round("mean_learn", 6).alias("mean_learn"),
            F.col("n_learn").cast("long"),
            F.col("n_eval").cast("long"),
            F.col("n_matched").cast("long"),
            F.round(pol, 6).alias("policy_value"),
            F.round(log_v, 6).alias("logged_value"),
            F.round(pol - log_v, 6).alias("uplift"),
        )
    )


@query(
    "diff_in_diff_spend",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST('0x' || substr(md5('arm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8) AS BIGINT) % 2 AS arm,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                      THEN CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS pre,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01'
                      THEN CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS post
      FROM orders GROUP BY o_custkey
    ), cells AS (
      SELECT COUNT(CASE WHEN arm = 1 THEN 1 END) AS n_treat,
             COUNT(CASE WHEN arm = 0 THEN 1 END) AS n_ctrl,
             SUM(CASE WHEN arm = 1 THEN pre
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS s_tp,
             SUM(CASE WHEN arm = 1 THEN post
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS s_tq,
             SUM(CASE WHEN arm = 0 THEN pre
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS s_cp,
             SUM(CASE WHEN arm = 0 THEN post
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS s_cq
      FROM per
    )
    SELECT CAST(n_treat AS BIGINT) AS n_treat,
           CAST(n_ctrl AS BIGINT) AS n_ctrl,
           round(CAST(s_tp AS DOUBLE) / n_treat, 6) AS mean_treat_pre,
           round(CAST(s_tq AS DOUBLE) / n_treat, 6) AS mean_treat_post,
           round(CAST(s_cp AS DOUBLE) / n_ctrl, 6) AS mean_ctrl_pre,
           round(CAST(s_cq AS DOUBLE) / n_ctrl, 6) AS mean_ctrl_post,
           round(CAST(s_tp AS DOUBLE) / n_treat
                 - CAST(s_cp AS DOUBLE) / n_ctrl, 6) AS pre_gap,
           round((CAST(s_tq AS DOUBLE) / n_treat
                  - CAST(s_tp AS DOUBLE) / n_treat)
                 - (CAST(s_cq AS DOUBLE) / n_ctrl
                    - CAST(s_cp AS DOUBLE) / n_ctrl), 6) AS did_effect
    FROM cells
    """,
    tags=("statistics", "experimentation", "causal-inference"),
)
def diff_in_diff_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse quasi-experimental
    estimator: customers hash into treatment/control by the same
    md5-coin the CUPED query uses, periods split at a fixed date, and
    the effect is (Δ treat) − (Δ control) of per-customer mean spend,
    which nets out both the arm-level baseline gap and the common time
    trend. The pre-period gap is reported as the parallel-trends
    diagnostic. One grouped pass builds per-customer pre/post decimal
    sums; one 6-accumulator aggregate builds all four cells; every
    reported value is a fixed double expression over decimal sums and
    integer counts — hash-exact. Completes the experimentation family
    (z-test, SRM, CUPED, DiD).
    Scale: two map-side-combinable aggregations, no window, no join —
    the same two-shuffle shape at any volume."""
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("arm:"), F.col("o_custkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    cut = F.lit("1997-01-01").cast("timestamp")
    zero = F.lit("0.00").cast("decimal(18,2)")
    price = F.round("o_totalprice", 2).cast("decimal(18,2)")
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("o_orderdate") < cut, price).otherwise(zero)
            ).alias("pre"),
            F.sum(
                F.when(F.col("o_orderdate") >= cut, price).otherwise(zero)
            ).alias("post"),
        )
        .select(arm.alias("arm"), "pre", "post")
    )
    zero_ = F.lit("0.00").cast("decimal(18,2)")
    cells = per.agg(
        F.count(F.when(F.col("arm") == 1, F.lit(1))).alias("n_treat"),
        F.count(F.when(F.col("arm") == 0, F.lit(1))).alias("n_ctrl"),
        F.sum(F.when(F.col("arm") == 1, F.col("pre")).otherwise(zero_)).alias(
            "s_tp"
        ),
        F.sum(
            F.when(F.col("arm") == 1, F.col("post")).otherwise(zero_)
        ).alias("s_tq"),
        F.sum(F.when(F.col("arm") == 0, F.col("pre")).otherwise(zero_)).alias(
            "s_cp"
        ),
        F.sum(
            F.when(F.col("arm") == 0, F.col("post")).otherwise(zero_)
        ).alias("s_cq"),
    )
    tp = F.col("s_tp").cast("double") / F.col("n_treat")
    tq = F.col("s_tq").cast("double") / F.col("n_treat")
    cp = F.col("s_cp").cast("double") / F.col("n_ctrl")
    cq = F.col("s_cq").cast("double") / F.col("n_ctrl")
    return cells.select(
        F.col("n_treat").cast("long"),
        F.col("n_ctrl").cast("long"),
        F.round(tp, 6).alias("mean_treat_pre"),
        F.round(tq, 6).alias("mean_treat_post"),
        F.round(cp, 6).alias("mean_ctrl_pre"),
        F.round(cq, 6).alias("mean_ctrl_post"),
        F.round(tp - cp, 6).alias("pre_gap"),
        F.round((tq - tp) - (cq - cp), 6).alias("did_effect"),
    )


@query(
    "theil_sen_trend_revenue",
    oracle="""
    WITH pts AS (
      SELECT CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS yc
      FROM orders GROUP BY x
    ), pairs AS (
      SELECT a.x AS x1, b.x AS x2,
             CAST(b.yc - a.yc AS DOUBLE) / (b.x - a.x) AS slope
      FROM pts a JOIN pts b ON a.x < b.x
    ), ranked AS (
      SELECT slope,
             ROW_NUMBER() OVER (ORDER BY slope, x1, x2) AS rk,
             COUNT(*) OVER () AS n
      FROM pairs
    ), med AS (
      SELECT slope FROM ranked WHERE rk = (n + 1) // 2
    ), resid AS (
      SELECT p.x, CAST(p.yc AS DOUBLE) - m.slope * p.x AS r
      FROM pts p CROSS JOIN med m
    ), rranked AS (
      SELECT r, ROW_NUMBER() OVER (ORDER BY r, x) AS rk,
             COUNT(*) OVER () AS n
      FROM resid
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n_points,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs,
           round(m.slope / 100, 6) AS slope_dollars_per_month,
           round(rr.r / 100, 6) AS intercept_dollars
    FROM med m CROSS JOIN (SELECT r FROM rranked WHERE rk = (n + 1) // 2) rr
    """,
    tags=("statistics", "robust", "trend", "time-series"),
)
def theil_sen_trend_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: the median of all pairwise slopes of
    monthly revenue — the 29%-breakdown-point alternative to OLS that
    one outlier month cannot drag. Monthly totals are decimal-grid
    cent integers, every pairwise slope is one integer-difference
    division (identical doubles in both engines), and both medians
    (slope, then intercept residual) are order statistics with
    (value, x1, x2) tiebreaks — no float summation anywhere.
    Scale: the fact table collapses to one monthly integer per
    calendar month in one map-side-combinable pass; the O(months²)
    pair frame grows with the CALENDAR, not the data — bounded at a
    few hundred months (≤~100k pairs) for any real deployment. The
    scale-probe corpus deliberately grows the calendar ∝ k (the
    anti-densification shift), which makes ITS pair frame quadratic
    in k (SCALE.md r11 adjudication); the slope median therefore
    ranks via ``range_rank`` (1e8-cent/month slope buckets) so even a
    synthetic 10k-month calendar never funnels the pair frame through
    one task. The residual median stays a global window over the
    months-sized frame."""
    from pyspark.sql.window import Window as W

    from .operators.sampling import range_rank

    pts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            )
            .cast("long")
            .alias("x")
        )
        .agg(
            (F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
    )
    a = pts.select(F.col("x").alias("x1"), F.col("yc").alias("y1"))
    b = pts.select(F.col("x").alias("x2"), F.col("yc").alias("y2"))
    # try_divide, not `/`: the range_rank offsets branch prunes this
    # projection down to the bucket key, and the fused BNLJ codegen
    # stage can evaluate it on candidate rows BEFORE the x1<x2
    # condition gates them — an ANSI DIVIDE_BY_ZERO on pairs that
    # never survive. x2-x1 >= 1 on every surviving row, so values are
    # unchanged.
    pairs = a.join(b, F.col("x1") < F.col("x2")).select(
        "x1",
        "x2",
        F.try_divide(
            (F.col("y2") - F.col("y1")).cast("double"),
            F.col("x2") - F.col("x1"),
        ).alias("slope"),
    )
    n_pairs_f = F.broadcast(pairs.agg(F.count("*").alias("n")))
    ranked = range_rank(
        pairs, "slope", tie_cols=("x1", "x2"),
        bucket_expr=F.floor(F.col("slope") / 100_000_000), rank_col="rk",
    ).crossJoin(n_pairs_f)
    med = ranked.where(
        F.col("rk") == F.expr("(n + 1) DIV 2")
    ).select("slope")
    resid = pts.crossJoin(F.broadcast(med)).select(
        "x", (F.col("yc").cast("double") - F.col("slope") * F.col("x")).alias("r")
    )
    rranked = resid.select(
        "r",
        F.row_number().over(W.orderBy("r", "x")).alias("rk"),
        F.count("*").over(W.partitionBy(F.lit(1))).alias("n"),
    )
    rmed = rranked.where(F.col("rk") == F.expr("(n + 1) DIV 2")).select("r")
    n_points = pts.agg(F.count("*").alias("n_points"))
    n_pairs = pairs.agg(F.count("*").alias("n_pairs"))
    return (
        n_points.crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(rmed))
        .select(
            F.col("n_points").cast("long"),
            F.col("n_pairs").cast("long"),
            F.round(F.col("slope") / 100, 6).alias(
                "slope_dollars_per_month"
            ),
            F.round(F.col("r") / 100, 6).alias("intercept_dollars"),
        )
    )


@query(
    "dp_randomized_response",
    oracle="""
    WITH resp AS (
      SELECT CAST(c_mktsegment = 'BUILDING' AS INT) AS truth,
             CAST((CAST('0x' || substr(md5('rr:' || CAST(c_custkey
                                                         AS VARCHAR)),
                                       1, 8) AS BIGINT) + 0.5)
                  / 4294967296.0 < 0.25 AS INT) AS flip
      FROM customer
    ), obs AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN flip = 1 THEN 1 - truth ELSE truth END)
               AS n_yes,
             SUM(truth) AS n_true
      FROM resp
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_yes AS BIGINT) AS n_reported_yes,
           round((CAST(n_yes AS DOUBLE) / n - 0.25) / 0.5, 6)
             AS rr_estimate,
           round(CAST(n_true AS DOUBLE) / n, 6) AS true_rate,
           round(abs((CAST(n_yes AS DOUBLE) / n - 0.25) / 0.5
                     - CAST(n_true AS DOUBLE) / n), 6) AS abs_error
    FROM obs
    """,
    tags=("privacy", "differential-privacy", "randomized-response"),
)
def dp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (Warner 1965) — LOCAL differential privacy,
    the mechanism where the raw data is never trusted to the
    aggregator: each customer reports their sensitive bit (is their
    segment BUILDING?) truthfully with probability 3/4 and flipped
    with probability 1/4 (an ε=ln 3 local-DP channel), and the
    aggregator debiases the observed yes-rate by (p̂ − q)/(p − q).
    The flip coin is the md5-coin uniform, so both engines flip the
    SAME respondents — the estimate, the ground-truth rate (reported
    here only to exhibit the estimator's error) and the debiasing are
    all integer counts plus fixed terminal arithmetic, hash-exact.
    Completes the DP family: central Laplace release, user-level
    bounded contribution, and now the local model.
    Scale: one map-side-combinable aggregate over the respondent
    table; nothing else."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("rr:"), F.col("c_custkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    resp = load_table(spark, sf_dir, "customer").select(
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("truth"),
        (u < 0.25).cast("int").alias("flip"),
    )
    obs = resp.agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("flip") == 1, 1 - F.col("truth")).otherwise(
                F.col("truth")
            )
        ).alias("n_yes"),
        F.sum("truth").alias("n_true"),
    )
    est = (F.col("n_yes").cast("double") / F.col("n") - 0.25) / 0.5
    true_rate = F.col("n_true").cast("double") / F.col("n")
    return obs.select(
        F.col("n").cast("long"),
        F.col("n_yes").cast("long").alias("n_reported_yes"),
        F.round(est, 6).alias("rr_estimate"),
        F.round(true_rate, 6).alias("true_rate"),
        F.round(F.abs(est - true_rate), 6).alias("abs_error"),
    )


@query(
    "quantile_treatment_effect",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             CAST('0x' || substr(md5('arm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8) AS BIGINT) % 2 AS arm,
             CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), r AS (
      SELECT arm, cents,
             ROW_NUMBER() OVER (PARTITION BY arm
                                ORDER BY cents, o_custkey) AS rk,
             COUNT(*) OVER (PARTITION BY arm) AS n
      FROM per
    ), med AS (
      SELECT arm, cents, n FROM r WHERE rk = (n + 1) // 2
    )
    SELECT CAST(t.n AS BIGINT) AS n_treat, CAST(c.n AS BIGINT) AS n_ctrl,
           round(t.cents / 100.0, 6) AS median_treat,
           round(c.cents / 100.0, 6) AS median_ctrl,
           round((t.cents - c.cents) / 100.0, 6) AS qte
    FROM (SELECT * FROM med WHERE arm = 1) t
    CROSS JOIN (SELECT * FROM med WHERE arm = 0) c
    """,
    tags=("statistics", "causal-inference", "quantile", "experimentation"),
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effect at the median — the causal estimand
    the mean-based z-test/CUPED/DiD family cannot see (heavy-tailed
    spend makes means swing on whales; the median QTE is what a
    pricing experiment actually shifts for the TYPICAL customer).
    Per-customer lifetime spend is an exact cent integer; each arm's
    median is the (n+1)/2-th order statistic with a (value, custkey)
    tiebreak, selected by the range-bucketed exact rank
    (``operators.sampling.range_rank``, $1000 buckets): per-bucket
    row_number + broadcast cumulative offsets — NO arm-sized global
    sort, the same machinery the conformal and KLL queries use. The
    effect is one integer subtraction.
    Scale: one grouped pass to customer totals, then two
    bucket-partitioned rank windows whose offset frames are bounded
    by the price RANGE, not by N."""
    from data_seedling_spark.operators.sampling import range_rank

    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("arm:"), F.col("o_custkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
        .select("o_custkey", arm.alias("arm"), "cents")
    )

    def arm_median(df, label):
        n = df.agg(F.count("*").alias("n"))
        ranked = range_rank(
            df,
            "cents",
            ("o_custkey",),
            bucket_expr=F.floor(F.col("cents") / 100000),
        )
        return (
            ranked.crossJoin(F.broadcast(n))
            .where(F.col("rank") == F.expr("(n + 1) DIV 2"))
            .select(
                F.col("n").alias(f"n_{label}"),
                F.col("cents").alias(f"cents_{label}"),
            )
        )
    t = arm_median(per.where(F.col("arm") == 1), "treat")
    c = arm_median(per.where(F.col("arm") == 0), "ctrl")
    return t.crossJoin(F.broadcast(c)).select(
        F.col("n_treat").cast("long"),
        F.col("n_ctrl").cast("long"),
        F.round(F.col("cents_treat") / 100.0, 6).alias("median_treat"),
        F.round(F.col("cents_ctrl") / 100.0, 6).alias("median_ctrl"),
        F.round(
            (F.col("cents_treat") - F.col("cents_ctrl")) / 100.0, 6
        ).alias("qte"),
    )


#: BH critical lattice for m=5 tests at FDR alpha=0.05: the k-th
#: smallest p-value is rejected iff p_(k) <= alpha*k/m, i.e. iff
#: |z|_(k) >= PHI^-1(1 - alpha*k/(2m)). Literal protocol constants
#: shared by both engines (two-sided).
_BH_CRIT = (
    2.5758293035489004,  # k=1: 1 - 0.005
    2.3263478740408408,  # k=2: 1 - 0.010
    2.1700903775845606,  # k=3: 1 - 0.015
    2.0537489106318225,  # k=4: 1 - 0.020
    1.959963984540054,   # k=5: 1 - 0.025
)


@query(
    "multiple_testing_bh",
    oracle=f"""
    WITH lab AS (
      SELECT c.c_mktsegment AS seg,
             CAST(o.o_orderpriority = '1-URGENT' AS INT) AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), per AS (
      SELECT seg, COUNT(*) AS n, SUM(y) AS x FROM lab GROUP BY seg
    ), tot AS (
      SELECT SUM(n) AS tn, SUM(x) AS tx FROM per
    ), z AS (
      SELECT seg, n, x,
             (CAST(x AS DOUBLE) / n
              - CAST(tx - x AS DOUBLE) / (tn - n))
             / sqrt((CAST(tx AS DOUBLE) / tn)
                    * (1 - CAST(tx AS DOUBLE) / tn)
                    * (1.0 / n + 1.0 / (tn - n))) AS zval
      FROM per CROSS JOIN tot
    ), ranked AS (
      SELECT seg, n, x, zval,
             ROW_NUMBER() OVER (ORDER BY abs(zval) DESC, seg) AS rk
      FROM z
    ), crit AS (
      SELECT *,
             CASE rk WHEN 1 THEN {_BH_CRIT[0]!r} WHEN 2 THEN {_BH_CRIT[1]!r}
                     WHEN 3 THEN {_BH_CRIT[2]!r} WHEN 4 THEN {_BH_CRIT[3]!r}
                     ELSE {_BH_CRIT[4]!r} END AS zcrit
      FROM ranked
    ), kmax AS (
      SELECT COALESCE(MAX(CASE WHEN abs(zval) >= zcrit THEN rk END), 0)
               AS km
      FROM crit
    )
    SELECT c.seg AS segment, CAST(c.n AS BIGINT) AS n,
           CAST(c.x AS BIGINT) AS n_urgent,
           round(c.zval, 6) AS z, CAST(c.rk AS INT) AS rank,
           round(c.zcrit, 6) AS z_critical,
           CAST(c.rk <= k.km AS INT) AS rejected
    FROM crit c CROSS JOIN kmax k
    ORDER BY c.rk
    """,
    tags=("statistics", "multiple-testing", "experimentation"),
)
def multiple_testing_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control — what separates a metrics
    platform from a p-hacking machine: five simultaneous two-proportion
    z-tests (is each market segment's urgent-order rate different from
    the rest?) adjusted by the BH step-up rule. p-value sorting is
    equivalent to |z| sorting, so the rule is expressed on the z scale
    against a LITERAL critical lattice Φ⁻¹(1 − αk/2m) shared by both
    engines: reject every rank ≤ max{{k : |z|₍ₖ₎ ≥ crit_k}} — the
    step-up (which can rescue a test its own rank would fail) is one
    conditional MAX over the 5-row frame. z statistics are fixed
    double expressions over integer counts; the only windows live on
    the 5-row test frame.
    Scale: one fact join + 5-group count; the testing machinery is
    O(m), independent of data volume."""
    from pyspark.sql.window import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    lab = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    per = lab.groupBy("seg").agg(
        F.count("*").alias("n"), F.sum("y").alias("x")
    )
    tot = per.agg(F.sum("n").alias("tn"), F.sum("x").alias("tx"))
    p1 = F.col("x").cast("double") / F.col("n")
    p2 = (F.col("tx") - F.col("x")).cast("double") / (
        F.col("tn") - F.col("n")
    )
    pool = F.col("tx").cast("double") / F.col("tn")
    zval = (p1 - p2) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n") + 1.0 / (F.col("tn") - F.col("n")))
    )
    z = per.crossJoin(F.broadcast(tot)).select(
        "seg", "n", "x", zval.alias("zval")
    )
    ranked = z.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.abs("zval").desc(), "seg")),
    )
    crit_expr = (
        F.when(F.col("rk") == 1, F.lit(_BH_CRIT[0]))
        .when(F.col("rk") == 2, F.lit(_BH_CRIT[1]))
        .when(F.col("rk") == 3, F.lit(_BH_CRIT[2]))
        .when(F.col("rk") == 4, F.lit(_BH_CRIT[3]))
        .otherwise(F.lit(_BH_CRIT[4]))
    )
    crit = ranked.withColumn("zcrit", crit_expr)
    kmax = crit.agg(
        F.coalesce(
            F.max(F.when(F.abs("zval") >= F.col("zcrit"), F.col("rk"))),
            F.lit(0),
        ).alias("km")
    )
    return (
        crit.crossJoin(F.broadcast(kmax))
        .select(
            F.col("seg").alias("segment"),
            F.col("n").cast("long"),
            F.col("x").cast("long").alias("n_urgent"),
            F.round("zval", 6).alias("z"),
            F.col("rk").cast("int").alias("rank"),
            F.round("zcrit", 6).alias("z_critical"),
            (F.col("rk") <= F.col("km")).cast("int").alias("rejected"),
        )
        .orderBy("rank")
    )


_AMS_K = 16


def _ams_sign_sql(j: int) -> str:
    """±1 md5-coin sign for estimator ``j`` (shared literal protocol)."""
    return (
        f"(1 - 2 * (CAST('0x' || substr(md5('ams{j}:' "
        f"|| CAST(l_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 2))"
    )


@query(
    "ams_f2_sketch",
    oracle=f"""
    WITH sk AS (
      SELECT {", ".join(f"SUM({_ams_sign_sql(j)}) AS s{j}"
                        for j in range(_AMS_K))}
      FROM lineitem
    ), est AS (
      SELECT list_sort([{", ".join(f"s{j} * s{j}" for j in range(_AMS_K))}])
               AS ests
      FROM sk
    ), exact AS (
      SELECT SUM(c * c) AS f2 FROM (
        SELECT COUNT(*) AS c FROM lineitem GROUP BY l_partkey
      )
    )
    SELECT CAST(exact.f2 AS BIGINT) AS exact_f2,
           CAST(ests[{(_AMS_K + 1) // 2}] AS BIGINT) AS ams_estimate,
           CAST({_AMS_K} AS INT) AS n_estimators,
           round(abs(CAST(ests[{(_AMS_K + 1) // 2}] AS DOUBLE) - exact.f2)
                 / exact.f2, 6) AS rel_error
    FROM est CROSS JOIN exact
    """,
    tags=("sketch", "streaming", "second-moment"),
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch (Alon–Matias–Szegedy, the Gödel-prize
    origin of the streaming-sketch field): estimate F₂ = Σ freq(key)²
    — the self-join size, the quantity a query optimizer needs before
    choosing a join strategy — from 16 integers instead of a
    per-key table. Each estimator keeps one running sum of md5-coin ±1
    signs (a 4-universal-enough fixed hash family shared by both
    engines), its square is an unbiased F₂ estimate, and the median of
    the 16 squares is the reported value. Everything is integer
    arithmetic end to end — the signed sums, the squares, the sorted
    median — so the sketch is bit-identical across engines (the ONLY
    exactly-reproducible sketch shape: sums commute). The exact F₂ is
    computed alongside for the reported relative error.
    Scale: one map-side-combinable pass carrying 16 longs per
    partition, merge = addition — the canonical mergeable sketch; the
    exact leg is one grouped count (which is exactly what the sketch
    exists to avoid at 100 TB — reported here as the oracle of its
    own error)."""

    def sign(j: int):
        return 1 - 2 * (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"ams{j}:"),
                            F.col("l_partkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        )

    from data_seedling_spark.operators.dedup import scale_out

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    # 16 md5 draws per row: widen the scan so the per-row hash CPU is
    # not bound to the file split count.
    sk = scale_out(li).agg(
        *[F.sum(sign(j)).alias(f"s{j}") for j in range(_AMS_K)]
    )
    ests = F.sort_array(
        F.array(*[(F.col(f"s{j}") * F.col(f"s{j}")) for j in range(_AMS_K)])
    )
    med = ests[(_AMS_K + 1) // 2 - 1]
    exact = (
        li.groupBy("l_partkey")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
    )
    return (
        sk.select(med.alias("ams_estimate"))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("f2").cast("long").alias("exact_f2"),
            F.col("ams_estimate").cast("long"),
            F.lit(_AMS_K).cast("int").alias("n_estimators"),
            F.round(
                F.abs(
                    F.col("ams_estimate").cast("double") - F.col("f2")
                )
                / F.col("f2"),
                6,
            ).alias("rel_error"),
        )
    )


@query(
    "subclassification_ate",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             COUNT(*) AS n_orders,
             CAST(MIN(EXTRACT(year FROM o_orderdate)) <= 1996 AS INT) AS t,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    ), banded AS (
      SELECT LEAST((n_orders - 1) // 8, 4) AS band, t, spend FROM per
    ), cells AS (
      SELECT band,
             COUNT(CASE WHEN t = 1 THEN 1 END) AS nt,
             COUNT(CASE WHEN t = 0 THEN 1 END) AS nc,
             SUM(CASE WHEN t = 1 THEN spend
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS st,
             SUM(CASE WHEN t = 0 THEN spend
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS sc
      FROM banded GROUP BY band
    ), diffs AS (
      SELECT band, nt, nc,
             CAST(round(CAST(st AS DOUBLE) / nt
                        - CAST(sc AS DOUBLE) / nc, 6)
                  AS DECIMAL(18,6)) AS diff
      FROM cells WHERE nt > 0 AND nc > 0
    ), ate AS (
      SELECT CAST(SUM(diff * (nt + nc)) AS DOUBLE) / SUM(nt + nc) AS a
      FROM diffs
    )
    SELECT CAST(d.band AS INT) AS band,
           CAST(d.nt AS BIGINT) AS n_treat, CAST(d.nc AS BIGINT) AS n_ctrl,
           round(CAST(d.diff AS DOUBLE), 6) AS diff_spend,
           round(ate.a, 6) AS ate_spend
    FROM diffs d CROSS JOIN ate
    ORDER BY d.band
    """,
    tags=("statistics", "causal-inference", "observational"),
)
def subclassification_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subclassification on a confounder (Cochran 1968 — the blocking
    estimator propensity-score stratification generalizes): the
    observational contrast \"do early-adopter customers (first order ≤
    1996) spend more?\" is confounded by order count (longer tenure ⇒
    both earlier first order and more spend), so customers are blocked
    into five order-count bands and the treated-vs-control spend gap
    is taken WITHIN bands, then combined weighted by band size —
    adjusting away the confounder's between-band variation. Per-band
    diffs land on the 1e-6 decimal grid before the weighted
    combination (decimal × integer sums — addition-order-free), so the
    ATE is hash-exact; bands missing either arm drop out, as the
    estimator requires. One grouped pass to customer aggregates, one
    5-cell conditional aggregate — no window wider than the band
    frame, at any scale."""
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            (F.min(F.year("o_orderdate")) <= 1996).cast("int").alias("t"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")).alias(
                "spend"
            ),
        )
    )
    zero = F.lit("0.00").cast("decimal(18,2)")
    banded = per.select(
        F.least(F.expr("(n_orders - 1) DIV 8"), F.lit(4)).alias("band"),
        "t",
        "spend",
    )
    cells = banded.groupBy("band").agg(
        F.count(F.when(F.col("t") == 1, 1)).alias("nt"),
        F.count(F.when(F.col("t") == 0, 1)).alias("nc"),
        F.sum(F.when(F.col("t") == 1, F.col("spend")).otherwise(zero)).alias(
            "st"
        ),
        F.sum(F.when(F.col("t") == 0, F.col("spend")).otherwise(zero)).alias(
            "sc"
        ),
    )
    diffs = cells.where((F.col("nt") > 0) & (F.col("nc") > 0)).select(
        "band",
        "nt",
        "nc",
        F.round(
            F.col("st").cast("double") / F.col("nt")
            - F.col("sc").cast("double") / F.col("nc"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("diff"),
    )
    ate = diffs.agg(
        (
            F.sum(F.col("diff") * (F.col("nt") + F.col("nc"))).cast("double")
            / F.sum(F.col("nt") + F.col("nc"))
        ).alias("a")
    )
    return (
        diffs.crossJoin(F.broadcast(ate))
        .select(
            F.col("band").cast("int"),
            F.col("nt").cast("long").alias("n_treat"),
            F.col("nc").cast("long").alias("n_ctrl"),
            F.round(F.col("diff").cast("double"), 6).alias("diff_spend"),
            F.round("a", 6).alias("ate_spend"),
        )
        .orderBy("band")
    )


def _ipf_round_sql(i: int) -> str:
    """One unrolled IPF round: scale cell weights to hit the segment
    margin, re-grid to 1e-6 decimals, then the region margin."""
    return f""", s{i} AS (
      SELECT seg, SUM(w) AS m FROM w{2 * i - 2} GROUP BY seg
    ), w{2 * i - 1} AS (
      SELECT c.seg, c.reg, c.n,
             CAST(round(CAST(c.w AS DOUBLE) * t.tgt / CAST(s.m AS DOUBLE), 6)
                  AS DECIMAL(28,6)) AS w
      FROM w{2 * i - 2} c
      JOIN s{i} s ON s.seg = c.seg
      CROSS JOIN tgt t
    ), r{i} AS (
      SELECT reg, SUM(w) AS m FROM w{2 * i - 1} GROUP BY reg
    ), w{2 * i} AS (
      SELECT c.seg, c.reg, c.n,
             CAST(round(CAST(c.w AS DOUBLE) * t.tgt / CAST(r.m AS DOUBLE), 6)
                  AS DECIMAL(28,6)) AS w
      FROM w{2 * i - 1} c
      JOIN r{i} r ON r.reg = c.reg
      CROSS JOIN tgt t
    )"""


@query(
    "raking_ipf_weights",
    oracle=f"""
    WITH cells AS (
      SELECT c.c_mktsegment AS seg, r.r_name AS reg,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY seg, reg
    ), tgt AS (
      SELECT CAST(SUM(n) AS DOUBLE) / 5 AS tgt FROM cells
    ), w0 AS (
      SELECT seg, reg, n, CAST(n AS DECIMAL(28,6)) AS w FROM cells
    ){_ipf_round_sql(1)}{_ipf_round_sql(2)}
    SELECT seg AS segment, reg AS region, n,
           round(CAST(w AS DOUBLE) / n, 6) AS rake_weight,
           round(CAST(w AS DOUBLE), 6) AS weighted_n
    FROM w4 ORDER BY segment, region
    """,
    tags=("statistics", "survey", "weighting"),
)
def raking_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking / iterative proportional fitting (Deming &
    Stephan 1940): adjust per-cell weights of the (segment × region)
    customer table so BOTH margins hit uniform targets (total/5 per
    segment and per region) — the post-stratification every survey
    and every panel-imbalance correction runs. Two IPF rounds, each a
    pair of margin-scalings; after every scaling the weights re-grid
    to 1e-6 decimals (round → DECIMAL), so margin sums are exact
    decimal arithmetic and both engines walk the identical weight
    trajectory — the multiplicative updates are single double ops
    between grid points, bit-identical. Returns per-cell rake weights
    and weighted counts.
    Scale: the data-sized stage is one grouped count to the 25-cell
    frame; the IPF iterations live entirely on that broadcast-sized
    frame no matter how many customers."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cells = (
        cust.join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("reg")
        )
        .agg(F.count("*").alias("n"))
    )
    tgt = cells.agg((F.sum("n").cast("double") / 5).alias("tgt"))
    w = cells.select(
        "seg", "reg", "n", F.col("n").cast("decimal(28,6)").alias("w")
    )
    for _ in range(2):
        for margin in ("seg", "reg"):
            m = w.groupBy(margin).agg(F.sum("w").alias("m"))
            w = (
                w.join(F.broadcast(m), margin)
                .crossJoin(F.broadcast(tgt))
                .select(
                    "seg",
                    "reg",
                    "n",
                    F.round(
                        F.col("w").cast("double")
                        * F.col("tgt")
                        / F.col("m").cast("double"),
                        6,
                    )
                    .cast("decimal(28,6)")
                    .alias("w"),
                )
            )
    return w.select(
        F.col("seg").alias("segment"),
        F.col("reg").alias("region"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("w").cast("double") / F.col("n"), 6).alias(
            "rake_weight"
        ),
        F.round(F.col("w").cast("double"), 6).alias("weighted_n"),
    ).orderBy("segment", "region")


@query(
    "fifo_lot_matching",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS p, CAST(l_quantity AS BIGINT) AS q,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS lo
      FROM lineitem WHERE l_linenumber % 2 = 0
    ), demand AS (
      SELECT l_partkey AS p, CAST(l_quantity AS BIGINT) AS q,
             SUM(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS lo
      FROM lineitem WHERE l_linenumber % 2 = 1
    ), s AS (
      SELECT p, COALESCE(lo, 0) AS s0, COALESCE(lo, 0) + q AS s1 FROM supply
    ), d AS (
      SELECT p, COALESCE(lo, 0) AS d0, COALESCE(lo, 0) + q AS d1 FROM demand
    ), matches AS (
      SELECT s.p,
             LEAST(s.s1, d.d1) - GREATEST(s.s0, d.d0) AS m
      FROM s JOIN d ON d.p = s.p AND s.s0 < d.d1 AND d.d0 < s.s1
    ), totals AS (
      SELECT (SELECT SUM(s1 - s0) FROM s) AS tot_supply,
             (SELECT SUM(d1 - d0) FROM d) AS tot_demand,
             (SELECT COUNT(*) FROM s) AS n_lots,
             (SELECT COUNT(*) FROM d) AS n_demands,
             (SELECT COUNT(*) FROM matches) AS n_matches,
             (SELECT SUM(m) FROM matches) AS matched
    )
    SELECT CAST(n_lots AS BIGINT) AS n_lots,
           CAST(n_demands AS BIGINT) AS n_demands,
           CAST(n_matches AS BIGINT) AS n_matches,
           CAST(matched AS BIGINT) AS matched_qty,
           CAST(tot_supply - matched AS BIGINT) AS unmatched_supply,
           CAST(tot_demand - matched AS BIGINT) AS unmatched_demand
    FROM totals
    """,
    tags=("allocation", "fifo", "range-join", "window"),
)
def fifo_lot_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the inventory/cost-basis allocation every
    fintech and WMS ledger runs, solved the distributed way: instead
    of a sequential consume loop, supply lots and demand rows (here
    the even/odd line-number split of each part's shipments, in
    ship-date order) become INTERVALS on each part's cumulative-
    quantity axis, and FIFO matching is exactly their pairwise
    overlap: matched(l, d) = min(ends) − max(starts) on
    s0 < d1 ∧ d0 < s1. The sequential dependency disappears into two
    per-part cumulative windows plus one within-part range join whose
    match count is LINEAR per part (interval chains interleave; each
    lot overlaps O(1 + skew) demands). Quantities are integers end to
    end; conservation (matched ≤ min(supply, demand), with equality
    on the shared prefix) is pytest-asserted.
    Scale: windows and the join all key on l_partkey — one shuffle
    family, no global sequence point anywhere."""
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p"),
        F.col("l_quantity").cast("long").alias("q"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = W.partitionBy("p").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(W.unboundedPreceding, -1)

    def intervals(df, a, b):
        lo = F.coalesce(F.sum("q").over(w), F.lit(0))
        return df.select(
            "p", lo.alias(a), (lo + F.col("q")).alias(b)
        )

    s = intervals(li.where(F.col("l_linenumber") % 2 == 0), "s0", "s1")
    d = intervals(li.where(F.col("l_linenumber") % 2 == 1), "d0", "d1")
    matches = s.join(
        d.withColumnRenamed("p", "pd"),
        (F.col("pd") == F.col("p"))
        & (F.col("s0") < F.col("d1"))
        & (F.col("d0") < F.col("s1")),
    ).select(
        (
            F.least("s1", "d1") - F.greatest("s0", "d0")
        ).alias("m")
    )
    ts = s.agg(
        F.sum(F.col("s1") - F.col("s0")).alias("tot_supply"),
        F.count("*").alias("n_lots"),
    )
    td = d.agg(
        F.sum(F.col("d1") - F.col("d0")).alias("tot_demand"),
        F.count("*").alias("n_demands"),
    )
    tm = matches.agg(
        F.count("*").alias("n_matches"), F.sum("m").alias("matched")
    )
    return (
        ts.crossJoin(F.broadcast(td))
        .crossJoin(F.broadcast(tm))
        .select(
            F.col("n_lots").cast("long"),
            F.col("n_demands").cast("long"),
            F.col("n_matches").cast("long"),
            F.col("matched").cast("long").alias("matched_qty"),
            (F.col("tot_supply") - F.col("matched"))
            .cast("long")
            .alias("unmatched_supply"),
            (F.col("tot_demand") - F.col("matched"))
            .cast("long")
            .alias("unmatched_demand"),
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {PARTSUPP_CTE}, top_nation AS (
      SELECT s_nationkey FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY s_nationkey, n_name
      ORDER BY COUNT(*) DESC, n_name LIMIT 1
    ), german AS (
      SELECT ps_partkey,
             CAST(ps_supplycost AS DECIMAL(18,2)) * ps_availqty AS v
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN top_nation t ON t.s_nationkey = supplier.s_nationkey
    ), per AS (
      SELECT ps_partkey, SUM(v) AS value FROM german GROUP BY ps_partkey
    ), tot AS (
      SELECT SUM(v) AS t FROM german
    )
    SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey,
           round(CAST(value AS DOUBLE), 2) AS part_value
    FROM per CROSS JOIN tot
    WHERE CAST(value AS DOUBLE) > CAST(t AS DOUBLE) * 0.001
    ORDER BY CAST(value AS DOUBLE) DESC, ps_partkey
    """,
    tags=("tpch", "aggregation", "having"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) over the synthetic
    partsupp: the value of each part held by the LARGEST supplier
    nation (self-chosen by count with a name tiebreak — the spec's
    GERMANY role, robust to the testdata's nation draw)
    (Σ supplycost × availqty), keeping parts whose value exceeds a
    fixed fraction (0.001) of the national total — the classic
    scalar-subquery HAVING shape. Products sit on the cent grid
    (decimal × int), so both the per-part values and the grand total
    are exact decimal sums; the fraction comparison and the ordering
    are single double ops on identical inputs. Completes the
    partsupp-dependent TPC-H family (Q15, Q16, Q20 → Q11).
    Scale: partsupp expands as a narrow broadcast map over the part
    scan; one grouped sum + a 1-row total broadcast — no shuffle
    beyond the part-key combine."""
    ps = synthetic_partsupp(spark, sf_dir)
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    top_nation = (
        supplier.join(
            F.broadcast(nation),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .groupBy("s_nationkey", "n_name")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "n_name")
        .limit(1)
        .select(F.col("s_nationkey").alias("tk"))
    )
    german = (
        ps.join(F.broadcast(supplier), ps.ps_suppkey == supplier.s_suppkey)
        .join(F.broadcast(top_nation), F.col("s_nationkey") == F.col("tk"))
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost").cast("decimal(18,2)")
                * F.col("ps_availqty")
            ).alias("v"),
        )
    )
    per = german.groupBy("ps_partkey").agg(F.sum("v").alias("value"))
    tot = german.agg(F.sum("v").alias("t"))
    return (
        per.crossJoin(F.broadcast(tot))
        .where(
            F.col("value").cast("double") > F.col("t").cast("double") * 0.001
        )
        .select(
            F.col("ps_partkey").cast("long"),
            F.round(F.col("value").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "ams_join_size_estimate",
    oracle=f"""
    WITH a AS (
      SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 0
    ), b AS (
      SELECT l_partkey FROM lineitem WHERE l_orderkey % 2 = 1
    ), ska AS (
      SELECT {", ".join(f"SUM({_ams_sign_sql(j)}) AS s{j}"
                        for j in range(_AMS_K))}
      FROM a
    ), skb AS (
      SELECT {", ".join(f"SUM({_ams_sign_sql(j)}) AS s{j}"
                        for j in range(_AMS_K))}
      FROM b
    ), est AS (
      SELECT list_sort([{", ".join(f"ska.s{j} * skb.s{j}"
                                   for j in range(_AMS_K))}]) AS ests
      FROM ska CROSS JOIN skb
    ), exact AS (
      SELECT SUM(ca * cb) AS jsz FROM (
        SELECT a.l_partkey, COUNT(*) AS ca FROM a GROUP BY a.l_partkey
      ) fa JOIN (
        SELECT b.l_partkey, COUNT(*) AS cb FROM b GROUP BY b.l_partkey
      ) fb ON fa.l_partkey = fb.l_partkey
    )
    SELECT CAST(exact.jsz AS BIGINT) AS exact_join_size,
           CAST(ests[{(_AMS_K + 1) // 2}] AS BIGINT) AS ams_estimate,
           CAST({_AMS_K} AS INT) AS n_estimators,
           round(abs(CAST(ests[{(_AMS_K + 1) // 2}] AS DOUBLE) - exact.jsz)
                 / exact.jsz, 6) AS rel_error
    FROM est CROSS JOIN exact
    """,
    tags=("sketch", "join-cardinality", "optimizer"),
)
def ams_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS inner-product join-size estimation — what a cost-based
    optimizer wants BEFORE committing to a join strategy: |A ⋈ B| =
    Σ_k freq_A(k)·freq_B(k) estimated from two 16-integer sketches
    whose dot product is unbiased for the true size (the same ±1 sign
    family as ams_f2_sketch, so sketches built independently on each
    side compose — the streaming property that makes this usable on
    ingest). Median-of-16 products reported against the exact join
    size. Integer arithmetic end to end: signed sums, products,
    sorted median — bit-identical across engines.
    Scale: each side is one map-side-combinable 16-long pass; the
    estimate itself is a 1×1 cross of two single-row frames. The
    exact leg (grouped counts + key join) is precisely the work the
    sketch avoids at 100 TB."""
    from data_seedling_spark.operators.dedup import scale_out

    def sign(j: int):
        return 1 - 2 * (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"ams{j}:"),
                            F.col("l_partkey").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
        )

    li = scale_out(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
    )
    a = li.where(F.col("l_orderkey") % 2 == 0).select("l_partkey")
    b = li.where(F.col("l_orderkey") % 2 == 1).select("l_partkey")
    ska = a.agg(*[F.sum(sign(j)).alias(f"a{j}") for j in range(_AMS_K)])
    skb = b.agg(*[F.sum(sign(j)).alias(f"b{j}") for j in range(_AMS_K)])
    ests = F.sort_array(
        F.array(
            *[(F.col(f"a{j}") * F.col(f"b{j}")) for j in range(_AMS_K)]
        )
    )
    med = ests[(_AMS_K + 1) // 2 - 1]
    fa = a.groupBy("l_partkey").agg(F.count("*").alias("ca"))
    fb = b.groupBy("l_partkey").agg(F.count("*").alias("cb"))
    exact = fa.join(fb, "l_partkey").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("jsz")
    )
    return (
        ska.crossJoin(F.broadcast(skb))
        .select(med.alias("ams_estimate"))
        .crossJoin(F.broadcast(exact))
        .select(
            F.col("jsz").cast("long").alias("exact_join_size"),
            F.col("ams_estimate").cast("long"),
            F.lit(_AMS_K).cast("int").alias("n_estimators"),
            F.round(
                F.abs(
                    F.col("ams_estimate").cast("double") - F.col("jsz")
                )
                / F.col("jsz"),
                6,
            ).alias("rel_error"),
        )
    )


@query(
    "nelson_aalen_hazard",
    oracle="""
    WITH lifetimes AS (
      SELECT o_custkey,
             CAST(floor(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                        / 30.0) AS BIGINT) AS dur_m,
             CAST(MAX(o_orderdate) >= TIMESTAMP '2001-02-01' AS INT)
               AS censored
      FROM orders GROUP BY o_custkey
    ), by_t AS (
      SELECT dur_m,
             CAST(SUM(1 - censored) AS BIGINT) AS d_churn,
             CAST(SUM(censored) AS BIGINT) AS c_censored
      FROM lifetimes GROUP BY dur_m
    ), risk AS (
      SELECT dur_m, d_churn, c_censored,
             CAST(SUM(d_churn + c_censored) OVER (
                    ORDER BY dur_m DESC) AS BIGINT) AS n_risk
      FROM by_t
    ), terms AS (
      SELECT dur_m, d_churn, c_censored, n_risk,
             CAST(round(CAST(d_churn AS DOUBLE) / n_risk, 9)
                  AS DECIMAL(28,9)) AS hterm,
             CAST(round(CAST(d_churn AS DOUBLE)
                        / (CAST(n_risk AS DOUBLE) * n_risk), 12)
                  AS DECIMAL(28,12)) AS vterm
      FROM risk
    )
    SELECT dur_m, n_risk, d_churn,
           round(CAST(SUM(hterm) OVER (ORDER BY dur_m) AS DOUBLE), 6)
             AS cum_hazard,
           round(exp(-CAST(SUM(hterm) OVER (ORDER BY dur_m) AS DOUBLE)), 6)
             AS surv_from_hazard,
           round(sqrt(CAST(SUM(vterm) OVER (ORDER BY dur_m) AS DOUBLE)), 6)
             AS hazard_se
    FROM terms
    ORDER BY dur_m
    """,
    tags=("survival-analysis", "nelson-aalen", "hazard", "cohort"),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard — Kaplan-Meier's additive twin
    and the quantity whose increments ARE the per-period churn rates
    (what a finance team plugs into LTV): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over
    the same censored customer lifetimes as kaplan_meier_retention,
    with the Poisson-variance standard error Σ dᵢ/nᵢ² alongside and
    exp(−H) as the Breslow survival estimate (≈ the KM curve — the
    agreement is pytest-asserted). Cross-engine exactness of running
    SUMS of ratios: each dᵢ/nᵢ term rounds to the 1e-9 grid (1e-12
    for the variance term) and accumulates as DECIMAL — order-free —
    with one exp/sqrt at the end.
    Scale: identical shape to KM — one grouped pass to event times,
    a descending cumulative window on the time frame (calendar-sized,
    not data-sized)."""
    from pyspark.sql.window import Window as W

    lifetimes = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.floor(
                F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) / 30.0
            )
            .cast("long")
            .alias("dur_m"),
            (
                F.max("o_orderdate")
                >= F.lit("2001-02-01").cast("timestamp")
            )
            .cast("int")
            .alias("censored"),
        )
    )
    by_t = lifetimes.groupBy("dur_m").agg(
        F.sum(1 - F.col("censored")).alias("d_churn"),
        F.sum("censored").alias("c_censored"),
    )
    w_desc = W.orderBy(F.col("dur_m").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = by_t.select(
        "dur_m",
        "d_churn",
        F.sum(F.col("d_churn") + F.col("c_censored"))
        .over(w_desc)
        .alias("n_risk"),
    )
    terms = risk.select(
        "dur_m",
        "n_risk",
        "d_churn",
        F.round(F.col("d_churn").cast("double") / F.col("n_risk"), 9)
        .cast("decimal(28,9)")
        .alias("hterm"),
        F.round(
            F.col("d_churn").cast("double")
            / (F.col("n_risk").cast("double") * F.col("n_risk")),
            12,
        )
        .cast("decimal(28,12)")
        .alias("vterm"),
    )
    w_asc = W.orderBy("dur_m").rowsBetween(W.unboundedPreceding, W.currentRow)
    ch = F.sum("hterm").over(w_asc).cast("double")
    cv = F.sum("vterm").over(w_asc).cast("double")
    return terms.select(
        "dur_m",
        "n_risk",
        "d_churn",
        F.round(ch, 6).alias("cum_hazard"),
        F.round(F.exp(-ch), 6).alias("surv_from_hazard"),
        F.round(F.sqrt(cv), 6).alias("hazard_se"),
    ).orderBy("dur_m")


#: O'Brien–Fleming-shaped group-sequential boundary for K=5 looks at
#: two-sided alpha=0.05: z_k = z_K * sqrt(K/k) with z_K = 2.040 (the
#: canonical table's final-look value). Literal protocol constants.
_OBF_ZK = 2.040


@query(
    "group_sequential_obf",
    oracle=f"""
    WITH marked AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             CAST('0x' || substr(md5('gs:' || CAST(o_orderkey AS VARCHAR)),
                                 1, 8) AS BIGINT) % 2 AS arm,
             CAST(o_orderpriority = '1-URGENT' AS INT) AS y
      FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1999
    ), per AS (
      SELECT yr,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS xa,
             SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS xb
      FROM marked GROUP BY yr
    ), looks AS (
      SELECT yr,
             ROW_NUMBER() OVER (ORDER BY yr) AS k,
             SUM(na) OVER (ORDER BY yr) AS na,
             SUM(nb) OVER (ORDER BY yr) AS nb,
             SUM(xa) OVER (ORDER BY yr) AS xa,
             SUM(xb) OVER (ORDER BY yr) AS xb
      FROM per
    ), z AS (
      SELECT yr, k, na, nb, xa, xb,
             (CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
             / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                    * (1 - CAST(xa + xb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)) AS zval,
             {_OBF_ZK!r} * sqrt(5.0 / k) AS zbound
      FROM looks
    ), stopped AS (
      SELECT COALESCE(MIN(CASE WHEN abs(zval) >= zbound THEN k END), 0)
               AS stop_k
      FROM z
    )
    SELECT CAST(z.k AS INT) AS look, CAST(z.yr AS INT) AS year,
           CAST(z.na AS BIGINT) AS n_treat, CAST(z.nb AS BIGINT) AS n_ctrl,
           round(z.zval, 6) AS z,
           round(z.zbound, 6) AS z_boundary,
           CAST(abs(z.zval) >= z.zbound AS INT) AS crossed,
           CAST(s.stop_k AS INT) AS first_stop_look
    FROM z CROSS JOIN stopped s
    ORDER BY look
    """,
    tags=("statistics", "experimentation", "sequential-testing"),
)
def group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential testing with O'Brien–Fleming boundaries — how
    a mature experimentation platform peeks at a running A/B WITHOUT
    inflating false positives: five calendar looks (cumulative through
    each year ≤1999), a two-proportion z at each, compared against the
    spending boundary z_K·√(K/k) (very conservative early, nominal at
    the final look — the canonical OBF shape as literal protocol
    constants). Reports each look's z, its boundary, whether it
    crossed, and the first stopping look (0 = ran to completion).
    Under the md5-coin null assignment the expected outcome is no
    early stop — the guard this procedure exists to provide. All
    counts are integers via one grouped pass + a 5-row cumulative
    window; z and boundaries are fixed double expressions — hash-exact.
    Scale: one map-side-combinable aggregate; the sequential machinery
    is O(looks)."""
    from pyspark.sql.window import Window as W

    marked = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") <= 1999)
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("gs:"),
                                F.col("o_orderkey").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2
            ).alias("arm"),
            (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
        )
    )
    per = marked.groupBy("yr").agg(
        F.sum((F.col("arm") == 1).cast("long")).alias("na"),
        F.sum((F.col("arm") == 0).cast("long")).alias("nb"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias("xa"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias("xb"),
    )
    w = W.orderBy("yr").rowsBetween(W.unboundedPreceding, W.currentRow)
    looks = per.select(
        "yr",
        F.row_number().over(W.orderBy("yr")).alias("k"),
        F.sum("na").over(w).alias("na"),
        F.sum("nb").over(w).alias("nb"),
        F.sum("xa").over(w).alias("xa"),
        F.sum("xb").over(w).alias("xb"),
    )
    pa = F.col("xa").cast("double") / F.col("na")
    pb = F.col("xb").cast("double") / F.col("nb")
    pool = (F.col("xa") + F.col("xb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    zval = (pa - pb) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    zbound = F.lit(_OBF_ZK) * F.sqrt(F.lit(5.0) / F.col("k"))
    z = looks.select(
        "yr", "k", "na", "nb",
        zval.alias("zval"), zbound.alias("zbound"),
    )
    stopped = z.agg(
        F.coalesce(
            F.min(F.when(F.abs("zval") >= F.col("zbound"), F.col("k"))),
            F.lit(0),
        ).alias("stop_k")
    )
    return (
        z.crossJoin(F.broadcast(stopped))
        .select(
            F.col("k").cast("int").alias("look"),
            F.col("yr").cast("int").alias("year"),
            F.col("na").cast("long").alias("n_treat"),
            F.col("nb").cast("long").alias("n_ctrl"),
            F.round("zval", 6).alias("z"),
            F.round("zbound", 6).alias("z_boundary"),
            (F.abs("zval") >= F.col("zbound")).cast("int").alias("crossed"),
            F.col("stop_k").cast("int").alias("first_stop_look"),
        )
        .orderBy("look")
    )


@query(
    "mann_kendall_trend",
    oracle="""
    WITH pts AS (
      SELECT CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS yc
      FROM orders GROUP BY x
    ), s AS (
      SELECT SUM(CASE WHEN b.yc > a.yc THEN 1
                      WHEN b.yc < a.yc THEN -1 ELSE 0 END) AS s,
             COUNT(*) AS n_pairs
      FROM pts a JOIN pts b ON a.x < b.x
    ), n AS (
      SELECT COUNT(*) AS n FROM pts
    )
    SELECT CAST(n.n AS BIGINT) AS n_points,
           CAST(s.s AS BIGINT) AS kendall_s,
           round(CAST(s.s AS DOUBLE)
                 / ((CAST(n.n AS DOUBLE) * (n.n - 1)) / 2), 6) AS tau,
           round((CAST(s.s AS DOUBLE)
                  - CASE WHEN s.s > 0 THEN 1
                         WHEN s.s < 0 THEN -1 ELSE 0 END)
                 / sqrt(CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
                        / 18), 6) AS z,
           CAST(abs((CAST(s.s AS DOUBLE)
                     - CASE WHEN s.s > 0 THEN 1
                            WHEN s.s < 0 THEN -1 ELSE 0 END)
                    / sqrt(CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
                           / 18)) > 1.959963984540054 AS INT)
             AS trend_significant
    FROM s CROSS JOIN n
    """,
    tags=("statistics", "time-series", "nonparametric", "trend"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test — the significance companion to the
    Theil–Sen slope (together they are THE standard nonparametric
    trend toolkit): S = Σ_{i<j} sign(yⱼ − yᵢ) over monthly revenue
    cents, Kendall's τ = S / C(n,2), and the continuity-corrected
    normal z against the no-ties variance n(n−1)(2n+5)/18 (monthly
    cent totals never tie in practice; cent integers make the sign
    comparisons exact, so S is an exact integer in both engines).
    Distribution-free: no normality assumption an OLS t-test would
    need. Scale: the fact table collapses to ~80 monthly integers in
    one map-side pass; the O(months²) sign-pair frame is
    calendar-sized forever."""
    pts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            )
            .cast("long")
            .alias("x")
        )
        .agg(
            (F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
    )
    a = pts.select(F.col("x").alias("x1"), F.col("yc").alias("y1"))
    b = pts.select(F.col("x").alias("x2"), F.col("yc").alias("y2"))
    s = a.join(b, F.col("x1") < F.col("x2")).agg(
        F.sum(
            F.when(F.col("y2") > F.col("y1"), 1)
            .when(F.col("y2") < F.col("y1"), -1)
            .otherwise(0)
        ).alias("s")
    )
    n = pts.agg(F.count("*").alias("n"))
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    corr = F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    z = (sd - corr) / F.sqrt(nd * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18)
    return s.crossJoin(F.broadcast(n)).select(
        F.col("n").cast("long").alias("n_points"),
        F.col("s").cast("long").alias("kendall_s"),
        F.round(sd / ((nd * (F.col("n") - 1)) / 2), 6).alias("tau"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > F.lit(1.959963984540054))
        .cast("int")
        .alias("trend_significant"),
    )


@query(
    "pettitt_changepoint",
    oracle="""
    WITH pts AS (
      SELECT CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS yc
      FROM orders GROUP BY x
    ), vals AS (
      SELECT yc, COUNT(*) AS cnt FROM pts GROUP BY yc
    ), ranks AS (
      SELECT yc,
             2 * COALESCE(SUM(cnt) OVER (ORDER BY yc
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS r2
      FROM vals
    ), u AS (
      SELECT p.x AS t,
             ROW_NUMBER() OVER (ORDER BY p.x)
               * (1 + (SELECT COUNT(*) FROM pts))
               - SUM(r.r2) OVER (ORDER BY p.x) AS ut
      FROM pts p JOIN ranks r ON r.yc = p.yc
    ), best AS (
      SELECT t, ut FROM u ORDER BY abs(ut) DESC, t LIMIT 1
    ), n AS (SELECT COUNT(*) AS n FROM pts)
    SELECT CAST(best.t AS BIGINT) AS change_month,
           CAST(best.ut AS BIGINT) AS u_stat,
           CAST(n.n AS BIGINT) AS n_points,
           round(2 * exp(-6.0 * best.ut * best.ut
                         / (CAST(n.n AS DOUBLE) * n.n * n.n
                            + CAST(n.n AS DOUBLE) * n.n)), 6)
             AS p_approx
    FROM best CROSS JOIN n
    """,
    tags=("statistics", "time-series", "changepoint", "nonparametric"),
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint test — the rank-based answer to \"did the
    level of this series shift, and when?\" that the mean-based CUSUM
    query cannot give distribution-free: U_t = Σ_{i≤t<j} sign(yⱼ−yᵢ)
    over monthly revenue, the argmax |U_t| locates the most likely
    break (with a time tiebreak) and 2·exp(−6U²/(n³+n²)) approximates
    its significance. Every U_t is an exact integer via the midrank
    identity U_t = t(n+1) − Σ_{i≤t} 2Rᵢ (doubled midranks keep ties on
    the integer grid), so the whole statistic is two cumulative windows
    over the month frame — O(n log n) where the naive straddling-pair
    rollup is calendar-QUADRATIC (measured 4.2× at the 10× probe, now
    linear).
    Scale: one grouped pass to months; everything after is metadata-
    sized regardless of corpus volume."""
    pts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            )
            .cast("long")
            .alias("x")
        )
        .agg(
            (F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
        .localCheckpoint(eager=False)
    )
    from pyspark.sql.window import Window as W

    vals = pts.groupBy("yc").agg(F.count("*").alias("cnt"))
    wv = W.orderBy("yc").rowsBetween(W.unboundedPreceding, -1)
    ranks = vals.select(
        "yc",
        (
            2 * F.coalesce(F.sum("cnt").over(wv), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("r2"),
    )
    n = pts.agg(F.count("*").alias("n"))
    wx = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    u = (
        pts.join(F.broadcast(ranks), "yc")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("x").alias("t"),
            (
                F.row_number().over(W.orderBy("x"))
                * (1 + F.col("n"))
                - F.sum("r2").over(wx)
            ).alias("ut"),
        )
    )
    best = u.orderBy(F.abs("ut").desc(), "t").limit(1)
    nd = F.col("n").cast("double")
    ud = F.col("ut").cast("double")
    return best.crossJoin(F.broadcast(n)).select(
        F.col("t").cast("long").alias("change_month"),
        F.col("ut").cast("long").alias("u_stat"),
        F.col("n").cast("long").alias("n_points"),
        F.round(
            2
            * F.exp(
                -6.0 * ud * ud / (nd * F.col("n") * F.col("n") + nd * F.col("n"))
            ),
            6,
        ).alias("p_approx"),
    )


@query(
    "logrank_test_survival",
    oracle="""
    WITH lifetimes AS (
      SELECT o_custkey,
             CAST('0x' || substr(md5('arm:' || CAST(o_custkey AS VARCHAR)),
                                 1, 8) AS BIGINT) % 2 AS arm,
             CAST(floor(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                        / 30.0) AS BIGINT) AS dur_m,
             CAST(MAX(o_orderdate) >= TIMESTAMP '2001-02-01' AS INT)
               AS censored
      FROM orders GROUP BY o_custkey
    ), by_at AS (
      SELECT arm, dur_m,
             CAST(SUM(1 - censored) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS e
      FROM lifetimes GROUP BY arm, dur_m
    ), times AS (
      SELECT DISTINCT dur_m FROM by_at
    ), grid AS (
      SELECT t.dur_m, a.arm,
             COALESCE(b.d, 0) AS d, COALESCE(b.e, 0) AS e
      FROM times t
      CROSS JOIN (VALUES (0), (1)) a(arm)
      LEFT JOIN by_at b ON b.dur_m = t.dur_m AND b.arm = a.arm
    ), risk AS (
      SELECT dur_m, arm, d,
             SUM(e) OVER (PARTITION BY arm ORDER BY dur_m DESC) AS n
      FROM grid
    ), wide AS (
      SELECT dur_m,
             SUM(CASE WHEN arm = 1 THEN d ELSE 0 END) AS d1,
             SUM(CASE WHEN arm = 0 THEN d ELSE 0 END) AS d0,
             SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS n1,
             SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS n0
      FROM risk GROUP BY dur_m
    ), terms AS (
      SELECT CAST(round(d1 - CAST((d1 + d0) * n1 AS DOUBLE) / (n1 + n0), 9)
                  AS DECIMAL(28,9)) AS oe,
             CAST(round(CASE WHEN n1 + n0 > 1 THEN
                    CAST((d1 + d0) * n1 AS DOUBLE) * n0
                    * (n1 + n0 - d1 - d0)
                    / (CAST(n1 + n0 AS DOUBLE) * (n1 + n0) * (n1 + n0 - 1))
                  ELSE 0 END, 9) AS DECIMAL(28,9)) AS v
      FROM wide WHERE d1 + d0 > 0 AND n1 > 0 AND n0 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
           round(CAST(SUM(oe) AS DOUBLE), 6) AS observed_minus_expected,
           round(CAST(SUM(v) AS DOUBLE), 6) AS variance,
           round(CAST(SUM(oe) AS DOUBLE) * CAST(SUM(oe) AS DOUBLE)
                 / CAST(SUM(v) AS DOUBLE), 6) AS chisq,
           CAST(CAST(SUM(oe) AS DOUBLE) * CAST(SUM(oe) AS DOUBLE)
                / CAST(SUM(v) AS DOUBLE) > 3.841458820694124 AS INT)
             AS curves_differ
    FROM terms
    """,
    tags=("survival-analysis", "log-rank", "experimentation"),
)
def logrank_test_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) test — \"are these two survival curves the
    same?\", the inferential capstone of the KM / Nelson–Aalen family:
    customers hash into two arms (the md5 coin the A/B family shares),
    and at every event time the observed arm-1 churn is compared with
    its hypergeometric expectation given the at-risk sets, accumulating
    Σ(O−E) and the variance Σ n1·n0·d·(n−d)/(n²(n−1)). Per-time terms
    round to the 1e-9 grid and accumulate as decimals (the KM exactness
    trick), so the χ² against the df=1 critical value is hash-exact.
    Under the null coin the expected answer is \"no difference\" — the
    calibration this test exists to provide.
    Scale: one grouped pass per (arm, time); at-risk sets come from
    descending cumulative windows over the calendar-sized time frame —
    never data-sized."""
    from pyspark.sql.window import Window as W

    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("arm:"), F.col("o_custkey").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    lifetimes = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.floor(
                F.datediff(F.max("o_orderdate"), F.min("o_orderdate")) / 30.0
            )
            .cast("long")
            .alias("dur_m"),
            (
                F.max("o_orderdate")
                >= F.lit("2001-02-01").cast("timestamp")
            )
            .cast("int")
            .alias("censored"),
        )
        .select(arm.alias("arm"), "dur_m", "censored")
    )
    by_at = lifetimes.groupBy("arm", "dur_m").agg(
        F.sum(1 - F.col("censored")).alias("d"),
        F.count("*").alias("e"),
    )
    times = by_at.select("dur_m").distinct()
    arms = spark.createDataFrame([(0,), (1,)], "arm long")
    grid = (
        times.crossJoin(F.broadcast(arms))
        .join(by_at, ["dur_m", "arm"], "left")
        .select(
            "dur_m",
            "arm",
            F.coalesce("d", F.lit(0)).alias("d"),
            F.coalesce("e", F.lit(0)).alias("e"),
        )
    )
    w_desc = W.partitionBy("arm").orderBy(F.col("dur_m").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = grid.select(
        "dur_m", "arm", "d", F.sum("e").over(w_desc).alias("n")
    )
    wide = risk.groupBy("dur_m").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("arm") == 0, F.col("d")).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0)).alias("n0"),
    )
    dt = F.col("d1") + F.col("d0")
    nt = F.col("n1") + F.col("n0")
    oe = F.round(
        F.col("d1") - (dt * F.col("n1")).cast("double") / nt, 9
    ).cast("decimal(28,9)")
    v = F.round(
        F.when(
            nt > 1,
            (dt * F.col("n1")).cast("double")
            * F.col("n0")
            * (nt - dt)
            / (nt.cast("double") * nt * (nt - 1)),
        ).otherwise(0.0),
        9,
    ).cast("decimal(28,9)")
    terms = wide.where(
        (dt > 0) & (F.col("n1") > 0) & (F.col("n0") > 0)
    ).select(oe.alias("oe"), v.alias("v"))
    soe = F.sum("oe").cast("double")
    sv = F.sum("v").cast("double")
    chisq = soe * soe / sv
    return terms.agg(
        F.count("*").cast("long").alias("n_event_times"),
        F.round(soe, 6).alias("observed_minus_expected"),
        F.round(sv, 6).alias("variance"),
        F.round(chisq, 6).alias("chisq"),
        (chisq > F.lit(3.841458820694124)).cast("int").alias("curves_differ"),
    )


@query(
    "seasonal_naive_backtest_mase",
    oracle="""
    WITH pts AS (
      SELECT CAST((EXTRACT(year FROM o_orderdate) - 1992) * 12
                  + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
                  AS BIGINT) AS yc
      FROM orders GROUP BY x
    ), mx AS (
      SELECT MAX(x) AS mx FROM pts
    ), fc AS (
      SELECT t.x, t.yc, l.yc AS yhat
      FROM pts t
      JOIN pts l ON l.x = t.x - 12
      CROSS JOIN mx
      WHERE t.x > mx.mx - 12
    ), train AS (
      SELECT abs(t.yc - p.yc) AS ae
      FROM pts t JOIN pts p ON p.x = t.x - 1
      CROSS JOIN mx
      WHERE t.x <= mx.mx - 12
    ), agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fc) AS n_test,
             (SELECT SUM(abs(yc - yhat)) FROM fc) AS sae_model,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM train) AS n_train,
             (SELECT SUM(ae) FROM train) AS sae_naive
    )
    SELECT n_test, n_train,
           round(CAST(sae_model AS DOUBLE) / n_test / 100, 6)
             AS mae_model_dollars,
           round(CAST(sae_naive AS DOUBLE) / n_train / 100, 6)
             AS mae_naive1_dollars,
           round((CAST(sae_model AS DOUBLE) / n_test)
                 / (CAST(sae_naive AS DOUBLE) / n_train), 6) AS mase
    FROM agg
    """,
    tags=("time-series", "forecasting", "evaluation"),
)
def seasonal_naive_backtest_mase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MASE backtest (Hyndman & Koehler) of the seasonal-naive
    forecaster — the scale-free forecast-accuracy metric that made
    \"beat the naive model or ship nothing\" an industry norm: hold out
    the final 12 months, forecast each as the same month last year,
    and scale the hold-out MAE by the TRAINING-period one-step naive
    MAE (so MASE < 1 = better than naive drift, comparable across
    series of any magnitude). Monthly totals are cent integers, both
    absolute-error sums are exact integer sums, and the MASE is one
    ratio of two integer means — hash-exact with no distributional
    assumptions.
    Scale: the fact table collapses to the month frame in one
    map-side pass; forecasting and scoring are self-joins on a
    calendar-sized frame."""
    pts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - 1992) * 12
                + F.month("o_orderdate")
                - 1
            )
            .cast("long")
            .alias("x")
        )
        .agg(
            (F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
        .localCheckpoint(eager=False)
    )
    mx = pts.agg(F.max("x").alias("mx"))
    lag12 = pts.select(F.col("x").alias("lx"), F.col("yc").alias("lyc"))
    fc = (
        pts.crossJoin(F.broadcast(mx))
        .where(F.col("x") > F.col("mx") - 12)
        .join(lag12, F.col("lx") == F.col("x") - 12)
        .select(F.abs(F.col("yc") - F.col("lyc")).alias("ae"))
    )
    lag1 = pts.select(F.col("x").alias("px"), F.col("yc").alias("pyc"))
    train = (
        pts.crossJoin(F.broadcast(mx))
        .where(F.col("x") <= F.col("mx") - 12)
        .join(lag1, F.col("px") == F.col("x") - 1)
        .select(F.abs(F.col("yc") - F.col("pyc")).alias("ae"))
    )
    afc = fc.agg(
        F.count("*").alias("n_test"), F.sum("ae").alias("sae_model")
    )
    atr = train.agg(
        F.count("*").alias("n_train"), F.sum("ae").alias("sae_naive")
    )
    return afc.crossJoin(F.broadcast(atr)).select(
        F.col("n_test").cast("long"),
        F.col("n_train").cast("long"),
        F.round(
            F.col("sae_model").cast("double") / F.col("n_test") / 100, 6
        ).alias("mae_model_dollars"),
        F.round(
            F.col("sae_naive").cast("double") / F.col("n_train") / 100, 6
        ).alias("mae_naive1_dollars"),
        F.round(
            (F.col("sae_model").cast("double") / F.col("n_test"))
            / (F.col("sae_naive").cast("double") / F.col("n_train")),
            6,
        ).alias("mase"),
    )


@query(
    "price_elasticity_loglog",
    oracle="""
    WITH pts AS (
      SELECT CAST(round(ln(l_extendedprice / l_quantity), 9)
                  AS DECIMAL(28,9)) AS x,
             CAST(round(ln(l_quantity), 9) AS DECIMAL(28,9)) AS y
      FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0
    ), sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM pts
    )
    SELECT n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS elasticity,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept_ln
    FROM sums
    """,
    tags=("econometrics", "regression", "elasticity"),
)
def price_elasticity_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand by the log-log regression economists
    actually run: the OLS slope of ln(quantity) on ln(unit price) IS
    the elasticity (percent demand change per percent price change) —
    the one transform that makes a multiplicative law linear. Per-row
    logarithms round to the 1e-9 grid before DECIMAL accumulation (the
    engine's standard libm-agreement trick: both engines' ln agree far
    above the grid, and the grid makes sums addition-order-free), the
    four moment sums are exact decimal arithmetic, and slope/intercept
    are fixed closed-form double expressions — hash-exact.
    On TPC-H's uniform quantities the true elasticity is ≈0 — the
    pytest pins the estimator near zero AND recovers a planted
    elasticity of −1.5 exactly.
    Scale: one map-side-combinable moment pass; nothing else."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    pts = li.select(
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 9)
        .cast("decimal(28,9)")
        .alias("x"),
        F.round(F.log("l_quantity"), 9).cast("decimal(28,9)").alias("y"),
    )
    sums = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("long"),
        F.round(slope, 6).alias("elasticity"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept_ln"
        ),
    )


# ---------------------------------------------------------------------------
# TPC-DS starter set (VERDICT r8 #8): the decision-support shapes TPC-H
# lacks, adapted onto the driver star schema the same way the Q4/Q16/Q20
# TPC-H adaptations were. Q3 = dim-filtered brand/year report; Q7 =
# demographic-sliced item averages; Q34 = ticket-size cohort
# (aggregate → HAVING band → re-join detail); Q59 = week-over-week
# cross-year self-join of an aggregated fact; Q89 = window-over-join
# deviation-from-category-average report.
# ---------------------------------------------------------------------------


@query(
    "tpcds_q3_brand_year_sales",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS d_year,
           p_brand,
           {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS ext_sales
    FROM lineitem
    JOIN part   ON p_partkey = l_partkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
    """,
    tags=("tpcds", "q3", "star-join"),
)
def tpcds_q3_brand_year_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q3 analogue: yearly brand sales for one manufacturer
    slice (``p_type = 'PROMO'`` stands in for Q3's
    ``i_manufact_id``; year(o_orderdate) is the date dim). The
    defining shape — fact scanned once, both dims broadcast, the
    selective item filter pushed below the join so only the PROMO
    slice of lineitem survives to the aggregate. One shuffle on
    (year, brand); revenue is the exact-decimal sum."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("d_year"),
            "p_brand",
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "ext_sales",
                4,
            )
        )
    )


@query(
    "tpcds_q7_segment_item_averages",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(CAST(SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_qty,
           round(CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price,
           round(CAST(SUM(CAST(ROUND(l_discount, 2) AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_disc
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN part     ON p_partkey = l_partkey
    WHERE c_mktsegment = 'AUTOMOBILE'
    GROUP BY p_brand
    """,
    tags=("tpcds", "q7", "demographic-slice"),
)
def tpcds_q7_segment_item_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q7 analogue: per-item average quantity / price /
    discount for one customer demographic (``c_mktsegment`` stands in
    for the customer_demographics dim). Averages are exact-decimal
    sums divided by the group count — one IEEE division per group,
    identical in both engines, rounded to the 1e-6 grid. Scale:
    customer and part broadcast; the one shuffle carries (brand,
    partial decimal sums)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")

    def dec_avg(col, scale, alias):
        s = F.sum(F.round(col, scale).cast(f"decimal(18,{scale})")).cast("double")
        return F.round(s / F.count("*"), 6).alias(alias)

    return (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            dec_avg(F.col("l_quantity"), 2, "avg_qty"),
            dec_avg(F.col("l_extendedprice"), 2, "avg_price"),
            dec_avg(F.col("l_discount"), 2, "avg_disc"),
        )
    )


@query(
    "tpcds_q34_ticket_size_buyers",
    oracle="""
    WITH dn AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS line_cnt
      FROM lineitem
      GROUP BY l_orderkey
      HAVING COUNT(*) BETWEEN 6 AND 7
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, dn.line_cnt
    FROM dn
    JOIN orders o   ON o.o_orderkey = dn.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE EXTRACT(year FROM o.o_orderdate) = 1996
    """,
    tags=("tpcds", "q34", "having-band", "agg-then-join"),
)
def tpcds_q34_ticket_size_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34 analogue: customers whose 1996 tickets carried 6-7
    lines (Q34's 15-20 item band scaled to the driver's smaller
    baskets). The defining multi-step shape: aggregate the fact to
    per-ticket counts, HAVING-band the aggregate, then re-join the
    band BACK to the dimension detail. Scale: the dn aggregate is one
    map-side-combinable count shuffled on orderkey; the band output is
    tiny and the customer join broadcasts it."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    dn = (
        lineitem.groupBy("l_orderkey")
        .agg(F.count("*").alias("line_cnt"))
        .where(F.col("line_cnt").between(6, 7))
    )
    return (
        dn.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "line_cnt")
    )


@query(
    "tpcds_q59_wow_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             CAST((dayofyear(o_orderdate) - 1) // 7 AS INT) AS wk,
             {_dec_sum_sql('o_totalprice', 2)} AS revenue
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    )
    SELECT a.nation, a.wk,
           a.revenue AS rev_1996,
           b.revenue AS rev_1997,
           round(b.revenue / a.revenue, 6) AS wow_ratio
    FROM rev a JOIN rev b
      ON a.nation = b.nation AND a.wk = b.wk
    WHERE a.yr = 1996 AND b.yr = 1997
    """,
    tags=("tpcds", "q59", "self-join", "week-over-week"),
)
def tpcds_q59_wow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 analogue: week-over-week revenue by nation, 1997
    against 1996 — the aggregated-fact self-join TPC-H never asks for.
    Week is engine-uniform integer arithmetic ``(dayofyear-1) div 7``
    (ISO weekofyear differs between engines at year boundaries).
    Scale: the fact aggregates FIRST (one shuffle onto (nation, year,
    week) — thousands of rows at any SF), and the self-join runs on
    the aggregate, not the fact; both sides of the join are
    broadcast-size."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    rev = (
        orders.where(F.year("o_orderdate").isin(1996, 1997))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.expr("CAST((dayofyear(o_orderdate) - 1) DIV 7 AS INT)").alias("wk"),
        )
        .agg(dec_sum(F.col("o_totalprice"), "revenue", 2))
    )
    a = rev.where(F.col("yr") == 1996).select(
        "nation", "wk", F.col("revenue").alias("rev_1996")
    )
    b = rev.where(F.col("yr") == 1997).select(
        "nation", "wk", F.col("revenue").alias("rev_1997")
    )
    return (
        a.join(b, ["nation", "wk"])
        .withColumn(
            "wow_ratio", F.round(F.col("rev_1997") / F.col("rev_1996"), 6)
        )
        .select("nation", "wk", "rev_1996", "rev_1997", "wow_ratio")
    )


@query(
    "tpcds_q89_category_deviation",
    oracle=f"""
    WITH monthly AS (
      SELECT p_type AS category, p_brand AS brand,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_sales
      FROM lineitem
      JOIN part   ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE EXTRACT(year FROM o_orderdate) = 1996
      GROUP BY 1, 2, 3
    ),
    win AS (
      SELECT category, brand, mon, sum_sales,
             round(CAST(SUM(CAST(ROUND(sum_sales, 4) AS DECIMAL(18,4)))
                          OVER (PARTITION BY category, brand) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY category, brand), 6)
               AS avg_monthly
      FROM monthly
    )
    SELECT category, brand, mon, sum_sales, avg_monthly,
           round(abs(sum_sales - avg_monthly) / avg_monthly, 6) AS deviation
    FROM win
    WHERE avg_monthly > 0
      AND round(abs(sum_sales - avg_monthly) / avg_monthly, 6) > 0.1
    """,
    tags=("tpcds", "q89", "window-over-join", "deviation"),
)
def tpcds_q89_category_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q89 analogue: months where a brand's sales deviate more
    than 10% from its own monthly average for the year — the
    window-over-joined-aggregate reshape (aggregate the star join to
    monthly grain, then a partition window re-reads the aggregate, not
    the fact). Determinism: monthly sums are grid-exact decimals; the
    window average is one decimal-sum / count division rounded to the
    1e-6 grid; the 10% gate compares the ROUNDED deviation so both
    engines test identical doubles. Scale: the window partitions by
    (category, brand) over ≤12 rows each — trivially small after the
    first aggregate; the only fact-sized shuffle is the monthly
    groupBy."""
    from pyspark.sql.window import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    ).select("o_orderkey", "o_orderdate")
    monthly = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("p_type").alias("category"),
            F.col("p_brand").alias("brand"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "sum_sales",
                4,
            )
        )
    )
    w = Window.partitionBy("category", "brand")
    avg_monthly = F.round(
        F.sum(F.round(F.col("sum_sales"), 4).cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        / F.count("*").over(w),
        6,
    )
    dev = F.round(
        F.abs(F.col("sum_sales") - F.col("avg_monthly")) / F.col("avg_monthly"), 6
    )
    return (
        monthly.withColumn("avg_monthly", avg_monthly)
        .withColumn("deviation", dev)
        .where((F.col("avg_monthly") > 0) & (F.col("deviation") > 0.1))
        .select("category", "brand", "mon", "sum_sales", "avg_monthly", "deviation")
    )


_TDIGEST_CENT_CTE = """h AS (
      SELECT round(o_totalprice, 2) AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h
    ), cdf AS (
      SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM h
    ), kk AS (
      SELECT v, cnt,
             CAST(floor(round(50.0 * (asin(2.0 * ((cum - cnt / 2.0) / n)
                  - 1.0) / 3.141592653589793 + 0.5), 9)) AS BIGINT) AS cluster
      FROM cdf, tot
    ), cent AS (
      SELECT cluster, CAST(SUM(cnt) AS BIGINT) AS n_c,
             ((2 * CAST(CAST(SUM(CAST(v * cnt AS DECIMAL(28,2))) * 1000000
                             AS DECIMAL(38,0)) AS BIGINT)
               + CAST(SUM(cnt) AS BIGINT))
              // (2 * CAST(SUM(cnt) AS BIGINT))) / 1000000.0 AS mean
      FROM kk GROUP BY cluster
    )"""


@query(
    "tdigest_centroids_orders",
    oracle=f"""
    WITH {_TDIGEST_CENT_CTE}
    SELECT cluster, n_c, mean FROM cent
    """,
    tags=("sketch", "quantile", "tdigest"),
)
def tdigest_centroids_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic t-digest centroids over order totals (delta=50,
    k1 asin scale) — the interpolated-quantile twin beside KLL
    (operators/sketch.py module note): the distinct-value CDF assigns
    mid-rank quantiles, the k1 function buckets values into clusters,
    centroids are decimal-exact weighted means. A pure function of the
    value multiset, so the SQL oracle rebuilds the identical digest.
    Scale: one histogram shuffle over rows; every later stage runs on
    distinct values (~1e5 for 2-decimal money), centroids bounded by
    delta."""
    from .operators.sketch import tdigest_centroids

    orders = load_table(spark, sf_dir, "orders")
    return tdigest_centroids(orders, "o_totalprice", delta=50)


@query(
    "tdigest_quantiles_orders",
    oracle=f"""
    WITH {_TDIGEST_CENT_CTE}, cm AS (
      SELECT cluster, n_c, mean,
             CAST(SUM(n_c) OVER (ORDER BY cluster) AS BIGINT) AS cum
      FROM cent
    ), cm2 AS (
      SELECT cluster, mean, n_c, cum - n_c / 2.0 AS cum_mid,
             lead(mean) OVER (ORDER BY cluster) AS next_mean,
             lead(cum - n_c / 2.0) OVER (ORDER BY cluster) AS next_cum_mid
      FROM cm
    ), probs AS (
      SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS prob
    ), cand AS (
      SELECT p.prob, cm2.mean, cm2.cum_mid, cm2.next_mean,
             cm2.next_cum_mid, p.prob * t.n AS t, t.n AS total_weight,
             row_number() OVER (PARTITION BY p.prob
                                ORDER BY cm2.cum_mid DESC) AS rn
      FROM probs p, cm2, tot t
      WHERE cm2.cum_mid <= p.prob * t.n
    ), sel AS (
      SELECT prob,
             round(CASE WHEN next_cum_mid IS NULL THEN mean
                   ELSE mean + (next_mean - mean)
                        * ((t - cum_mid) / (next_cum_mid - cum_mid)) END,
                   6) AS est,
             total_weight
      FROM cand WHERE rn = 1
    ), head AS (
      SELECT p.prob, round(fc.mean, 6) AS est, t.n AS total_weight
      FROM probs p
      CROSS JOIN tot t
      CROSS JOIN (SELECT mean FROM cm2 ORDER BY cluster LIMIT 1) fc
      WHERE p.prob NOT IN (SELECT prob FROM sel)
    )
    SELECT prob, est, total_weight FROM sel
    UNION ALL
    SELECT prob, est, total_weight FROM head
    """,
    tags=("sketch", "quantile", "tdigest", "drift"),
)
def tdigest_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated p25/p50/p75/p95 from the t-digest — same output
    shape as `kll_quantile_sketch` so the drift family swaps sketches.
    Bracketing centroids interpolate linearly at target rank p*N;
    every post-centroid stage runs over <= delta rows. The estimates
    land BETWEEN centroid means (smooth), where KLL steps between
    survivor values — the tail-accuracy trade the two sketches
    represent."""
    from .operators.sketch import tdigest_centroids, tdigest_quantiles

    orders = load_table(spark, sf_dir, "orders")
    cent = tdigest_centroids(orders, "o_totalprice", delta=50)
    return tdigest_quantiles(cent, [0.25, 0.5, 0.75, 0.95])


@query(
    "tpcds_q71_multichannel_revenue",
    oracle=f"""
    WITH channels AS (
      SELECT 'store' AS channel, n_name AS nation,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
             round(o_totalprice, 2) AS amount
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE EXTRACT(year FROM o_orderdate) = 1996
      UNION ALL
      SELECT 'web' AS channel, 'NATION_' || CAST(user_id % 25 AS VARCHAR)
               AS nation,
             CAST(EXTRACT(month FROM ts) AS INT) AS mon,
             round(value, 2) AS amount
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT channel, nation, mon,
           CAST(COUNT(*) AS BIGINT) AS n_sales,
           {_dec_sum_sql('amount', 2)} AS revenue
    FROM channels
    GROUP BY 1, 2, 3
    """,
    tags=("tpcds", "q71", "multi-channel-union"),
)
def tpcds_q71_multichannel_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q71 analogue — the multi-channel UNION fact, the
    defining TPC-DS shape (store_sales ∪ catalog_sales ∪ web_sales
    scanned as one fact): the orders fact is the "store" channel, the
    events purchase stream is the "web" channel, conformed to a
    common (channel, nation, month, amount) schema and aggregated
    once. Scale: each branch aggregates from its own scan (the union
    is a physical no-op — Spark unions partitions, no shuffle until
    the single combined groupBy); dimension joins broadcast; the one
    shuffle carries (channel, nation, month) partials with map-side
    combine. The events nation derives from user_id % 25 — the same
    md5-free conformance rule in both engines."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    store = (
        orders.join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.lit("store").alias("channel"),
            F.col("n_name").alias("nation"),
            F.month("o_orderdate").cast("int").alias("mon"),
            F.round("o_totalprice", 2).alias("amount"),
        )
    )
    web = events.select(
        F.lit("web").alias("channel"),
        F.concat(F.lit("NATION_"), (F.col("user_id") % 25).cast("string")).alias(
            "nation"
        ),
        F.month("ts").cast("int").alias("mon"),
        F.round("value", 2).alias("amount"),
    )
    return (
        store.unionByName(web)
        .groupBy("channel", "nation", "mon")
        .agg(
            F.count("*").alias("n_sales"),
            dec_sum(F.col("amount"), "revenue", 2),
        )
    )


def _tdigest_shard_cte(shard: int) -> str:
    """Per-shard t-digest CTEs (orders split by o_orderkey % 2) — the
    same construction as ``_TDIGEST_CENT_CTE`` scoped to one shard."""
    p = f"s{shard}"
    return f"""{p}_h AS (
      SELECT round(o_totalprice, 2) AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE o_orderkey % 2 = {shard} GROUP BY 1
    ), {p}_tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM {p}_h
    ), {p}_cdf AS (
      SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
      FROM {p}_h
    ), {p}_kk AS (
      SELECT v, cnt,
             CAST(floor(round(50.0 * (asin(2.0 * ((cum - cnt / 2.0) / n)
                  - 1.0) / 3.141592653589793 + 0.5), 9)) AS BIGINT) AS cluster
      FROM {p}_cdf, {p}_tot
    ), {p}_cent AS (
      SELECT cluster, CAST(SUM(cnt) AS BIGINT) AS n_c,
             ((2 * CAST(CAST(SUM(CAST(v * cnt AS DECIMAL(28,2))) * 1000000
                             AS DECIMAL(38,0)) AS BIGINT)
               + CAST(SUM(cnt) AS BIGINT))
              // (2 * CAST(SUM(cnt) AS BIGINT))) / 1000000.0 AS mean
      FROM {p}_kk GROUP BY cluster
    )"""


@query(
    "tdigest_merge_shards",
    oracle=f"""
    WITH {_tdigest_shard_cte(0)}, {_tdigest_shard_cte(1)},
    merged AS (
      SELECT mean, n_c FROM s0_cent
      UNION ALL
      SELECT mean, n_c FROM s1_cent
    ), m_h AS (
      SELECT round(mean, 6) AS v, CAST(SUM(n_c) AS BIGINT) AS cnt
      FROM merged GROUP BY 1
    ), m_tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM m_h
    ), m_cdf AS (
      SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
      FROM m_h
    ), m_kk AS (
      SELECT v, cnt,
             CAST(floor(round(50.0 * (asin(2.0 * ((cum - cnt / 2.0) / n)
                  - 1.0) / 3.141592653589793 + 0.5), 9)) AS BIGINT) AS cluster
      FROM m_cdf, m_tot
    )
    SELECT cluster, CAST(SUM(cnt) AS BIGINT) AS n_c,
           ((2 * CAST(CAST(SUM(CAST(v * cnt AS DECIMAL(28,6))) * 1000000
                           AS DECIMAL(38,0)) AS BIGINT)
             + CAST(SUM(cnt) AS BIGINT))
            // (2 * CAST(SUM(cnt) AS BIGINT))) / 1000000.0 AS mean
    FROM m_kk GROUP BY cluster
    """,
    tags=("sketch", "quantile", "tdigest", "merge"),
)
def tdigest_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest MERGEABILITY — the property that makes it a sketch
    (Dunning's centroid merge: concatenate shard centroids, re-cluster
    by the scale function): orders split into two shards, each shard
    digests independently (the distributed build), and the merged
    digest re-digests the union of (mean, n_c) weighted centroid rows
    at value_scale=6. Total weight is conserved through BOTH levels
    (asserted in tests), and the whole two-level construction is a
    pure function of the value multiset — the unrolled two-shard
    oracle hash-matches exactly, the same shape as
    `kll_sketch_merge_shards`. Scale: shard digests are the
    map-side partials of a 1000-executor build; the merge input is
    2×delta rows."""
    from .operators.sketch import tdigest_centroids

    orders = load_table(spark, sf_dir, "orders")
    s0 = tdigest_centroids(
        orders.where(F.col("o_orderkey") % 2 == 0), "o_totalprice", delta=50
    )
    s1 = tdigest_centroids(
        orders.where(F.col("o_orderkey") % 2 == 1), "o_totalprice", delta=50
    )
    merged = s0.select("mean", "n_c").unionByName(s1.select("mean", "n_c"))
    return tdigest_centroids(
        merged, "mean", delta=50, value_scale=6, weight_col="n_c",
        assume_bounded=True,  # merge input is exactly 2*delta centroid rows
    )


@query(
    "tpcds_q88_timeband_counts",
    oracle="""
    SELECT
      CAST(COUNT(CASE WHEN l_quantity <= 10 AND l_discount <= 0.02 THEN 1 END) AS BIGINT) AS b1,
      CAST(COUNT(CASE WHEN l_quantity <= 10 AND l_discount >  0.02 THEN 1 END) AS BIGINT) AS b2,
      CAST(COUNT(CASE WHEN l_quantity >  10 AND l_quantity <= 20 AND l_discount <= 0.02 THEN 1 END) AS BIGINT) AS b3,
      CAST(COUNT(CASE WHEN l_quantity >  10 AND l_quantity <= 20 AND l_discount >  0.02 THEN 1 END) AS BIGINT) AS b4,
      CAST(COUNT(CASE WHEN l_quantity >  20 AND l_quantity <= 35 AND l_discount <= 0.02 THEN 1 END) AS BIGINT) AS b5,
      CAST(COUNT(CASE WHEN l_quantity >  20 AND l_quantity <= 35 AND l_discount >  0.02 THEN 1 END) AS BIGINT) AS b6,
      CAST(COUNT(CASE WHEN l_quantity >  35 AND l_discount <= 0.02 THEN 1 END) AS BIGINT) AS b7,
      CAST(COUNT(CASE WHEN l_quantity >  35 AND l_discount >  0.02 THEN 1 END) AS BIGINT) AS b8
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    """,
    tags=("tpcds", "q88", "multi-band", "single-scan"),
)
def tpcds_q88_timeband_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 analogue: eight independent band counts
    (quantity × discount bands over finished orders; Q88's eight
    half-hour × demographic bands). The benchmark text writes eight
    SELF-CONTAINED subqueries — eight scans; the Spark-first
    re-expression is ONE scan with eight conditional counts fused
    into a single hash aggregate (what Catalyst cannot do for you if
    you write eight scans — the query author picks the fused shape).
    At 100 TB the difference is 8× the fact I/O. One row out."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    j = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    q, d = F.col("l_quantity"), F.col("l_discount")

    def band(cond, alias):
        return F.count(F.when(cond, 1)).alias(alias)

    return j.agg(
        band((q <= 10) & (d <= 0.02), "b1"),
        band((q <= 10) & (d > 0.02), "b2"),
        band((q > 10) & (q <= 20) & (d <= 0.02), "b3"),
        band((q > 10) & (q <= 20) & (d > 0.02), "b4"),
        band((q > 20) & (q <= 35) & (d <= 0.02), "b5"),
        band((q > 20) & (q <= 35) & (d > 0.02), "b6"),
        band((q > 35) & (d <= 0.02), "b7"),
        band((q > 35) & (d > 0.02), "b8"),
    )


@query(
    "tpcds_q77_channel_rollup",
    oracle=f"""
    WITH channels AS (
      SELECT 'store' AS channel, n_name AS nation,
             round(o_totalprice, 2) AS amount
      FROM orders
      JOIN customer ON c_custkey = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE EXTRACT(year FROM o_orderdate) = 1996
      UNION ALL
      SELECT 'web' AS channel, 'NATION_' || CAST(user_id % 25 AS VARCHAR),
             round(value, 2)
      FROM events WHERE event_type = 'purchase'
    )
    SELECT channel, nation,
           CAST(COUNT(*) AS BIGINT) AS n_sales,
           {_dec_sum_sql('amount', 2)} AS revenue
    FROM channels
    GROUP BY ROLLUP (channel, nation)
    """,
    tags=("tpcds", "q77", "rollup", "multi-channel-union"),
)
def tpcds_q77_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q77 analogue: the channel profit report with ROLLUP
    subtotals — per (channel, nation), per channel, and grand total in
    one grouping-sets aggregate over the conformed two-channel union
    (the grouping-set-heavy report family TPC-H lacks). Spark expands
    the rollup into grouping sets inside ONE hash aggregate (partial
    combine per set), so the fact scans once; subtotal rows carry the
    standard NULL pattern in both engines."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    events = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    store = (
        orders.join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.lit("store").alias("channel"),
            F.col("n_name").alias("nation"),
            F.round("o_totalprice", 2).alias("amount"),
        )
    )
    web = events.select(
        F.lit("web").alias("channel"),
        F.concat(F.lit("NATION_"), (F.col("user_id") % 25).cast("string")).alias(
            "nation"
        ),
        F.round("value", 2).alias("amount"),
    )
    return (
        store.unionByName(web)
        .rollup("channel", "nation")
        .agg(
            F.count("*").alias("n_sales"),
            dec_sum(F.col("amount"), "revenue", 2),
        )
    )


@query(
    "tpcds_q51_cumulative_crossover",
    oracle=f"""
    WITH urgent_w AS (
      SELECT CAST((dayofyear(o_orderdate) - 1) // 7 AS INT) AS wk,
             {_dec_sum_sql('o_totalprice', 2)} AS rev
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1996
        AND o_orderpriority = '1-URGENT'
      GROUP BY 1
    ), high_w AS (
      SELECT CAST((dayofyear(o_orderdate) - 1) // 7 AS INT) AS wk,
             {_dec_sum_sql('o_totalprice', 2)} AS rev
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1996
        AND o_orderpriority = '2-HIGH'
      GROUP BY 1
    ), joined AS (
      SELECT COALESCE(u.wk, h.wk) AS wk, u.rev AS urgent_rev, h.rev AS high_rev
      FROM urgent_w u FULL OUTER JOIN high_w h ON u.wk = h.wk
    ), cum AS (
      SELECT wk,
             CAST(SUM(CAST(ROUND(COALESCE(urgent_rev, 0), 2) AS DECIMAL(18,2)))
                    OVER (ORDER BY wk) AS DOUBLE) AS urgent_cum,
             CAST(SUM(CAST(ROUND(COALESCE(high_rev, 0), 2) AS DECIMAL(18,2)))
                    OVER (ORDER BY wk) AS DOUBLE) AS high_cum
      FROM joined
    )
    SELECT wk, urgent_cum, high_cum
    FROM cum
    WHERE high_cum > urgent_cum
    """,
    tags=("tpcds", "q51", "full-outer", "window-over-join"),
)
def tpcds_q51_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 analogue: FULL OUTER join of two per-week revenue
    series (urgent vs high-priority orders — comparable magnitudes, so
    real crossovers exist at every SF), running cumulative revenue
    over each, report the weeks where the second series' cumulative
    total has overtaken the first — the window-over-full-outer-join
    reshape. Both series aggregate to week grain FIRST (map-side
    combine; the window then runs over <= 53 rows), cumulative sums
    are decimal-exact running sums; weeks use the engine-uniform
    (dayofyear-1) div 7 arithmetic."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    )
    wk = F.expr("CAST((dayofyear(o_orderdate) - 1) DIV 7 AS INT)").alias("wk")
    urgent_w = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(wk)
        .agg(dec_sum(F.col("o_totalprice"), "rev", 2))
    )
    high_w = (
        orders.where(F.col("o_orderpriority") == "2-HIGH")
        .groupBy(wk)
        .agg(dec_sum(F.col("o_totalprice"), "rev", 2))
    )
    joined = (
        urgent_w.select("wk", F.col("rev").alias("urgent_rev"))
        .join(
            high_w.select("wk", F.col("rev").alias("high_rev")),
            "wk",
            "full_outer",
        )
    )
    w = Window.orderBy("wk").rowsBetween(Window.unboundedPreceding, 0)

    def cum(col):
        return (
            F.sum(F.round(F.coalesce(col, F.lit(0)), 2).cast("decimal(18,2)"))
            .over(w)
            .cast("double")
        )

    return (
        joined.withColumn("urgent_cum", cum(F.col("urgent_rev")))
        .withColumn("high_cum", cum(F.col("high_rev")))
        .where(F.col("high_cum") > F.col("urgent_cum"))
        .select("wk", "urgent_cum", "high_cum")
    )


def _tdigest_year_quantiles_cte(p: str, year: int) -> str:
    """Digest + interpolated-quantile CTE chain for one order-year —
    the ``tdigest_quantiles_orders`` oracle parameterized by prefix
    and year filter (drift compares two of these)."""
    return f"""{p}_h AS (
      SELECT round(o_totalprice, 2) AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders WHERE EXTRACT(year FROM o_orderdate) = {year} GROUP BY 1
    ), {p}_tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM {p}_h
    ), {p}_cdf AS (
      SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
      FROM {p}_h
    ), {p}_kk AS (
      SELECT v, cnt,
             CAST(floor(round(50.0 * (asin(2.0 * ((cum - cnt / 2.0) / n)
                  - 1.0) / 3.141592653589793 + 0.5), 9)) AS BIGINT) AS cluster
      FROM {p}_cdf, {p}_tot
    ), {p}_cent AS (
      SELECT cluster, CAST(SUM(cnt) AS BIGINT) AS n_c,
             ((2 * CAST(CAST(SUM(CAST(v * cnt AS DECIMAL(28,2))) * 1000000
                             AS DECIMAL(38,0)) AS BIGINT)
               + CAST(SUM(cnt) AS BIGINT))
              // (2 * CAST(SUM(cnt) AS BIGINT))) / 1000000.0 AS mean
      FROM {p}_kk GROUP BY cluster
    ), {p}_cm AS (
      SELECT cluster, n_c, mean,
             CAST(SUM(n_c) OVER (ORDER BY cluster) AS BIGINT) AS cum
      FROM {p}_cent
    ), {p}_cm2 AS (
      SELECT cluster, mean, n_c, cum - n_c / 2.0 AS cum_mid,
             lead(mean) OVER (ORDER BY cluster) AS next_mean,
             lead(cum - n_c / 2.0) OVER (ORDER BY cluster) AS next_cum_mid
      FROM {p}_cm
    ), {p}_cand AS (
      SELECT pr.prob, c.mean, c.cum_mid, c.next_mean, c.next_cum_mid,
             pr.prob * t.n AS t,
             row_number() OVER (PARTITION BY pr.prob
                                ORDER BY c.cum_mid DESC) AS rn
      FROM probs pr, {p}_cm2 c, {p}_tot t
      WHERE c.cum_mid <= pr.prob * t.n
    ), {p}_sel AS (
      SELECT prob,
             round(CASE WHEN next_cum_mid IS NULL THEN mean
                   ELSE mean + (next_mean - mean)
                        * ((t - cum_mid) / (next_cum_mid - cum_mid)) END,
                   6) AS est
      FROM {p}_cand WHERE rn = 1
    ), {p}_head AS (
      SELECT pr.prob, round(fc.mean, 6) AS est
      FROM probs pr
      CROSS JOIN (SELECT mean FROM {p}_cm2 ORDER BY cluster LIMIT 1) fc
      WHERE pr.prob NOT IN (SELECT prob FROM {p}_sel)
    ), {p}_q AS (
      SELECT prob, est FROM {p}_sel
      UNION ALL
      SELECT prob, est FROM {p}_head
    )"""


@query(
    "quantile_drift_tdigest",
    oracle=f"""
    WITH probs AS (
      SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS prob
    ), {_tdigest_year_quantiles_cte('a', 1996)},
    {_tdigest_year_quantiles_cte('b', 1997)}
    SELECT a.prob, a.est AS est_1996, b.est AS est_1997,
           round(b.est - a.est, 6) AS shift
    FROM a_q a JOIN b_q b ON a.prob = b.prob
    """,
    tags=("sketch", "tdigest", "drift", "quantile"),
)
def quantile_drift_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile drift via t-digests — the sketch-swap the drift family
    was built for: one digest per order-year, interpolated
    p25/p50/p75/p95 from each, per-quantile shift between years. At
    100 TB the digests are the ONLY thing that moves (delta centroids
    per shard/day), while the exact-percentile alternative re-sorts
    the fact; this is the same job `kll_quantile_sketch` answers with
    step estimates, now with interpolated tails. Both digest chains
    and the final join are hash-exact against the unrolled two-year
    oracle."""
    from .operators.sketch import tdigest_centroids, tdigest_quantiles

    orders = load_table(spark, sf_dir, "orders")
    probs = [0.25, 0.5, 0.75, 0.95]

    def year_q(year, alias):
        cent = tdigest_centroids(
            orders.where(F.year("o_orderdate") == year), "o_totalprice", delta=50
        )
        return tdigest_quantiles(cent, probs).select(
            "prob", F.col("est").alias(alias)
        )

    a = year_q(1996, "est_1996")
    b = year_q(1997, "est_1997")
    return a.join(b, "prob").withColumn(
        "shift", F.round(F.col("est_1997") - F.col("est_1996"), 6)
    )


@query(
    "tpcds_q67_rollup_topn",
    oracle=f"""
    WITH monthly AS (
      SELECT p_type AS category, p_brand AS brand,
             CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem
      JOIN part   ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE EXTRACT(year FROM o_orderdate) = 1996
      GROUP BY ROLLUP (category, brand, mon)
    ), ranked AS (
      SELECT category, brand, mon, revenue,
             CAST(row_number() OVER (
               PARTITION BY category
               ORDER BY revenue DESC,
                        brand ASC NULLS FIRST,
                        mon ASC NULLS FIRST
             ) AS BIGINT) AS rk
      FROM monthly
    )
    SELECT category, brand, mon, revenue, rk
    FROM ranked WHERE rk <= 5
    """,
    tags=("tpcds", "q67", "rollup", "window-over-grouping-sets"),
)
def tpcds_q67_rollup_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 analogue: rank within category OVER the rollup
    lattice — every (category, brand, month) aggregation level ranks
    together, so a brand's yearly subtotal competes with its best
    single months (exactly Q67's "which aggregation level carries the
    sales" report). Grouping sets compute in ONE hash aggregate; the
    rank window then runs over the lattice (≈4× the monthly grain),
    never the fact. NULL ordering pinned explicitly (Spark defaults
    NULLS FIRST ascending, DuckDB NULLS LAST — the one portability
    trap of window-over-rollup)."""
    from pyspark.sql.window import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    ).select("o_orderkey", "o_orderdate")
    monthly = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("p_type").alias("category"),
            F.col("p_brand").alias("brand"),
            F.month("o_orderdate").cast("int").alias("mon"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        )
        .rollup("category", "brand", "mon")
        .agg(dec_sum(F.col("_rev"), "revenue", 4))
    )
    w = Window.partitionBy("category").orderBy(
        F.col("revenue").desc(),
        F.col("brand").asc_nulls_first(),
        F.col("mon").asc_nulls_first(),
    )
    return (
        monthly.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .select("category", "brand", "mon", "revenue", "rk")
    )


@query(
    "tpcds_q36_lochierarchy_margin",
    oracle=f"""
    WITH agg AS (
      SELECT p_type AS category, p_brand AS brand,
             GROUPING(p_type) + GROUPING(p_brand) AS lochierarchy,
             GROUPING(p_brand) AS g_brand,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
             {_dec_sum_sql('l_extendedprice * l_discount', 4)} AS discount_cost
      FROM lineitem
      JOIN part   ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      WHERE EXTRACT(year FROM o_orderdate) = 1996
      GROUP BY ROLLUP (p_type, p_brand)
    ), ranked AS (
      SELECT category, brand,
             CAST(lochierarchy AS INT) AS lochierarchy,
             round(discount_cost / revenue, 6) AS margin_ratio,
             CAST(row_number() OVER (
               PARTITION BY lochierarchy,
                            CASE WHEN g_brand = 0 THEN category END
               ORDER BY round(discount_cost / revenue, 6) DESC,
                        category ASC NULLS FIRST,
                        brand ASC NULLS FIRST
             ) AS BIGINT) AS rank_within_parent
      FROM agg
      WHERE revenue > 0
    )
    SELECT category, brand, lochierarchy, margin_ratio, rank_within_parent
    FROM ranked
    """,
    tags=("tpcds", "q36", "rollup", "grouping-fn", "lochierarchy"),
)
def tpcds_q36_lochierarchy_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36 analogue — the GROUPING()-arithmetic report: a
    (category, brand) ROLLUP where the aggregation depth
    (``lochierarchy`` = sum of GROUPING flags) is itself a computed
    column, and ranking runs WITHIN EACH PARENT — brands rank inside
    their category, categories rank at the rollup level — via Q36's
    exact CASE-on-GROUPING partition key. This is the one grouping-set
    feature ROLLUP output alone can't express: NULL-as-subtotal is
    ambiguous against NULL-as-data, and GROUPING() disambiguates. One
    hash aggregate for all lattice levels; the window runs over the
    lattice, not the fact; NULL ordering pinned on both engines."""
    from pyspark.sql.window import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate") == 1996
    ).select("o_orderkey")
    agg = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("p_type").alias("category"),
            F.col("p_brand").alias("brand"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
            (F.col("l_extendedprice") * F.col("l_discount")).alias("_disc"),
        )
        .rollup("category", "brand")
        .agg(
            (F.grouping("category") + F.grouping("brand")).cast("int").alias(
                "lochierarchy"
            ),
            F.grouping("brand").alias("g_brand"),
            dec_sum(F.col("_rev"), "revenue", 4),
            dec_sum(F.col("_disc"), "discount_cost", 4),
        )
    )
    margin = F.round(F.col("discount_cost") / F.col("revenue"), 6)
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("g_brand") == 0, F.col("category")),
    ).orderBy(
        F.col("margin_ratio").desc(),
        F.col("category").asc_nulls_first(),
        F.col("brand").asc_nulls_first(),
    )
    return (
        agg.where(F.col("revenue") > 0)
        .withColumn("margin_ratio", margin)
        .withColumn("rank_within_parent", F.row_number().over(w).cast("long"))
        .select(
            "category", "brand", "lochierarchy", "margin_ratio",
            "rank_within_parent",
        )
    )


@query(
    "tpcds_q14_cross_channel_sales",
    oracle=f"""
    WITH cells AS (
      SELECT CASE l_linenumber % 3 WHEN 0 THEN 'store'
                  WHEN 1 THEN 'catalog' ELSE 'web' END AS channel,
             p_brand AS brand,
             CAST(COUNT(*) AS BIGINT) AS n_sales,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE EXTRACT(year FROM l_shipdate) = 1996
      GROUP BY 1, 2
    ), cross_items AS (
      SELECT brand FROM cells GROUP BY brand HAVING COUNT(*) = 3
    ), totals AS (
      SELECT CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_rev,
             CAST(SUM(n_sales) AS BIGINT) AS total_n
      FROM cells
    )
    SELECT channel, brand, n_sales, revenue
    FROM cells
    JOIN cross_items USING (brand)
    CROSS JOIN totals
    WHERE revenue * CAST(total_n AS DOUBLE)
          > total_rev * CAST(n_sales AS DOUBLE)
    """,
    tags=("tpcds", "q14", "cte-reuse", "cross-channel"),
)
def tpcds_q14_cross_channel_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 analogue — the SHARED-CTE-REUSED-BY-MANY-CONSUMERS
    paradigm (Q14 builds cross_items/avg_sales once and every channel
    branch consumes them): the per-(channel, brand) sales cells are
    computed ONCE and localCheckpoint'd (materialized — brands x 3
    rows, the Spark equivalent of Q14's materialized CTE), then THREE
    consumers read the materialized frame instead of re-running the
    fact scan: (1) cross_items = brands sold in all three channels,
    (2) the global (total revenue, total sales) scalar, (3) the final
    per-cell report keeping cells whose per-sale average beats the
    global per-sale average. The compare is cross-multiplied
    (revenue·total_n > total_rev·n_sales) so no engine ever rounds a
    division — both sides are IEEE double products of exact
    decimal-grid values. Scale: the fact is scanned exactly once
    (year-filter and 2-column projection pushed to parquet; part
    broadcast); everything after the first aggregate runs over O(brands)
    rows. Channel derives from l_linenumber % 3 — the same conformance
    rule in both engines."""
    lineitem = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == 1996
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    channel = (
        F.when(F.col("l_linenumber") % 3 == 0, F.lit("store"))
        .when(F.col("l_linenumber") % 3 == 1, F.lit("catalog"))
        .otherwise(F.lit("web"))
    )
    cells = (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            channel.alias("channel"),
            F.col("p_brand").alias("brand"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("amount"),
        )
        .groupBy("channel", "brand")
        .agg(
            F.count("*").alias("n_sales"),
            dec_sum(F.col("amount"), "revenue", 4),
        )
        .localCheckpoint()  # Q14's materialize-once: 3 consumers below
    )
    cross_items = (
        cells.groupBy("brand").agg(F.count("*").alias("_nch"))
        .where(F.col("_nch") == 3)
        .select("brand")
    )
    totals = cells.agg(
        F.sum(F.col("revenue").cast("decimal(18,4)"))
        .cast("double").alias("total_rev"),
        F.sum("n_sales").alias("total_n"),
    )
    return (
        cells.join(F.broadcast(cross_items), "brand")
        .crossJoin(F.broadcast(totals))
        .where(
            F.col("revenue") * F.col("total_n").cast("double")
            > F.col("total_rev") * F.col("n_sales").cast("double")
        )
        .select("channel", "brand", "n_sales", "revenue")
    )


@query(
    "tpcds_q64_snapshot_compare",
    oracle=f"""
    WITH profile AS (
      SELECT o_custkey AS custkey,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             {_dec_sum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT s_nationkey) AS BIGINT) AS n_supp_nations
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_name, n_name AS nation,
           p1.revenue AS rev_1996, p2.revenue AS rev_1997,
           p1.n_parts AS n_parts_1996, p2.n_parts AS n_parts_1997,
           p1.n_supp_nations AS n_supp_nations_1996,
           p2.n_supp_nations AS n_supp_nations_1997
    FROM profile p1
    JOIN profile p2 ON p1.custkey = p2.custkey
    JOIN customer ON c_custkey = p1.custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE p1.yr = 1996 AND p2.yr = 1997
      AND p2.revenue > p1.revenue
    """,
    tags=("tpcds", "q64", "snapshot-compare", "wide-join"),
)
def tpcds_q64_snapshot_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q64 analogue — the WIDE-MULTI-JOIN SNAPSHOT-VS-SNAPSHOT
    paradigm (Q64 builds a cross_sales profile through a dozen
    dimension joins, instantiates it at two consecutive years, and
    self-joins to keep entities whose second-year metric crossed the
    first's): the per-(customer, year) purchase profile joins the
    lineitem fact through orders, supplier, customer and nation —
    revenue plus part- and supplier-nation breadth — is built in ONE
    fact scan covering both years (the year column keeps the
    snapshots apart; Q64's two CTE instantiations share the scan), and
    the 1996/1997 snapshots join on custkey keeping customers whose
    revenue GREW. Scale: one shuffle on (custkey, yr) for the profile
    aggregate (count-distincts expand it map-side); the snapshot
    self-join and dimension decorations run over post-aggregate
    O(customers) rows with broadcast dims; revenue compare is exact
    (decimal-grid doubles). The fact never rescans for the second
    snapshot."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1996, 1997)
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("yr"))
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profile = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("o_custkey").alias("custkey"), "yr")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                4,
            ),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("s_nationkey").alias("n_supp_nations"),
        )
        # Q14's materialize-once (r10 ADVICE #2): without this the
        # yr=1996/1997 filters push below the aggregate and the two
        # self-join sides become distinct subplans — Spark rescans the
        # fact for the second snapshot. Checkpointing the O(customers)
        # profile makes the one-scan claim in the docstring TRUE.
        .localCheckpoint()
    )
    p1 = profile.where(F.col("yr") == 1996).alias("p1")
    p2 = profile.where(F.col("yr") == 1997).alias("p2")
    return (
        p1.join(p2, F.col("p1.custkey") == F.col("p2.custkey"))
        .where(F.col("p2.revenue") > F.col("p1.revenue"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("p1.custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "c_custkey", "c_name", F.col("n_name").alias("nation"),
            F.col("p1.revenue").alias("rev_1996"),
            F.col("p2.revenue").alias("rev_1997"),
            F.col("p1.n_parts").alias("n_parts_1996"),
            F.col("p2.n_parts").alias("n_parts_1997"),
            F.col("p1.n_supp_nations").alias("n_supp_nations_1996"),
            F.col("p2.n_supp_nations").alias("n_supp_nations_1997"),
        )
    )
