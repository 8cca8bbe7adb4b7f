"""Geospatial query catalog: cell-blocked spatial joins and KNN over
deterministically synthesized coordinates (``operators/geo.py``).

The TPC-H-ish tables carry no coordinates, so each entity's (lat, lon)
is synthesized from md5 bits in EXACT integer microdegrees - both
engines derive the identical points, making the whole family
oracle-checkable end to end (the same closed-loop trick the multimodal
codecs use: synthesize deterministically in-query, then exercise the
real operator on top).

Scale notes (100 TB): every query here blocks by an integer grid cell
sized to the search radius - candidates per probe are bounded by local
point density, never by table size. The probe side carries the fixed
9x neighborhood fanout and broadcasts; the big side shuffles once on
its cell key. No cross joins, no driver-side loops.

Known limitation (documented, mirrored by every oracle): the grid does
not wrap at the antimeridian, so pairs straddling lon = +-180 are not
candidates. Production use over real-world data would duplicate the
two boundary columns; the synthesized corpus makes the gap measurable
and deliberate rather than silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.geo import (
    haversine_sql,
    spatial_join_within,
    with_point,
)
from .queries import query
from .tables import load_table

# DuckDB twin of operators.geo.synth_point_micro / cell_xy. `//` and
# Spark's `div` agree because every dividend is made non-negative
# before the divide (u32*span >= 0; +90e6/+180e6 offsets).
_POINT_CTE = """
    SELECT {id} AS pid,
           (CAST('0x' || substr(md5('{salt}:lat:' || CAST({id} AS VARCHAR)), 1, 8)
                 AS BIGINT) * 120000000) // 4294967296 - 60000000 AS lat_micro,
           (CAST('0x' || substr(md5('{salt}:lon:' || CAST({id} AS VARCHAR)), 1, 8)
                 AS BIGINT) * 360000000) // 4294967296 - 180000000 AS lon_micro
    FROM {table}
"""


def _point_cte(table: str, id_col: str, salt: str = "geo") -> str:
    return _POINT_CTE.format(table=table, id=id_col, salt=salt)


@query(
    "geo_cell_density_customers",
    oracle=f"""
    WITH pts AS ({_point_cte("customer", "c_custkey")}),
    cells AS (
      SELECT (lat_micro + 90000000) // 1000000 AS cell_y,
             (lon_micro + 180000000) // 1000000 AS cell_x,
             CAST(count(*) AS BIGINT) AS n_points,
             min(lat_micro) AS lat_min_micro, max(lat_micro) AS lat_max_micro,
             min(lon_micro) AS lon_min_micro, max(lon_micro) AS lon_max_micro
      FROM pts GROUP BY 1, 2
    )
    SELECT cell_y, cell_x, n_points,
           lat_min_micro, lat_max_micro, lon_min_micro, lon_max_micro
    FROM cells
    ORDER BY n_points DESC, cell_y, cell_x
    LIMIT 100
    """,
    tags=("geo", "spatial", "aggregation", "hotspots"),
)
def geo_cell_density_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell density hotspots - the aggregation a spatial pipeline
    runs before choosing a partitioning (which cells are hot, how tight
    each cell's bounding box is). Pure integer microdegree arithmetic
    end to end (synthesis, 1-degree cell assignment, min/max extents),
    so the result is hash-exact with zero float involvement. One
    shuffle on the cell tuple with map-side partial aggregation;
    TakeOrderedAndProject caps the driver at 100 rows.
    """
    pts = with_point(
        load_table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", 1.0
    )
    return (
        pts.groupBy(
            F.col("cell_y"), F.col("cell_x")
        )
        .agg(
            F.count("*").alias("n_points"),
            F.min("lat_micro").alias("lat_min_micro"),
            F.max("lat_micro").alias("lat_max_micro"),
            F.min("lon_micro").alias("lon_min_micro"),
            F.max("lon_micro").alias("lon_max_micro"),
        )
        .orderBy(F.desc("n_points"), "cell_y", "cell_x")
        .limit(100)
    )


_SUPPLIER_RADIUS_KM = 200.0
# One 4-degree cell step covers >= 200 km in longitude up to |lat| 60
# (1 deg lon = 55.8 km there -> 4 deg = 223 km) and trivially in
# latitude (444 km), so the 3x3 neighborhood is a complete candidate
# set: the blocking is lossless (asserted in tests/test_geo.py).
_SUPPLIER_CELL_DEG = 4.0


@query(
    "spatial_join_supplier_customer",
    oracle=f"""
    WITH sp AS ({_point_cte("supplier", "s_suppkey", "geo-s")}),
    cp AS ({_point_cte("customer", "c_custkey")}),
    sc AS (
      SELECT pid, lat_micro, lon_micro,
             (lat_micro + 90000000) // 4000000 AS cell_y,
             (lon_micro + 180000000) // 4000000 AS cell_x
      FROM sp
    ),
    cc AS (
      SELECT pid, lat_micro, lon_micro,
             ((lat_micro + 90000000) // 4000000) * 1048576
               + ((lon_micro + 180000000) // 4000000) AS cell
      FROM cp
    ),
    probes AS (
      SELECT sc.*, (sc.cell_y + dy.dy) * 1048576 + ((sc.cell_x + dx.dx + 90) % 90) AS probe_cell
      FROM sc
      CROSS JOIN (VALUES (-1), (0), (1)) dx(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) dy(dy)
    ),
    pairs AS (
      SELECT p.pid AS s_suppkey, cc.pid AS c_custkey,
             round({haversine_sql(
                 "p.lat_micro / 1000000.0", "p.lon_micro / 1000000.0",
                 "cc.lat_micro / 1000000.0", "cc.lon_micro / 1000000.0")}, 3)
               AS dist_km
      FROM probes p JOIN cc ON p.probe_cell = cc.cell
    ),
    hits AS (
      SELECT s_suppkey, c_custkey, dist_km,
             row_number() OVER (PARTITION BY s_suppkey
                                ORDER BY dist_km, c_custkey) AS rnk
      FROM pairs WHERE dist_km <= {_SUPPLIER_RADIUS_KM!r}
    )
    SELECT s_suppkey,
           CAST(count(*) AS BIGINT) AS n_within,
           min(dist_km) AS nearest_km,
           max(CASE WHEN rnk = 1 THEN c_custkey END) AS nearest_custkey
    FROM hits
    GROUP BY s_suppkey
    ORDER BY s_suppkey
    """,
    tags=("geo", "spatial-join", "radius", "blocked"),
)
def spatial_join_supplier_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join: for every supplier, the customers within 200 km -
    the canonical "what is near X" workload (store catchment, service
    coverage, geo-keyed corpus cross-referencing). Cell-blocked with a
    4-degree grid sized so the 3x3 neighborhood provably covers the
    radius (lossless blocking); the supplier side carries the 9x
    fanout and broadcasts, customers shuffle once on their cell key.
    Per supplier: match count, nearest distance, and the nearest
    customer with a (distance, key) tiebreak so the answer is unique.

    r11 plan fix: the nearest customer comes from ONE grouped
    ``min(struct(dist_km, c_custkey))`` instead of a per-supplier
    row_number window + rank-1 filter. Same output (struct ordering IS
    the (dist, key) tiebreak), but the window forced the ENTIRE
    within-radius pair volume through a shuffle+sort before any
    reduction — the aggregate's map-side partial combine collapses
    each partition to one row per supplier first, so the shuffle
    carries O(suppliers), not O(pairs). Pair volume grows ~quadratically
    with uniform-density corpus growth (SCALE.md r11 geo adjudication),
    which is exactly why the reduction must happen before the exchange.
    """
    suppliers = with_point(
        load_table(spark, sf_dir, "supplier").select("s_suppkey"),
        "s_suppkey",
        _SUPPLIER_CELL_DEG,
        salt="geo-s",
    )
    customers = with_point(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        _SUPPLIER_CELL_DEG,
    )
    pairs = spatial_join_within(
        suppliers, customers, _SUPPLIER_RADIUS_KM, cell_deg=_SUPPLIER_CELL_DEG
    )
    return (
        pairs.select(
            F.col("q_s_suppkey").alias("s_suppkey"),
            F.col("t_c_custkey").alias("c_custkey"),
            "dist_km",
        )
        .groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_within"),
            F.min("dist_km").alias("nearest_km"),
            F.min(F.struct("dist_km", "c_custkey"))
            .getField("c_custkey")
            .alias("nearest_custkey"),
        )
        .orderBy("s_suppkey")
    )


_KNN_CELL_DEG = 2.0
_KNN_K = 3


@query(
    "haversine_knn_customers",
    oracle=f"""
    WITH cp AS ({_point_cte("customer", "c_custkey")}),
    cc AS (
      SELECT pid, lat_micro, lon_micro,
             (lat_micro + 90000000) // 2000000 AS cell_y,
             (lon_micro + 180000000) // 2000000 AS cell_x
      FROM cp
    ),
    probes AS (
      SELECT cc.*, (cc.cell_y + dy.dy) * 1048576 + ((cc.cell_x + dx.dx + 180) % 180) AS probe_cell
      FROM cc
      CROSS JOIN (VALUES (-1), (0), (1)) dx(dx)
      CROSS JOIN (VALUES (-1), (0), (1)) dy(dy)
      WHERE cc.pid % 100 = 7
    ),
    pairs AS (
      SELECT p.pid AS q_custkey, t.pid AS neighbor_custkey,
             round({haversine_sql(
                 "p.lat_micro / 1000000.0", "p.lon_micro / 1000000.0",
                 "t.lat_micro / 1000000.0", "t.lon_micro / 1000000.0")}, 3)
               AS dist_km
      FROM probes p
      JOIN cc t ON p.probe_cell = t.cell_y * 1048576 + t.cell_x
                AND t.pid <> p.pid
    ),
    ranked AS (
      SELECT q_custkey, neighbor_custkey, dist_km,
             CAST(row_number() OVER (PARTITION BY q_custkey
                                     ORDER BY dist_km, neighbor_custkey) AS BIGINT)
               AS rnk
      FROM pairs
    )
    SELECT q_custkey, rnk, neighbor_custkey, dist_km
    FROM ranked WHERE rnk <= {_KNN_K}
    ORDER BY q_custkey, rnk
    """,
    tags=("geo", "knn", "spatial", "blocked"),
)
def haversine_knn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked k-nearest-neighbors: for a 1% probe sample of customers,
    the 3 nearest OTHER customers found within the 3x3 neighborhood of
    a 2-degree grid - the geo twin of the IVF family's cell-bounded ANN
    (``operators/similarity.py``): candidates come from the probe's
    local cells, ranking is a per-probe window, ties break by key so
    the result is unique. Probes broadcast (fixed 1% of one side);
    targets shuffle once on the cell key. Like IVF with nprobe bounded,
    recall is bounded by blocking - a true neighbor beyond one cell
    step is invisible to BOTH engines identically (the oracle mirrors
    the blocking), and pytest bounds the miss rate empirically.
    """
    customers = with_point(
        load_table(spark, sf_dir, "customer").select("c_custkey"),
        "c_custkey",
        _KNN_CELL_DEG,
    )
    probes = customers.where(F.col("c_custkey") % 100 == 7)
    pairs = spatial_join_within(
        probes, customers, radius_km=float("inf"), broadcast_queries=True,
        cell_deg=_KNN_CELL_DEG,
    ).where(F.col("t_c_custkey") != F.col("q_c_custkey"))
    w = Window.partitionBy("q_custkey").orderBy("dist_km", "neighbor_custkey")
    return (
        pairs.select(
            F.col("q_c_custkey").alias("q_custkey"),
            F.col("t_c_custkey").alias("neighbor_custkey"),
            "dist_km",
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= _KNN_K)
        .select("q_custkey", "rnk", "neighbor_custkey", "dist_km")
        .orderBy("q_custkey", "rnk")
    )
